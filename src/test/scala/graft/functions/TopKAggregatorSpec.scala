package graft.functions

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The bounded-heap top-k aggregate must be indistinguishable from sorting
  * the whole group and taking k — under any split of the input across
  * partial buffers (that is what makes map-side partial aggregation safe).
  * Uses scalacheck generators directly (deterministic seeds) — no
  * scalatestplus bridge in the offline cache.
  */
class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def reference(xs: Seq[ScoredId], k: Int): Seq[(Double, Long)] =
    xs.map(x => (x.score, x.id)).sortBy(t => (-t._1, t._2)).take(k)

  test("reduce+merge equal full-sort-take-k under arbitrary input splits (64 seeds)") {
    val agg = new TopKByScore(3)
    val gen = for {
      xs <- Gen.listOfN(40, Gen.zip(
        Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(0L, 20L))
        .map { case (s, i) => ScoredId(s, i) })
      cut <- Gen.chooseNum(0, 40)
    } yield (xs, cut)
    for (seed <- 0 until 64) {
      val (xs, cut) = gen(Gen.Parameters.default, Seed(seed)).get
      val (l, r) = xs.splitAt(cut)
      val bufL = l.foldLeft(agg.zero)(agg.reduce(_, _))
      val bufR = r.foldLeft(agg.zero)(agg.reduce(_, _))
      val merged = agg.finish(agg.merge(bufL, bufR))
      assert(merged.scores.zip(merged.ids).toSeq == reference(xs, 3),
        s"seed $seed")
      assert(merged.ids.length <= 3)
    }
  }

  test("ties on score break by smaller id") {
    val agg = new TopKByScore(2)
    val buf = Seq(ScoredId(1.0, 9L), ScoredId(1.0, 3L), ScoredId(1.0, 7L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.ids.toSeq == Seq(3L, 7L))
  }

  test("q93 equals the window row_number formulation") {
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      graft.Fixtures.orders(spark, TestSpark.sf0001)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val viaAgg = SparkEntry.queries("q93_topk_aggregate")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("q93 plan aggregates instead of window-sorting the full input") {
    val plan = SparkEntry.queries("q93_topk_aggregate")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k must not fall back to a window sort")
    assert(plan.contains("ObjectHashAggregate"),
      "typed aggregator should run as ObjectHashAggregate with partial merge")
  }
}
