package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: hotSaltedJoin is result-identical (as a MULTISET) to the plain
  * inner join for arbitrary key distributions, salt factors, and thresholds
  * — including duplicate probe rows, duplicate build keys (row
  * multiplication), keys hot on one side only, and unmatched keys on both
  * sides. Replication accounting is pinned against an independently
  * computed hot-key set. Uses scalacheck generators directly (deterministic
  * seeds) — no scalatestplus bridge in the offline cache.
  */
class SkewJoinPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val probeGen: Gen[List[(Long, Long)]] =
    Gen.choose(50, 400).flatMap(n => Gen.listOfN(n, Gen.zip(
      // zipf-ish: half the mass on a few keys
      Gen.frequency(5 -> Gen.choose(0L, 2L), 5 -> Gen.choose(0L, 40L)),
      Gen.choose(0L, 5L)))) // few payload values → duplicate rows exist
  private val buildGen: Gen[List[(Long, Long)]] =
    Gen.choose(10, 80).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.choose(0L, 45L), Gen.choose(0L, 1000L))))

  test("hotSaltedJoin == plain join as a multiset; replication = cold + hot*saltFactor (6 seeds)") {
    import spark.implicits._
    val params = Gen.Parameters.default
    for (seed <- 1 to 6) {
      val probeRows = probeGen.apply(params, Seed(seed * 11L)).get
      val buildRows = buildGen.apply(params, Seed(seed * 13L)).get
      val saltFactor = Gen.choose(2, 9).apply(params, Seed(seed * 17L)).get
      val hotThreshold = Gen.choose(2L, 30L).apply(params, Seed(seed * 19L)).get
      val probe = probeRows.toDF("k", "p")
      val build = buildRows.toDF("k", "v")

      def multiset(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.length).toMap

      val direct = multiset(probe.join(build, "k").select(col("k"), col("p"), col("v")))
      val salted = multiset(
        Skew.hotSaltedJoin(probe, build, "k", saltFactor, hotThreshold)
          .select(col("k"), col("p"), col("v")))
      assert(salted === direct, s"seed $seed sf=$saltFactor ht=$hotThreshold")

      // replication accounting vs an independently computed hot set
      val hotKeys = probeRows.groupBy(_._1).filter(_._2.size >= hotThreshold).keySet
      val expectRepl = buildRows.count(r => !hotKeys(r._1)) +
        saltFactor * buildRows.count(r => hotKeys(r._1))
      val (_, repl) = Skew.hotSaltedSides(probe, build, "k", saltFactor, hotThreshold)
      assert(repl.count() === expectRepl.toLong, s"seed $seed replication accounting")
    }
  }
}
