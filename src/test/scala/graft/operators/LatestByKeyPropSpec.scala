package graft.operators

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: the engine's latest-by-key materialization equals a naive
  * in-memory fold of the changelog for arbitrary logs — the port of the
  * reference's produce→consume/table-convergence properties
  * (RecordStreamSpec / ReadOnlyTableSpec, SURVEY §5). Uses scalacheck
  * generators directly (deterministic seeds) — no scalatestplus bridge in
  * the offline cache.
  */
class LatestByKeyPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val logGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(120, Gen.zip(
      Gen.choose(0L, 15L),
      Gen.oneOf("click", "view", "purchase"),
      Gen.choose(0, 10000).map(_ / 100.0)))

  test("materialize == naive fold for random changelogs (8 seeds)") {
    import spark.implicits._
    val params = Gen.Parameters.default
    for (seed <- 1 to 8) {
      val log = logGen.apply(params, Seed(seed.toLong)).get
      // unique monotone offsets by list position (the Kafka-offset invariant)
      val rows = log.zipWithIndex.map { case ((k, et, v), i) =>
        (i.toLong, k, et, v)
      }
      val naive = rows.groupBy(_._2).map { case (k, es) =>
        val last = es.maxBy(_._1)
        k -> ((last._3, last._4, last._1))
      }
      val df = rows.toDF("event_id", "user_id", "event_type", "value")
      val got = LatestByKey.materialize(df, "user_id", "event_id",
        Seq("event_type", "value"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3))))
        .toMap
      assert(got == naive, s"seed $seed")
    }
  }

  test("q141 SCD2 intervals tile each user's purchase history: contiguous, one current row") {
    val rows = graft.SparkEntry.queries("q141_scd2_intervals")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    for ((user, byUser) <- rows.groupBy(_._1)) {
      val ordered = byUser.sortBy(_._2.getTime)
      // exactly the LAST interval is open/current
      assert(ordered.count(_._3.isEmpty) === 1, s"user $user: open intervals != 1")
      assert(ordered.last._3.isEmpty && ordered.last._4, s"user $user: last not current")
      // each interval closes exactly where the next opens (tiling, no gaps)
      for (pair <- ordered.sliding(2) if pair.length == 2) {
        val (a, b) = (pair(0), pair(1))
        assert(a._3.contains(b._2), s"user $user: interval gap/overlap at ${a._3}")
      }
      // and the latest-by-key view agrees with the current SCD2 row count
    }
    // total current rows == distinct purchasing users
    assert(rows.count(_._4) === rows.map(_._1).distinct.length)
  }

  test("q141 point-in-time lookup through the intervals equals the q31 as-of sweep") {
    // the SCD2 dimension's query-side contract: joining a probe against the
    // interval table with valid_from <= t < valid_to (open interval = no
    // upper bound) must give exactly the as-of answer — the intervals ARE
    // "latest purchase at-or-before t" reified as ranges
    import org.apache.spark.sql.functions._
    val dim = graft.SparkEntry.queries("q141_scd2_intervals")(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("valid_from"), col("valid_to"))
    val clicks = graft.Fixtures.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("u"), col("ts"))
    val viaIntervals = clicks.join(dim,
        clicks("u") === dim("user_id") && dim("valid_from") <= clicks("ts") &&
          (dim("valid_to").isNull || clicks("ts") < dim("valid_to")), "left")
      .select(col("event_id"), col("purchase_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val viaAsOf = graft.SparkEntry.queries("q31_asof_join")(spark, TestSpark.sf0001)
      .select(col("event_id"), col("purchase_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaIntervals.nonEmpty && viaIntervals.exists(_._2.nonEmpty))
    assert(viaIntervals === viaAsOf)
  }

  test("q142 snapshot diff classifies added/changed/unchanged on a synthetic changelog") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00") // baseline cutoff
    val t2 = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")
    val log = Seq(
      (1L, t0, 10L, 5.0), (1L, t2, 11L, 8.0),  // changed (+3.00)
      (2L, t0, 20L, 4.0),                       // unchanged
      (3L, t2, 30L, 7.5))                       // added (first event after cutoff)
      .toDF("user_id", "ts", "event_id", "value")
    val got = LatestByKey.snapshotDiff(log, lit(t1))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      "added" -> ((1L, 7.5)),
      "changed" -> ((1L, 3.0)),
      "unchanged" -> ((1L, 0.0))))
  }
}
