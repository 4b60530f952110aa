package graft.operators

import java.sql.Timestamp
import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of calendar resampling + forward fill beyond the value oracle:
  * gap carrying, within-period aggregation, and grid density.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("forward fill carries the last observation across gaps") {
    import spark.implicits._
    val df = Seq(
      ("a", ts("2026-01-01 05:00:00"), 1L, 10.0),
      ("a", ts("2026-01-01 09:00:00"), 2L, 11.0), // same day, later seq wins
      ("a", ts("2026-01-04 00:30:00"), 3L, 40.0), // days 2-3 are silent
      ("b", ts("2026-01-02 12:00:00"), 4L, 99.0)
    ).toDF("k", "t", "seq", "v")
    val got = TimeSeries.resampleFill(df, "k", "t", "day",
        max_by(col("v"), col("seq")))
      .orderBy(col("k"), col("period"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2)))
    assert(got.toSeq === Seq(
      ("a", "2026-01-01 00:00:00.0", 11.0),
      ("a", "2026-01-02 00:00:00.0", 11.0),
      ("a", "2026-01-03 00:00:00.0", 11.0),
      ("a", "2026-01-04 00:00:00.0", 40.0),
      ("b", "2026-01-02 00:00:00.0", 99.0)))
  }

  test("q140 anomalies equal a sequential integer z-test reference over every event type") {
    val got = SparkEntry.queries("q140_rolling_anomaly")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val events = graft.Fixtures.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3).getTime))
    val ref = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((_, group) <- events.groupBy(_._2)) {
      val ordered = group.sortBy(e => (e._4, e._1))
      for (i <- ordered.indices if i >= 50) {
        val win = ordered.slice(i - 50, i)
        val (cs, n) = (win.map(_._3), 50L)
        val s = cs.sum; val q = cs.map(c => c * c).sum
        val x = ordered(i)._3
        val dev2 = (n * x - s) * (n * x - s)
        val bound = 9L * (n * q - s * s)
        if (dev2 > bound) ref(ordered(i)._1) = (dev2, bound)
      }
    }
    assert(got.nonEmpty, "fixture must contain 3-sigma outliers")
    assert(got === ref.toMap)
  }

  test("chunked rolling anomaly ≡ the per-type-partition form, even at minimal chunk size") {
    // the shipped q140 plan chunks each type's timeline into fixed-row
    // chunks with an AnomWin replica prefix; it must be ROW-IDENTICAL to
    // the naive one-partition-per-type window. chunkRows = 50 (== AnomWin,
    // every row is also a replica) is the adversarial boundary case.
    val events = graft.Fixtures.events(spark, TestSpark.sf0001)
    val ref = TimeSeries.rollingAnomalyPerType(events).collect().map(_.toString).toSeq
    assert(ref.nonEmpty)
    for (chunkRows <- Seq(50, 64, TimeSeries.AnomChunk)) {
      val got = TimeSeries.rollingAnomaly(events, chunkRows).collect().map(_.toString).toSeq
      assert(got === ref, s"chunkRows=$chunkRows diverged from the per-type form")
    }
    // the equality only means something if the fixture crosses chunk
    // boundaries: ≥2 chunks at the default size, ≥4 at the adversarial 50
    val maxPerType = events.groupBy(col("event_type")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxPerType > TimeSeries.AnomChunk && maxPerType > 200L,
      s"fixture too small to exercise chunk boundaries ($maxPerType rows)")
  }

  test("chunked rolling anomaly ≡ per-type form on random streams with heavy ts ties (5 seeds)") {
    // adversarial generator: few event types (low parallelism in the naive
    // form), many equal timestamps (stresses the (ts, event_id) tie-break
    // that makes the global position well-defined), values with planted
    // spikes, day-boundary crossings (stresses the local-rank + offset
    // composition). chunkRows = 50 = AnomWin maximizes boundary traffic.
    import spark.implicits._
    val rnd = new scala.util.Random(0)
    for (seed <- 1 to 5) {
      rnd.setSeed(seed * 7919L)
      val n = 400 + rnd.nextInt(200)
      val rows = (0 until n).map { i =>
        val t = new Timestamp(ts("2024-01-01 00:00:00").getTime +
          rnd.nextInt(4) * 86400000L + rnd.nextInt(20) * 1000L) // many ties
        val v = if (rnd.nextInt(60) == 0) 5000.0 else 10.0 + rnd.nextInt(5)
        (i.toLong, s"t${rnd.nextInt(3)}", v, t)
      }
      val df = rows.toDF("event_id", "event_type", "value", "ts")
      val ref = TimeSeries.rollingAnomalyPerType(df).collect().map(_.toString).toSeq
      val got = TimeSeries.rollingAnomaly(df, 50).collect().map(_.toString).toSeq
      assert(got === ref, s"seed $seed diverged")
    }
  }

  test("q91 grid is dense and fully filled: one row per day per user, no nulls") {
    val out = SparkEntry.queries("q91_resample_ffill")(spark, TestSpark.sf0001)
    assert(out.filter(col("v_fill").isNull).count() === 0,
      "every period at/after a key's first observation must be filled")
    val bad = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("rows"),
        (datediff(max(col("period")), min(col("period"))) + 1).as("days"))
      .filter(col("rows") =!= col("days"))
    assert(bad.count() === 0, "per-user row count must equal the day span")
  }
}
