package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics — beyond-reference capability (the reference is
  * last-write-wins regardless of time, SURVEY §2.B "late data"):
  * append-mode windows emit exactly once when the watermark passes them,
  * and data older than the watermark is dropped, bounding state.
  */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("append-mode windowed agg emits closed windows equal to batch") {
    val replayDir = Files.createTempDirectory("graft-wm").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // chunk 1: the real data
    ev.repartition(2).write.mode("append").parquet(replayDir)
    val q1 = spark.read.parquet(replayDir)
    // chunk 2 (arrives later): a sentinel far past the data, advancing the
    // watermark beyond every real window so they all close and emit.
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new Timestamp(maxTs.getTime + 6 * 3600 * 1000L)
    import spark.implicits._
    Seq((999999L, sentinelTs, 0L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(replayDir)

    val schema = q1.schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("event_type"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    q.processAllAvailable()
    val streamed = spark.table("wm_out")
      .filter(col("event_type") =!= "sentinel")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    q.stop()

    val batch = Fixtures.events(spark, TestSpark.sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("events older than the watermark are dropped (late-data policy)") {
    val replayDir = Files.createTempDirectory("graft-late").toString
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-06-01 10:00:00")
    def at(mins: Long) = new Timestamp(t0.getTime + mins * 60000L)
    // batch 1: events at 10:00 and 14:00 — watermark advances to 13:00
    Seq((1L, at(0), 1L, "click", 1.0), (2L, at(240), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val agg = stream.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    q.processAllAvailable()
    // batch 2: a late event at 10:30 — its window closed long ago → dropped
    Seq((3L, at(30), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("append").parquet(replayDir)
    q.processAllAvailable()
    // batch 3: sentinel far ahead closes everything still open
    Seq((4L, at(600), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("append").parquet(replayDir)
    q.processAllAvailable()
    val out = spark.table("late_out").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    q.stop()
    assert(out(Timestamp.valueOf("2024-06-01 10:00:00")) == 1L,
      s"late 10:30 event must NOT be counted into the closed 10:00 window: $out")
  }
}
