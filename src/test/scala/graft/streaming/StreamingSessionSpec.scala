package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twins of the session (q32) and sliding (q36) window queries:
  * replayed through the micro-batch engine with a watermark, closed by a
  * sentinel event, they must equal the batch answers (excluding the
  * sentinel's own contribution).
  */
class StreamingSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def replayWithSentinel(): (String, Timestamp) = {
    val dir = Files.createTempDirectory("graft-sess").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(2).write.mode("append").parquet(dir)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new Timestamp(maxTs.getTime + 12 * 3600 * 1000L)
    import spark.implicits._
    Seq((999999L, sentinelTs, 999999L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(dir)
    (dir, sentinelTs)
  }

  test("streaming session windows equal batch sessionization") {
    val (dir, _) = replayWithSentinel()
    val schema = spark.read.parquet(dir).schema
    val stream = Sources.fileStream(spark, dir, schema, maxFilesPerTrigger = 2)
    val sessions = stream
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sv"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("sv"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    val streamed = spark.table("sess_out")
      .filter(col("user_id") =!= 999999L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q32_session_window")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming sliding windows equal batch sliding aggregation") {
    val (dir, _) = replayWithSentinel()
    val schema = spark.read.parquet(dir).schema
    val stream = Sources.fileStream(spark, dir, schema, maxFilesPerTrigger = 2)
    val slid = stream
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sv"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("sv"))
    val q = slid.writeStream.outputMode("append")
      .format("memory").queryName("slide_out").start()
    q.processAllAvailable()
    val streamed = spark.table("slide_out")
      .filter(col("event_type") =!= "sentinel")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q36_sliding_window")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
