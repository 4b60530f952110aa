package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom ListState+event-time-timer sessionizer must reproduce the
  * built-in session_window aggregation (q32) on replayed events — the same
  * oracle the built-in streaming twin is held to.
  */
class SessionTimerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("timer-closed sessions equal session_window batch answer") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-timer-sess").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(2).write.mode("append").parquet(dir)
    // sentinel far in the future pushes the watermark past every real key's
    // (lastTs + gap) deadline so all timers fire
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new Timestamp(maxTs.getTime + 12 * 3600 * 1000L)
    Seq((999999L, sentinelTs, 999999L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = Sources.fileStream(spark, dir, schema, maxFilesPerTrigger = 2)
      .withWatermark("ts", "1 minute")
      .as[TimedEvent]
    val out = SessionTimerStream.sessions(stream, gapMs = 10 * 60 * 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("timer_sess_out").start()
    q.processAllAvailable()
    val streamed = spark.table("timer_sess_out")
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
}
