package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch for the tumbling-window aggregation (Q7's streaming
  * twin, SURVEY §2.C acceptance).
  */
class StreamingWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed streaming agg equals batch hourly stats") {
    val replayDir = Files.createTempDirectory("graft-win-replay").toString
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(3)
      .write.mode("overwrite").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = WindowedStream.hourlyStats(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    q.processAllAvailable()
    val streamed = spark.table("win_out")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q7_time_window")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("dropDuplicatesWithinWatermark dedupes a doubled stream") {
    val replayDir = Files.createTempDirectory("graft-dd-replay").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.union(ev).repartition(2).write.mode("overwrite").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = WindowedStream.dedupWithinWatermark(stream, Seq("event_id"), "24 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_out")
      .start()
    q.processAllAvailable()
    val n = spark.table("dd_out").count()
    q.stop()
    assert(n == ev.count())
  }
}
