package graft.streaming

import graft.{Fixtures, SparkEntry, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** Streaming ≡ batch for the rolling anomaly gate: events replayed in
  * offset order through `transformWithState` must flag exactly the rows
  * batch q140 flags, with identical integer dev²/bound values — including
  * across a mid-stream checkpoint restart and under at-least-once
  * re-delivery of an already-folded chunk.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batchAnswer(): Map[Long, (String, Long, Long, Long)] =
    SparkEntry.queries("q140_rolling_anomaly")(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

  private def writeReplayChunk(dir: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .as[AnomEvent]
      .repartition(2).write.mode("append").parquet(dir)
  }

  private def runStream(replayDir: String, ckpt: String,
      acc: TrieMap[Long, (String, Long, Long, Long)]): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[AnomEvent]
    val q = AnomalyStream.flags(stream, graft.operators.TimeSeries.AnomWin)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[AnomFlag], _: Long) =>
        ds.collect().foreach(r =>
          acc(r.event_id) = (r.event_type, r.cents, r.dev2, r.bound))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("replayed events flag exactly the batch q140 outliers with identical integers") {
    val replayDir = Files.createTempDirectory("graft-anom-replay").toString
    val ckpt = Files.createTempDirectory("graft-anom-ckpt").toString
    // three chunks → ≥3 micro-batches (2 files each, maxFilesPerTrigger=2),
    // so trailing windows genuinely straddle batch boundaries
    writeReplayChunk(replayDir, 0, 300)
    writeReplayChunk(replayDir, 300, 700)
    writeReplayChunk(replayDir, 700, Long.MaxValue)
    val acc = TrieMap.empty[Long, (String, Long, Long, Long)]
    runStream(replayDir, ckpt, acc)
    val expected = batchAnswer()
    assert(expected.nonEmpty, "fixture must contain 3-sigma outliers")
    assert(acc.toMap === expected)
  }

  test("out-of-order events (ts regressing against offset) fail loudly") {
    import spark.implicits._
    val bad = Seq(
      AnomEvent(1, "t1", java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), 1.0),
      AnomEvent(2, "t1", java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2.0)).toDS()
    val ex = intercept[Throwable] {
      AnomalyStream.flags(bad, graft.operators.TimeSeries.AnomWin).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("out-of-order"),
      s"contract violation must fail loudly, got: ${msgs(ex).take(400)}")
  }

  test("cross-epoch violation (old offset re-delivered with a NEWER ts) fails loudly") {
    import spark.implicits._
    val replayDir = Files.createTempDirectory("graft-anom-viol").toString
    val ckpt = Files.createTempDirectory("graft-anom-viol-ckpt").toString
    def chunk(rows: Seq[AnomEvent]): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(replayDir)
    chunk(Seq(AnomEvent(5, "t1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0)))
    val acc = TrieMap.empty[Long, (String, Long, Long, Long)]
    runStream(replayDir, ckpt, acc) // epoch 1 sets the high-water mark (id 5)
    chunk(Seq(AnomEvent(3, "t1", java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), 2.0)))
    val ex = intercept[Throwable] { runStream(replayDir, ckpt, acc) }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("out-of-order"),
      s"old-offset/newer-ts must fail loudly, got: ${msgs(ex).take(400)}")
  }

  test("mid-stream restart + overlapping re-delivery still flag exactly the batch set") {
    val replayDir = Files.createTempDirectory("graft-anom-replay2").toString
    val ckpt = Files.createTempDirectory("graft-anom-ckpt2").toString
    val acc = TrieMap.empty[Long, (String, Long, Long, Long)]
    writeReplayChunk(replayDir, 0, 600)
    runStream(replayDir, ckpt, acc)
    writeReplayChunk(replayDir, 400, Long.MaxValue) // [400,600) re-delivered
    runStream(replayDir, ckpt, acc)
    assert(acc.toMap === batchAnswer())
  }
}
