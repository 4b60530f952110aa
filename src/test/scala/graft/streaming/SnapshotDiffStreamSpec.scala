package graft.streaming

import graft.{Fixtures, SparkEntry, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** Streaming ≡ batch for the snapshot-diff reconciliation: the changelog
  * replayed through `transformWithState` maintains per-key baseline/current
  * states whose latest classification rows, fed through EXACTLY the batch
  * tail aggregate, equal q142 — including across a mid-stream restart
  * (fold is an order-insensitive argmax, so no ordering contract needed).
  */
class SnapshotDiffStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the same instant q142's UTC timestamp literal denotes
  private val cutoffMillis = java.time.LocalDateTime
    .parse("2024-01-30T20:00:00")
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  private def writeReplayChunk(dir: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .as[SnapEvent]
      .repartition(2).write.mode("append").parquet(dir)
  }

  private def runStream(replayDir: String, ckpt: String,
      acc: TrieMap[Long, (String, Double)]): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[SnapEvent]
    val q = SnapshotDiffStream.diff(stream, cutoffMillis)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[SnapDiffRow], _: Long) =>
        ds.collect().foreach(r => acc(r.user_id) = (r.status, r.value_delta))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** The batch q142 tail aggregate applied to the accumulated per-key
    * verdicts — same Spark expressions, so arithmetic cannot diverge.
    */
  private def report(acc: TrieMap[Long, (String, Double)]): Seq[(String, Long, Double)] = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    acc.toSeq.map { case (u, (st, d)) => (u, st, d) }
      .toDF("user_id", "status", "value_delta")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("value_delta").cast(dec)), 2).cast("double").as("value_delta"))
      .orderBy(col("status"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  private def batchAnswer(): Seq[(String, Long, Double)] =
    SparkEntry.queries("q142_snapshot_diff")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("replayed changelog's latest per-key verdicts aggregate to batch q142") {
    val replayDir = Files.createTempDirectory("graft-snap-replay").toString
    val ckpt = Files.createTempDirectory("graft-snap-ckpt").toString
    // three chunks → ≥3 micro-batches, so both snapshot states genuinely
    // fold across batch boundaries
    writeReplayChunk(replayDir, 0, 300)
    writeReplayChunk(replayDir, 300, 700)
    writeReplayChunk(replayDir, 700, Long.MaxValue)
    val acc = TrieMap.empty[Long, (String, Double)]
    runStream(replayDir, ckpt, acc)
    val expected = batchAnswer()
    assert(expected.nonEmpty && acc.nonEmpty)
    assert(report(acc) === expected)
  }

  test("mid-stream restart + overlapping re-delivery still converge to batch q142") {
    val replayDir = Files.createTempDirectory("graft-snap-replay2").toString
    val ckpt = Files.createTempDirectory("graft-snap-ckpt2").toString
    val acc = TrieMap.empty[Long, (String, Double)]
    writeReplayChunk(replayDir, 0, 600)
    runStream(replayDir, ckpt, acc)
    writeReplayChunk(replayDir, 400, Long.MaxValue) // [400,600) re-delivered
    runStream(replayDir, ckpt, acc)
    assert(report(acc) === batchAnswer())
  }
}
