package graft.streaming

import graft.{Fixtures, SparkEntry, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** Streaming ≡ batch for the SCD2 interval build: the purchase changelog
  * replayed through `transformWithState` must converge to batch q141 —
  * per event_id, the LAST emitted row (closed rows are final; the open row
  * is superseded per epoch) equals the batch interval table — including
  * across a mid-stream checkpoint restart (the A22 recovery invariant) and
  * under at-least-once re-delivery of an already-folded chunk.
  */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type Key = (Long, Long, String, Double, String, Boolean)

  private def rowKey(event_id: Long, user_id: Long, from: java.sql.Timestamp,
      value: Double, to: java.sql.Timestamp, current: Boolean): Key =
    (event_id, user_id, String.valueOf(from), value, String.valueOf(to), current)

  private def batchAnswer(): Map[Long, Key] =
    SparkEntry.queries("q141_scd2_intervals")(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) -> rowKey(r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getDouble(3), r.getTimestamp(4), r.getBoolean(5)))
      .toMap

  private def purchases(lo: Long, hi: Long): Dataset[Scd2Event] = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "purchase" &&
        col("event_id") >= lo && col("event_id") < hi)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .as[Scd2Event]
  }

  private def writeReplayChunk(dir: String, lo: Long, hi: Long): Unit =
    purchases(lo, hi).repartition(2).write.mode("append").parquet(dir)

  private def runStream(replayDir: String, ckpt: String,
      acc: TrieMap[Long, Key]): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[Scd2Event]
    val q = Scd2Stream.intervals(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[Scd2Row], _: Long) =>
        ds.collect().foreach(r => acc(r.event_id) =
          rowKey(r.event_id, r.user_id, r.valid_from, r.value, r.valid_to,
            r.is_current))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("replayed purchase changelog converges to the batch q141 interval table") {
    val replayDir = Files.createTempDirectory("graft-scd2-replay").toString
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toString
    // three chunks → ≥3 micro-batches (2 files each, maxFilesPerTrigger=2),
    // so intervals genuinely close across batch boundaries
    writeReplayChunk(replayDir, 0, 300)
    writeReplayChunk(replayDir, 300, 700)
    writeReplayChunk(replayDir, 700, Long.MaxValue)
    val acc = TrieMap.empty[Long, Key]
    runStream(replayDir, ckpt, acc)
    val expected = batchAnswer()
    assert(expected.nonEmpty && acc.size === expected.size)
    assert(acc.toMap === expected)
  }

  test("mid-stream restart + re-delivered rows still converge to batch q141") {
    val replayDir = Files.createTempDirectory("graft-scd2-replay2").toString
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt2").toString
    val acc = TrieMap.empty[Long, Key]
    writeReplayChunk(replayDir, 0, 500)             // first half
    runStream(replayDir, ckpt, acc)                 // run + stop (checkpointed)
    writeReplayChunk(replayDir, 300, Long.MaxValue) // rest, OVERLAPPING
                                                    // [300,500): re-delivery
    runStream(replayDir, ckpt, acc)                 // restart, same checkpoint
    val expected = batchAnswer()
    assert(acc.size === expected.size)
    assert(acc.toMap === expected)
  }

  test("out-of-order changelog (ts regressing against offset) fails loudly") {
    import spark.implicits._
    val bad = Seq(
      Scd2Event(1, 7, java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), 1.0),
      Scd2Event(2, 7, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2.0)).toDS()
    val ex = intercept[Throwable] { Scd2Stream.intervals(bad).collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("out-of-order"),
      s"contract violation must fail loudly, got: ${msgs(ex).take(400)}")
  }

  test("cross-epoch violation (old offset re-delivered with a NEWER ts) fails loudly") {
    import spark.implicits._
    val replayDir = Files.createTempDirectory("graft-scd2-viol").toString
    val ckpt = Files.createTempDirectory("graft-scd2-viol-ckpt").toString
    def chunk(rows: Seq[Scd2Event]): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(replayDir)
    chunk(Seq(Scd2Event(5, 1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0)))
    val acc = TrieMap.empty[Long, Key]
    runStream(replayDir, ckpt, acc) // epoch 1 sets the open interval (id 5)
    chunk(Seq(Scd2Event(3, 1, java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), 2.0)))
    val ex = intercept[Throwable] { runStream(replayDir, ckpt, acc) }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("out-of-order"),
      s"old-offset/newer-ts must fail loudly, got: ${msgs(ex).take(400)}")
  }

  test("closed rows are final: the second epoch folds over state without revising them") {
    // genuinely two epochs over ONE checkpointed state: the first run
    // closes intervals and leaves opens; the second run's new events close
    // those opens — every row closed in epoch 1 must re-appear (if at all)
    // byte-identical, never with a revised valid_to
    val replayDir = Files.createTempDirectory("graft-scd2-replay3").toString
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt3").toString
    val acc = TrieMap.empty[Long, Key]
    writeReplayChunk(replayDir, 0, 500)
    runStream(replayDir, ckpt, acc)
    val closedAfterFirst = acc.toMap.filter { case (_, k) => !k._6 }
    assert(closedAfterFirst.nonEmpty, "epoch 1 must close some intervals")
    writeReplayChunk(replayDir, 500, Long.MaxValue)
    runStream(replayDir, ckpt, acc)
    closedAfterFirst.foreach { case (id, row) =>
      assert(acc(id) === row, s"closed interval of event $id was revised by epoch 2")
    }
    // and epoch 2 did close previously-open intervals (state actually folded)
    val reclosed = acc.toMap.filter { case (id, k) =>
      !k._6 && !closedAfterFirst.contains(id) && id < 500 }
    assert(reclosed.nonEmpty, "epoch 2 must close epoch-1 open intervals")
  }
}
