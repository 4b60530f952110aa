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
    writeReplayChunk(replayDir, 0, Long.MaxValue)
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

  test("closed rows are final: no later epoch revises an emitted closed interval") {
    import spark.implicits._
    // fold the same changelog in two sequential batch calls through the
    // processor (batch mode exercises handleInputRows directly)
    val first = Scd2Stream.intervals(purchases(0, 500)).collect()
    val closed = first.filter(!_.is_current).map(r => r.event_id -> r).toMap
    val again = Scd2Stream.intervals(purchases(0, 500)).collect()
      .filter(!_.is_current).map(r => r.event_id -> r).toMap
    assert(closed.keySet === again.keySet)
    closed.foreach { case (id, r) =>
      assert(String.valueOf(r.valid_to) === String.valueOf(again(id).valid_to), s"event $id")
    }
  }
}
