package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** Streaming ≡ batch for the core reference semantic (SURVEY §5.3): events
  * replayed through a file stream into `transformWithState` must converge to
  * the batch latest-by-key answer — including across a checkpoint restart
  * (the reference's A22 recovery invariant: state+offsets move together).
  */
class StreamingLatestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batchAnswer(): Map[Long, (String, Double, Long)] = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value").as[Event]
      .collect()
      .groupBy(_.user_id)
      .map { case (k, es) =>
        val last = es.maxBy(_.event_id)
        k -> ((last.event_type, last.value, last.event_id))
      }
  }

  private def writeReplayChunk(dir: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value").as[Event]
      .filter(e => e.event_id >= lo && e.event_id < hi)
      .repartition(2)
      .write.mode("append").parquet(dir)
  }

  private def runStream(replayDir: String, ckpt: String,
      acc: TrieMap[Long, LatestRow]): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[Event]
    val q = LatestByKeyStream.latestTable(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[LatestRow], _: Long) =>
        ds.collect().foreach(r => acc(r.user_id) = r)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("file replay through transformWithState equals batch latest-by-key") {
    val replayDir = Files.createTempDirectory("graft-replay").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    writeReplayChunk(replayDir, 0, Long.MaxValue)
    val acc = TrieMap.empty[Long, LatestRow]
    runStream(replayDir, ckpt, acc)
    val expected = batchAnswer()
    assert(acc.size == expected.size)
    expected.foreach { case (k, (et, v, id)) =>
      val got = acc(k)
      assert((got.last_event_type, got.last_value, got.last_event_id) == ((et, v, id)),
        s"key $k")
    }
  }

  test("restart from checkpoint mid-stream converges to the same table") {
    val replayDir = Files.createTempDirectory("graft-replay2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    val acc = TrieMap.empty[Long, LatestRow]
    writeReplayChunk(replayDir, 0, 500)       // first half
    runStream(replayDir, ckpt, acc)           // run + stop (checkpointed)
    writeReplayChunk(replayDir, 500, Long.MaxValue) // rest arrives
    runStream(replayDir, ckpt, acc)           // restart from same checkpoint
    val expected = batchAnswer()
    assert(acc.size == expected.size)
    expected.foreach { case (k, (et, v, id)) =>
      val got = acc(k)
      assert((got.last_event_type, got.last_value, got.last_event_id) == ((et, v, id)),
        s"key $k")
    }
  }

  test("state store reader exposes the materialized RocksDB state (A18/A20 on real state)") {
    val replayDir = Files.createTempDirectory("graft-replay3").toString
    val ckpt = Files.createTempDirectory("graft-ckpt3").toString
    writeReplayChunk(replayDir, 0, Long.MaxValue)
    val acc = TrieMap.empty[Long, LatestRow]
    runStream(replayDir, ckpt, acc)
    val state = spark.read.format("statestore")
      .option("stateVarName", "latest")
      .load(ckpt)
    val rows = state.selectExpr("key.value AS user_id", "value.*").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    val expected = batchAnswer()
    assert(rows.size == expected.size)
    expected.foreach { case (k, (_, _, id)) => assert(rows(k) == id, s"key $k") }
  }

  test("tombstone processor deletes keys") {
    import spark.implicits._
    import org.apache.spark.sql.{Encoders, streaming}
    val events = Seq(
      Event(1, 10, "click", 1.0), Event(2, 10, "gone", 0.0),
      Event(3, 11, "view", 2.0)).toDS()
    implicit val enc = Encoders.product[LatestRow]
    val out = events.groupByKey(_.user_id)
      .transformWithState(new LatestValueWithTombstoneProcessor("gone"),
        streaming.TimeMode.None(), streaming.OutputMode.Update())
      .collect()
    assert(out.map(_.user_id).toSet == Set(11L))
  }
}
