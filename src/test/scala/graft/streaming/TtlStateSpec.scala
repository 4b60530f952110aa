package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contract of value-state TTL: an expired key folds a late
  * record as if new (a SMALLER offset wins again), while TTL-less state
  * keeps last-write-wins forever. The TTL (2 s) is far below the enforced
  * inter-run sleep (6 s), so the assertion holds on any machine speed —
  * slower only makes expiry more certain.
  *
  * Each phase runs as its own single-batch (Trigger.Once) query against a
  * shared checkpoint. ProcessingTime time-mode queries never quiesce under
  * the default trigger or even AvailableNow (the engine keeps scheduling
  * batches for time-based state work — observed: 1000+ jobs without
  * termination), so the only deterministic drain is the explicit
  * one-batch-then-stop trigger — which is also how a production TTL'd job
  * runs scheduled catch-up passes.
  */
class TtlStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drainOnce(replayDir: String, ckpt: String,
      withTtl: Boolean): Seq[LatestRow] = {
    import spark.implicits._
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
      .as[Event]
    val table =
      if (withTtl)
        LatestByKeyStream.latestTableWithTtl(stream, java.time.Duration.ofSeconds(2))
      else LatestByKeyStream.latestTable(stream)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[LatestRow]()
    val q = table.writeStream
      .outputMode("update").option("checkpointLocation", ckpt)
      .trigger(Trigger.Once())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[LatestRow], _: Long) =>
        ds.collect().foreach(out.add); ()
      }
      .start()
    q.awaitTermination()
    out.toArray(Array.empty[LatestRow]).toSeq
  }

  private def lastEmittedAfterStaleReplay(withTtl: Boolean, tag: String): Long = {
    import spark.implicits._
    val replayDir = Files.createTempDirectory(s"graft-ttl-replay-$tag").toString
    val ckpt = Files.createTempDirectory(s"graft-ttl-ckpt-$tag").toString
    Seq(Event(100L, 1L, "first", 1.0)).toDF()
      .write.mode("append").parquet(replayDir)
    assert(drainOnce(replayDir, ckpt, withTtl).map(_.last_event_id) == Seq(100L))
    Thread.sleep(6000) // strictly beyond the 2 s TTL
    Seq(Event(1L, 1L, "late", 2.0)).toDF() // smaller offset than 100
      .write.mode("append").parquet(replayDir)
    val run2 = drainOnce(replayDir, ckpt, withTtl)
    assert(run2.size == 1, s"run 2 must fold exactly key 1, got $run2")
    run2.head.last_event_id
  }

  test("expired state refolds from the incoming record (smaller offset wins)") {
    assert(lastEmittedAfterStaleReplay(withTtl = true, "on") == 1L,
      "after TTL expiry the late event_id=1 must become the key's latest")
  }

  test("TTL-less state ignores the stale smaller offset") {
    assert(lastEmittedAfterStaleReplay(withTtl = false, "off") == 100L,
      "without TTL, last-write-wins by offset must hold")
  }
}
