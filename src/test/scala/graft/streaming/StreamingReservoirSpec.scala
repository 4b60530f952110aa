package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import graft.{Fixtures, SparkEntry, TestSpark}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming reservoir must equal the BATCH q134 answer over the
  * documents streamed so far — top-k-by-priority is a mergeable monoid, so
  * the fold over any batch split converges to the one-shot sample. Also
  * pins idempotent re-delivery (the at-least-once foreachBatch contract).
  */
class StreamingReservoirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeOrderedReplay(replayDir: String, ranges: Seq[(Int, Int)]): Unit = {
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val base = System.currentTimeMillis() - 1000000
    for (((lo, hi), i) <- ranges.zipWithIndex) {
      val tmp = Files.createTempDirectory("graft-res-part").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.toString.endsWith(".parquet")).get
      val dst = Paths.get(replayDir, f"f$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base + i * 10000))
    }
  }

  private def batchTopK(maxDoc: Int): Seq[(Long, Long, Double)] =
    graft.operators.TextAnalysis.reservoirScores(
        Fixtures.documents(spark, TestSpark.sf0001)
          .filter(col("doc_id") < maxDoc)
          .select(col("doc_id"), col("text")))
      .orderBy(col("pri").desc, col("doc_id"))
      .limit(graft.operators.TextAnalysis.ResK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("streamed reservoir equals the batch q134 sample after every prefix of batches") {
    val replayDir = Files.createTempDirectory("graft-res-replay").toString
    val stateDir = Files.createTempDirectory("graft-res-state").toString + "/st"
    val ckpt = Files.createTempDirectory("graft-res-ckpt").toString
    val ranges = Seq((0, 170), (170, 340), (340, 500))
    writeOrderedReplay(replayDir, ranges)

    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = ReservoirStream.start(stream, stateDir, ckpt)
    q.processAllAvailable()
    q.stop()

    // final state == one-shot batch sample over all docs
    val got = ReservoirStream.reservoir(spark, stateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === batchTopK(500))
    assert(got === SparkEntry.queries("q134_weighted_reservoir")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)

    // every intermediate partition was the batch answer over its prefix
    val partitions = spark.read.parquet(s"$stateDir/res")
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(partitions.length === 3)
    for ((b, prefixMax) <- partitions.zip(Seq(170, 340, 500))) {
      val state = spark.read.parquet(s"$stateDir/res")
        .filter(col("batch") === b)
        .select(col("doc_id"), col("n_tok"), col("pri"))
        .orderBy(col("pri").desc, col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(state === batchTopK(prefixMax), s"batch $b state != prefix sample")
    }

    // idempotent re-delivery: re-running the LAST batch rewrites its
    // partition to the identical reservoir
    val lastBatch = partitions.last
    val lastDocs = Fixtures.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") >= 340 && col("doc_id") < 500)
      .select(col("doc_id"), col("text"))
    ReservoirStream.sampleBatch(lastDocs, stateDir, graft.operators.TextAnalysis.ResK, lastBatch)
    val again = ReservoirStream.reservoir(spark, stateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again === got, "re-delivered batch must leave the reservoir unchanged")

    // checkpoint loss is detected, not silently mis-folded: a fresh
    // checkpoint restarts batch ids at 0 while batch=2 state remains —
    // folding batch 0 against that state must fail loudly (scaladoc's
    // recovery contract), never read the stale max partition
    val ex = intercept[IllegalStateException] {
      ReservoirStream.sampleBatch(lastDocs, stateDir,
        graft.operators.TextAnalysis.ResK, batchId = 0L)
    }
    assert(ex.getMessage.contains("checkpoint"), ex.getMessage)
  }
}
