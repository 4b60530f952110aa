package graft.streaming

import graft.{Fixtures, SparkEntry, TestSpark}
import graft.operators.Curation
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch for the decontamination gate: the eval split replayed
  * through [[DecontamStream]] (bloom prefilter against the broadcast
  * train-side filter + exact confirm) must emit exactly batch q104's
  * verdict rows — per-doc n_win, n_hit, and the rounded contam_frac —
  * including across a mid-stream checkpoint restart and under overlapping
  * at-least-once re-delivery. Verdicts are per-doc deterministic against a
  * FIXED train side, so any batch arrangement must converge to the same
  * set; that independence is the contract this spec pins.
  */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def batchAnswer(): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries("q104_decontamination")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  /** The corpus' eval-split docs (md5 bucket ≥ 95) with ids in [lo, hi). */
  private def writeEvalChunk(replayDir: String, lo: Long, hi: Long): Unit =
    Fixtures.documents(spark, dir)
      .filter(Curation.md5Bucket(col("doc_id")) >= 95)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(replayDir)

  private def runStream(replayDir: String, outDir: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = DecontamStream.start(stream, dir, outDir, ckpt)
    q.processAllAvailable()
    q.stop()
  }

  private def got(outDir: String): Map[Long, (Long, Long, Double)] =
    DecontamStream.verdicts(spark, outDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("replayed eval split reproduces batch q104 verdicts exactly") {
    val replayDir = Files.createTempDirectory("graft-dcs-replay").toString
    val outDir = Files.createTempDirectory("graft-dcs-out").toString
    val ckpt = Files.createTempDirectory("graft-dcs-ckpt").toString
    // three chunks → three micro-batches (one file each)
    writeEvalChunk(replayDir, 0, 2000)
    writeEvalChunk(replayDir, 2000, 4000)
    writeEvalChunk(replayDir, 4000, Long.MaxValue)
    runStream(replayDir, outDir, ckpt)
    val expected = batchAnswer()
    assert(expected.nonEmpty, "fixture must contain contaminated eval docs")
    assert(got(outDir) === expected)
  }

  test("mid-stream restart + overlapping re-delivery still equals batch q104") {
    val replayDir = Files.createTempDirectory("graft-dcs-replay2").toString
    val outDir = Files.createTempDirectory("graft-dcs-out2").toString
    val ckpt = Files.createTempDirectory("graft-dcs-ckpt2").toString
    writeEvalChunk(replayDir, 0, 3000)
    runStream(replayDir, outDir, ckpt) // stop mid-corpus (checkpointed)
    writeEvalChunk(replayDir, 2000, Long.MaxValue) // [2000,3000) re-delivered
    runStream(replayDir, outDir, ckpt) // restart from the checkpoint
    assert(got(outDir) === batchAnswer())
  }

  test("a re-delivered batch rewrites its partition idempotently") {
    val outDir = Files.createTempDirectory("graft-dcs-idem").toString
    val docs = Fixtures.documents(spark, dir)
      .filter(Curation.md5Bucket(col("doc_id")) >= 95)
      .select(col("doc_id"), col("text"))
    val tf = DecontamStream.trainFilter(spark, dir)
    DecontamStream.gateBatch(docs, tf, outDir, 0L)
    val first = spark.read.parquet(s"$outDir/verdicts").collect().toSet
    DecontamStream.gateBatch(docs, tf, outDir, 0L) // retry of batch 0
    val second = spark.read.parquet(s"$outDir/verdicts").collect().toSet
    assert(first === second, "a retried batch must rewrite, not double-append")
    assert(first.nonEmpty)
  }

  test("an empty train corpus yields no verdicts (gate short-circuits)") {
    val emptyDir = Files.createTempDirectory("graft-dcs-empty").toString
    Fixtures.documents(spark, dir).limit(0)
      .write.parquet(s"$emptyDir/documents.parquet")
    val outDir = Files.createTempDirectory("graft-dcs-empty-out").toString
    val docs = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text")).limit(50)
    val tf = DecontamStream.trainFilter(spark, emptyDir)
    assert(tf.bloomBytes.isEmpty)
    DecontamStream.gateBatch(docs, tf, outDir, 0L)
    assert(spark.read.parquet(s"$outDir/verdicts").isEmpty)
  }

  test("verdicts() on a stream that never landed a batch returns an empty frame, not a throw") {
    // start() skips empty batches, so a quiet stream writes NO partition —
    // the cumulative reader must fold that to empty with the right schema
    val outDir = Files.createTempDirectory("graft-dcs-novd").toString
    val v = DecontamStream.verdicts(spark, outDir)
    assert(v.isEmpty)
    assert(v.columns.toSeq === Seq("doc_id", "n_win", "n_hit", "contam_frac"))
    // and a dir that exists but holds only a crash-stranded _temporary
    // subtree counts as "no batch landed" too
    val stranded = java.nio.file.Paths.get(s"$outDir/verdicts/_temporary/0")
    Files.createDirectories(stranded)
    Files.write(stranded.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(DecontamStream.verdicts(spark, outDir).isEmpty)
  }
}
