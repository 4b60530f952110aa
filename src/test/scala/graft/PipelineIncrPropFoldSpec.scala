package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep for the incremental curation pipeline: on RANDOM corpora
  * engineered to exercise every funnel gate — exact-duplicate bags under
  * different ids (keeper election + displacement), copied 16-token runs
  * (span-dup flips), sub-20-token docs (length gate, windowless),
  * single-token spam (entropy gate) — delivered as random-size chunks in
  * RANDOM order with random overlaps (at-least-once re-delivery), the
  * epoch fold must converge to the one-shot artifacts and self-validate.
  *
  * PipelineIncrSpec pins the fixture + the crash/replay machinery; this
  * sweep is the adversary for the delta MATH (fp-count merges, crossing
  * thresholds, displacement in arbitrary id order) beyond one fixture's
  * structure.
  */
class PipelineIncrPropFoldSpec extends PipelineIncrPropBase {
  test("many tiny chunks drive rolling folds and winv re-bucketing to convergence (2 seeds)") {
    // 12+ chunks: the rolling compaction rotates through all three
    // bucketed families several times (fold= layers live and age out)
    // and the flat window-log tails cross the FpCompactAt chunk-fold
    // trigger — the round-13 machinery under RANDOM delivery, not just
    // the fixture's shapes
    import spark.implicits._
    val rnd = new scala.util.Random(0)
    for (seed <- 1 to 2) {
      rnd.setSeed(seed * 104729L)
      val corpus = randomCorpus(rnd)
      val srcDir = Files.createTempDirectory(s"graft-ippf-src$seed").toString
      corpus.toDF("doc_id", "lang", "source", "text")
        .write.parquet(s"$srcDir/documents.parquet")
      val shuffled = rnd.shuffle(corpus)
      val k = 12 + rnd.nextInt(4)
      val cut = (1 until k).map(_ => rnd.nextInt(shuffled.size)).distinct.sorted
      val chunks = ((0 +: cut) zip (cut :+ shuffled.size))
        .map { case (a, b) => shuffled.slice(a, b) }
      val out = Files.createTempDirectory(s"graft-ippf-out$seed").toString
      chunks.zipWithIndex.foreach { case (c, i) =>
        // empty slices run too: heartbeat epochs interleave with folds
        Pipeline.curateEpoch(c.toDF("doc_id", "lang", "source", "text"),
          out, Shards, i.toLong)
      }
      // the deep delivery actually engaged the round-13 machinery
      val lastCommit = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$out/state/commit"))
        .toArray.map(_.toString.split("epoch=").last.toLong).max
      val ptr = spark.read.parquet(s"$out/state/commit/epoch=$lastCommit")
        .filter(col("kind").isin("fp", "v", "k"))
        .select(col("epoch")).collect().map(_.getLong(0))
      assert(ptr.exists(_ < 0L),
        s"seed $seed: ${chunks.size} epochs must have produced rolling folds")
      assert(java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$out/state/winvc"))
        .toArray.map(_.toString).count(_.contains("chunk=")) >= 2,
        s"seed $seed: the flat winv tails must have re-bucketed into a chunk")
      val oneShot = Pipeline.curate(spark, srcDir,
        Files.createTempDirectory(s"graft-ippf-ref$seed").toString, Shards)
      def rows(path: String): Seq[String] =
        spark.read.parquet(path).collect().map(_.toString).toSeq.sorted
      assert(rows(s"$out/corpus") === rows(oneShot.corpusPath), s"seed $seed corpus")
      assert(rows(s"$out/report") === rows(oneShot.reportPath), s"seed $seed report")
      assert(Pipeline.validateCorpus(spark, out).isEmpty, s"seed $seed validate")
    }
  }

}
