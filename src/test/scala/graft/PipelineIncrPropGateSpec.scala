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
class PipelineIncrPropGateSpec extends PipelineIncrPropBase {
  test("random gated delivery with a mid-run benchmark revision converges to the v2 one-shot (4 seeds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0)
    for (seed <- 1 to 4) {
      rnd.setSeed(seed * 49999L)
      val corpus = randomCorpus(rnd)
      val srcDir = Files.createTempDirectory(s"graft-ippg-src$seed").toString
      corpus.toDF("doc_id", "lang", "source", "text")
        .write.parquet(s"$srcDir/documents.parquet")
      // two disjoint eval sets drawn from the corpus (self-contamination
      // guaranteed to fire both before and after the revision)
      val windowed = corpus.filter(_._4.split(" ").length >= 8)
      val b1 = windowed.take(2).map(d => (d._1, d._4))
      val b2 = windowed.drop(2).take(2).map(d => (d._1, d._4))
      val bench1 = b1.toSeq.toDF("doc_id", "text").localCheckpoint()
      val bench2 = b2.toSeq.toDF("doc_id", "text").localCheckpoint()
      val shuffled = rnd.shuffle(corpus)
      val k = 4 + rnd.nextInt(2)
      val cut = (1 until k).map(_ => rnd.nextInt(shuffled.size)).distinct.sorted
      val chunks = ((0 +: cut) zip (cut :+ shuffled.size))
        .map { case (a, b) => shuffled.slice(a, b) }.filter(_.nonEmpty)
      val splitAt = 1 + rnd.nextInt(chunks.size - 1)
      val out = Files.createTempDirectory(s"graft-ippg-out$seed").toString
      chunks.take(splitAt).zipWithIndex.foreach { case (c, i) =>
        Pipeline.curateEpoch(c.toDF("doc_id", "lang", "source", "text"),
          out, Shards, i.toLong, Some(bench1))
      }
      Pipeline.regate(spark, out, bench2, splitAt.toLong)
      chunks.drop(splitAt).zipWithIndex.foreach { case (c, i) =>
        Pipeline.curateEpoch(c.toDF("doc_id", "lang", "source", "text"),
          out, Shards, (splitAt + 1 + i).toLong, Some(bench2))
      }
      val oneShot = Pipeline.curate(spark, srcDir,
        Files.createTempDirectory(s"graft-ippg-ref$seed").toString, Shards,
        Some(bench2))
      def rows(path: String): Seq[String] =
        spark.read.parquet(path).collect().map(_.toString).toSeq.sorted
      assert(rows(s"$out/corpus") === rows(oneShot.corpusPath), s"seed $seed corpus")
      assert(rows(s"$out/report") === rows(oneShot.reportPath), s"seed $seed report")
      assert(spark.read.parquet(s"$out/report")
        .agg(sum(col("docs_contaminated"))).head().getLong(0) > 0L,
        s"seed $seed: the revised benchmark must contaminate (vacuousness guard)")
      assert(Pipeline.validateCorpus(spark, out).isEmpty, s"seed $seed validate")
    }
  }
}