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
class PipelineIncrPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Shards = 8

  private def randomCorpus(rnd: scala.util.Random): Seq[(Long, String, String, String)] = {
    val vocab = (0 until 60).map(i => s"w$i")
    def sentence(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val langs = Seq("en", "de", "fr")
    val sources = Seq("web", "code")
    val n = 80 + rnd.nextInt(60)
    val base = (0 until n).map { i =>
      val text = rnd.nextInt(10) match {
        case 0 => sentence(5 + rnd.nextInt(12)) // short: length gate
        case 1 => Seq.fill(30)("spam").mkString(" ") // entropy gate
        case _ => sentence(22 + rnd.nextInt(60))
      }
      (rnd.nextLong(1_000_000L), langs(rnd.nextInt(3)), sources(rnd.nextInt(2)), text)
    }.distinctBy(_._1)
    base.map { case (id, l, s, text) =>
      rnd.nextInt(6) match {
        case 0 => // exact duplicate bag of another doc (shuffled tokens)
          val donor = base(rnd.nextInt(base.size))._4.split(" ")
          (id, l, s, rnd.shuffle(donor.toSeq).mkString(" "))
        case 1 => // splice a 16-token run from a donor: span-dup pressure
          val donor = base(rnd.nextInt(base.size))._4.split(" ")
          val run = donor.slice(0, math.min(16, donor.length)).mkString(" ")
          (id, l, s, s"$text $run")
        case _ => (id, l, s, text)
      }
    }
  }

  test("random chunked delivery with overlaps converges to one-shot (4 seeds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0)
    for (seed <- 1 to 4) {
      rnd.setSeed(seed * 7919L)
      val corpus = randomCorpus(rnd)
      // one-shot reference needs the union corpus as a fixture dir
      val srcDir = Files.createTempDirectory(s"graft-ipp-src$seed").toString
      corpus.toDF("doc_id", "lang", "source", "text")
        .write.parquet(s"$srcDir/documents.parquet")
      // random chunking in RANDOM order (not sorted by id: displacement
      // must work in both directions), with ~20% of docs re-delivered in
      // a later chunk than their first appearance
      val shuffled = rnd.shuffle(corpus)
      val k = 3 + rnd.nextInt(3)
      val cut = (1 until k).map(_ => rnd.nextInt(shuffled.size)).sorted
      val chunks = ((0 +: cut) zip (cut :+ shuffled.size))
        .map { case (a, b) => shuffled.slice(a, b) }
        .filter(_.nonEmpty)
      val withOverlap = chunks.zipWithIndex.map { case (c, i) =>
        if (i == 0) c
        else c ++ chunks(rnd.nextInt(i)).filter(_ => rnd.nextInt(5) == 0)
      }
      val out = Files.createTempDirectory(s"graft-ipp-out$seed").toString
      withOverlap.zipWithIndex.foreach { case (c, i) =>
        Pipeline.curateEpoch(c.toDF("doc_id", "lang", "source", "text"),
          out, Shards, i.toLong)
      }
      val oneShot = Pipeline.curate(spark, srcDir,
        Files.createTempDirectory(s"graft-ipp-ref$seed").toString, Shards)
      def rows(path: String): Seq[String] =
        spark.read.parquet(path).collect().map(_.toString).toSeq.sorted
      assert(rows(s"$out/corpus") === rows(oneShot.corpusPath), s"seed $seed corpus")
      assert(rows(s"$out/manifest") === rows(oneShot.manifestPath), s"seed $seed manifest")
      assert(rows(s"$out/report") === rows(oneShot.reportPath), s"seed $seed report")
      assert(Pipeline.validateCorpus(spark, out).isEmpty, s"seed $seed validate")
      assert(oneShot.docsKept > 0 && oneShot.docsKept < corpus.size,
        s"seed $seed must exercise both keeps and drops (kept=${oneShot.docsKept}/${corpus.size})")
    }
  }

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
