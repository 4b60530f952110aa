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
}
