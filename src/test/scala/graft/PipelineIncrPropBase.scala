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
/** Shared random-corpus generator for the PipelineIncrProp* sweeps. The
  * original 3-test suite ran ~8 min sequentially; each sweep now lives in
  * its own class so build.sbt's testGrouping runs them in parallel forked
  * JVMs (the sweeps were already independent — fresh temp dirs and
  * re-seeded RNGs per test).
  */
abstract class PipelineIncrPropBase extends AnyFunSuite {
  protected lazy val spark = TestSpark.spark
  protected val Shards = 8

  protected def randomCorpus(rnd: scala.util.Random): Seq[(Long, String, String, String)] = {
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

}
