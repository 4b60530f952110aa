package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep for the bloom-prefiltered decontamination: on random
  * corpora with planted train→eval contamination, the bloom path must be
  * ROW-IDENTICAL to the plain exact join — the no-false-negatives +
  * confirm-join contract, checked beyond the single fixture CurationSpec
  * pins. Doc ids are drawn across the md5-bucket space so every seed
  * populates both splits.
  */
class CurationPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tokensFrame(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
  }

  test("bloom decontamination ≡ exact join on random contaminated corpora (6 seeds)") {
    val rnd = new scala.util.Random(0)
    for (seed <- 1 to 6) {
      rnd.setSeed(seed * 104729L)
      val vocab = (0 until 40).map(i => s"w$i")
      def sentence(n: Int): String =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // 120 docs over the whole id space; ~1/3 of them get an 8-token run
      // copied from another doc (cross-bucket contamination by chance)
      val base = (0 until 120).map(i => (i * 977L + seed, sentence(10 + rnd.nextInt(30))))
      val docs = base.map { case (id, text) =>
        if (rnd.nextInt(3) == 0) {
          val donor = base(rnd.nextInt(base.size))._2.split(" ")
          val run = donor.slice(0, math.min(8, donor.length)).mkString(" ")
          (id, s"$text $run")
        } else (id, text)
      }
      val frame = tokensFrame(docs)
      val withBloom = Curation.decontamOver(frame, bloom = true)
        .collect().map(_.toString).toSeq
      val exact = Curation.decontamOver(frame, bloom = false)
        .collect().map(_.toString).toSeq
      assert(withBloom === exact, s"seed $seed diverged")
    }
  }

  test("empty train split degrades gracefully and still equals the exact join") {
    // ids chosen so every doc lands in the eval bucket (>= 95): train side
    // empty → bloom build returns no filter → prefilter must be skipped,
    // and both paths must agree (empty: no train windows to hit)
    val evalIds = (0L until 5000L).filter { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val bucket = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 100
      bucket >= 95
    }.take(6)
    assert(evalIds.size === 6)
    val docs = evalIds.map(id => (id, Seq.fill(12)("tok").mkString(" ")))
    val frame = tokensFrame(docs)
    val withBloom = Curation.decontamOver(frame, bloom = true).collect()
    val exact = Curation.decontamOver(frame, bloom = false).collect()
    assert(withBloom.isEmpty && exact.isEmpty)
  }
}
