package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the windowed CDC chunker over ARBITRARY token streams —
  * the invariants the fixture-based CurationSpec cases can't sweep:
  *
  *  1. partition: chunks reconstruct every document exactly (token counts
  *     sum, indices contiguous, no empty chunk) for any corpus;
  *  2. edit locality: inserting tokens ANYWHERE perturbs only chunks whose
  *     window reaches the edit — every chunk fully before, and every chunk
  *     starting ≥ CdcWin-1 tokens after the insertion point, keeps its
  *     fingerprint (the CDC contract q101's fixed stride lacks);
  *  3. determinism: chunking is a pure function of text.
  *
  * Uses scalacheck generators directly (deterministic seeds) — no
  * scalatestplus bridge in the offline cache.
  */
class CdcPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val W = 8 // Curation.CdcWin

  private val tokGen: Gen[String] = Gen.choose(0, 60).map(i => s"t$i")
  private val docGen: Gen[List[String]] =
    Gen.choose(1, 300).flatMap(n => Gen.listOfN(n, tokGen))

  private def chunksOf(texts: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, Long)]] = {
    import spark.implicits._
    Curation.cdcChunks(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
      }
  }

  test("chunks partition any document; chunking is deterministic (6 seeds)") {
    val params = Gen.Parameters.default
    for (seed <- 1 to 6) {
      val docs = (0 until 20).map { i =>
        val toks = docGen.apply(params, Seed(seed * 100L + i)).get
        (i.toLong, toks.mkString(" "))
      }
      val ch = chunksOf(docs)
      for ((id, text) <- docs) {
        val n = text.split(" ", -1).length.toLong
        val rows = ch.getOrElse(id, Seq.empty)
        assert(rows.nonEmpty, s"doc $id produced no chunks")
        assert(rows.map(_._2).sum === n, s"doc $id token counts don't reconstruct")
        assert(rows.map(_._1) === rows.indices.map(_.toLong), s"doc $id indices not contiguous")
        assert(rows.forall(_._2 > 0), s"doc $id has an empty chunk")
      }
      assert(chunksOf(docs) === ch, "chunking must be deterministic")
    }
  }

  test("edit locality: an insertion perturbs only chunks whose window reaches it (6 seeds)") {
    val params = Gen.Parameters.default
    for (seed <- 1 to 6) {
      val toks = Gen.listOfN(250, tokGen).apply(params, Seed(7000L + seed)).get
      val insertAt = Gen.choose(0, toks.length).apply(params, Seed(8000L + seed)).get
      val inserted = toks.take(insertAt) ++ List("XX", "YY", "ZZ") ++ toks.drop(insertAt)
      val both = chunksOf(Seq(1L -> toks.mkString(" "), 2L -> inserted.mkString(" ")))
      val (a, b) = (both(1L), both(2L))
      // chunk start offsets from the partition property
      val aStarts = a.scanLeft(0L)(_ + _._2).init
      val bFps = b.map(_._3).groupBy(identity).view.mapValues(_.length).toMap
      // a chunk of A is UNREACHED by the edit iff (a) it ends at or before
      // the insertion point via a CUT boundary (the doc-final chunk's end
      // is the doc edge, not a cut — an end-of-doc insertion can legally
      // merge into it), or (b) it starts ≥ W tokens after the insertion
      // point, past the region where B can grow novel cuts (B's windows at
      // shifted positions < insertAt + W + |ins| overlap the inserted
      // tokens); shifted content and boundaries are then verbatim
      val unreached = a.zip(aStarts).filter { case ((_, len, _), start) =>
        (start + len <= insertAt && start + len < toks.length) ||
          start >= insertAt + W
      }
      val missing = unreached
        .map(_._1._3).groupBy(identity).view.mapValues(_.length)
        .filter { case (fp, cnt) => bFps.getOrElse(fp, 0) < cnt }
      assert(missing.isEmpty,
        s"seed $seed insertAt $insertAt: ${missing.size} unreached chunks lost their fingerprint")
    }
  }
}
