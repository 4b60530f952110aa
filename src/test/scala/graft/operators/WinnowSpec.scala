package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Engine-behavior pins for the winnowing fingerprints (q128) and the
  * MOSS-shaped edit-distance near-dup (q129) — the guarantees the DuckDB
  * value oracle can't express:
  *
  *  1. the WINNOWING GUARANTEE: two documents sharing any token run of
  *     length ≥ K + W − 1 share at least one selected fingerprint — the
  *     property that makes the sparse index sound as a candidate generator;
  *  2. the MAX-GAP guarantee: every window of W consecutive k-gram
  *     positions contains a selection (this is what bounds recall loss vs
  *     the every-offset q102 index while keeping ~2/(W+1) density);
  *  3. q129's verify contract: emitted distances equal a reference
  *     Levenshtein implementation and never exceed MaxDist.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = Winnow.K
  private val W = Winnow.W

  private val tokGen: Gen[String] = Gen.choose(0, 40).map(i => s"w$i")

  private def selOf(texts: Seq[(Long, String)]): Map[Long, Seq[(Long, Long)]] = {
    import spark.implicits._
    Winnow.minimizers(texts.toDF("doc_id", "text"))
      .select(col("doc_id"), col("v40"), col("spos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (d, rows) => d -> rows.map(r => (r._2, r._3)).sortBy(_._2).toSeq }
  }

  test("winnowing guarantee: a shared run of K+W-1 tokens yields a shared selected v40 (8 seeds)") {
    val params = Gen.Parameters.default
    for (seed <- 1 to 8) {
      val run = Gen.listOfN(K + W - 1, tokGen).apply(params, Seed(seed * 31L)).get
      val padA = Gen.listOfN(40, tokGen).apply(params, Seed(seed * 31L + 1)).get
      val padB = Gen.listOfN(40, tokGen).apply(params, Seed(seed * 31L + 2)).get
      val at = Gen.choose(0, 40).apply(params, Seed(seed * 31L + 3)).get
      val a = padA.take(at) ++ run ++ padA.drop(at)
      val b = padB.drop(7) ++ run ++ padB.take(7)
      val sel = selOf(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
      val shared = sel(1L).map(_._1).toSet intersect sel(2L).map(_._1).toSet
      assert(shared.nonEmpty,
        s"seed $seed: docs share a ${K + W - 1}-token run but no selected fingerprint")
    }
  }

  test("max-gap guarantee: every W-window of k-gram positions contains a selection (6 seeds)") {
    val params = Gen.Parameters.default
    for (seed <- 1 to 6) {
      val n = Gen.choose(K + W - 1, 120).apply(params, Seed(900L + seed)).get
      val toks = Gen.listOfN(n, tokGen).apply(params, Seed(950L + seed)).get
      val sel = selOf(Seq(1L -> toks.mkString(" ")))(1L)
      val nk = n - K + 1
      val pos = sel.map(_._2)
      assert(pos.head <= W - 1, s"seed $seed: first window [0, ${W - 1}] has no selection")
      assert(pos.last >= nk - W, s"seed $seed: last window has no selection")
      for (Seq(p, q) <- pos.sliding(2) if pos.length > 1)
        assert(q - p <= W, s"seed $seed: gap $p -> $q exceeds W=$W")
      // selection is deterministic
      assert(selOf(Seq(1L -> toks.mkString(" ")))(1L) === sel)
    }
  }

  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    for (i <- 1 to a.length) {
      var diag = prev(0)
      prev(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) diag else diag + 1
        diag = prev(j)
        prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1), cost)
      }
    }
    prev(b.length)
  }

  test("q129 on the fixture: emitted distances match reference Levenshtein and respect MaxDist") {
    val rows = graft.SparkEntry.queries("q129_edit_near_dup")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt))
    assert(rows.nonEmpty, "fixture has near-dup structure; q129 must find pairs")
    val texts = graft.Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((a, b, d) <- rows) {
      assert(d >= 0 && d <= Winnow.MaxDist, s"pair ($a,$b) dist $d out of range")
      assert(d === lev(texts(a), texts(b)), s"pair ($a,$b) dist mismatch vs reference DP")
    }
  }

  test("q129 candidates include every planted pair sharing a long run (verify keeps close ones)") {
    // two near-identical docs (one token substituted) must surface as a pair
    import spark.implicits._
    val params = Gen.Parameters.default
    val toks = Gen.listOfN(60, tokGen).apply(params, Seed(4242L)).get
    val edited = toks.updated(30, "SUBST")
    val docs = Seq(1L -> toks.mkString(" "), 2L -> edited.mkString(" ")).toDF("doc_id", "text")
    val sel = Winnow.minimizers(docs).select(col("doc_id"), col("v40")).distinct()
    val shared = sel.as("a").join(sel.as("b"),
        col("a.v40") === col("b.v40") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(shared > 0, "one-token edit must leave shared selected fingerprints")
  }

  test("q128 fixture invariants: n_min <= n_kgrams, shared_frac within [0,1], density near 2/(W+1)") {
    val rows = graft.SparkEntry.queries("q128_winnow_fingerprints")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    for ((id, nk, nMin, nShared, frac) <- rows) {
      assert(nMin >= 1 && nMin <= nk, s"doc $id: n_min $nMin vs n_kgrams $nk")
      assert(nShared >= 0 && nShared <= nMin, s"doc $id: n_shared $nShared vs n_min $nMin")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id: shared_frac $frac")
      // max-gap => at least ~nk/W selections; distinctness keeps it <= nk
      assert(nMin >= nk / (2 * W), s"doc $id: implausibly sparse selection")
    }
  }
}
