package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine pins for the distribution-signal operators (q136 exact KS drift,
  * q138 token entropy) beyond their value oracles.
  */
class TextSignalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("q143 n-gram diversity equals a sequential set count per source") {
    val got = SparkEntry.queries("q143_ngram_diversity")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got.nonEmpty)
    val docs = Fixtures.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    for ((src, byS) <- docs.groupBy(_._1)) {
      val toks = byS.map(_._2)
      val nTok = toks.map(_.length.toLong).sum
      val triTotal = toks.map(t => math.max(0, t.length - 2).toLong).sum
      val uniD = toks.flatten.toSet.size.toLong
      val triD = toks.flatMap(_.sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSet.size.toLong
      val (gTok, gUni, gTriT, gTriD, uttr, tttr) = got(src)
      assert((gTok, gUni, gTriT, gTriD) === ((nTok, uniD, triTotal, triD)), s"source $src")
      assert(uttr === math.floor(uniD.toDouble / nTok * 1e4 + 0.5) / 1e4, s"source $src uni_ttr")
      assert(tttr === math.floor(triD.toDouble / triTotal * 1e4 + 0.5) / 1e4, s"source $src tri_ttr")
      assert(uttr > 0 && uttr <= 1 && tttr > 0 && tttr <= 1)
    }
  }

  test("q143 approx diversity: totals exact, distinct counts within 5% of the exact twin") {
    val exact = SparkEntry.queries("q143_ngram_diversity")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val approx = SparkEntry.queries("q143_approx_diversity")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(approx.keySet === exact.keySet)
    for ((src, (nTok, uniD, triT, triD)) <- exact) {
      val (aTok, aUni, aTriT, aTriD) = approx(src)
      assert(aTok === nTok && aTriT === triT, s"$src: totals must be exact")
      assert(math.abs(aUni - uniD) <= 0.05 * uniD, s"$src: uni $aUni vs $uniD")
      assert(math.abs(aTriD - triD) <= 0.05 * triD, s"$src: tri $aTriD vs $triD")
    }
  }

  test("q143 keeps degenerate sources: a no-trigram source appears with zero counts and NULL tri_ttr") {
    // inner joins on the gram counts would silently omit exactly the
    // template/short-doc sources a diversity audit exists to expose
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q143-degen").toString
    Seq((1L, "en", "short", "one two"), (2L, "en", "short", "one"),
        (3L, "en", "normal", "a b c d e"))
      .toDF("doc_id", "lang", "source", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q143_ngram_diversity")(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("short", "normal"))
    val s = got("short")
    assert(s.getLong(1) === 3L, "n_tok")
    assert(s.getLong(2) === 2L, "n_uni_distinct")
    assert(s.getLong(3) === 0L, "n_tri_total")
    assert(s.getLong(4) === 0L, "n_tri_distinct")
    assert(!s.isNullAt(5), "uni_ttr defined when tokens exist")
    assert(s.isNullAt(6), "tri_ttr must be NULL, not a div-by-zero artifact")
    assert(got("normal").getLong(4) === 3L, "normal source unaffected")
  }

  test("q138 entropy equals a sequential mirror of the LUT formula on every doc") {
    val got = SparkEntry.queries("q138_token_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val texts = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    for ((id, text) <- texts) {
      val counts = text.split(" ", -1).groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val slog = counts.map(c => c * math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong).sum
      val h = math.floor((math.log(n.toDouble) - slog.toDouble / (n * 1000000.0)) * 1e6 + 0.5) / 1e6
      val (gn, gu, gh) = got(id)
      assert(gn === n && gu === counts.size, s"doc $id counts mismatch")
      assert(gh === h, s"doc $id entropy $gh != reference $h")
    }
  }

  test("q138 entropy bounds: 0 <= h <= ln(n_unique), uniform docs hit the top") {
    val rows = SparkEntry.queries("q138_token_entropy")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for ((id, n, u, h) <- rows) {
      assert(h >= -1e-6, s"doc $id negative entropy $h")
      assert(h <= math.log(u.toDouble) + 1e-5, s"doc $id h=$h exceeds ln(n_unique=$u)")
      if (n == u) // every token distinct -> exactly maximal
        assert(math.abs(h - math.floor(math.log(n.toDouble) * 1e6 + 0.5) / 1e6) < 1e-9)
    }
  }

  test("q136 KS: D is the true sup over thresholds (sequential reference, every source)") {
    val got = SparkEntry.queries("q136_ks_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val rows = Fixtures.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    val values = rows.map(_._2).distinct.sorted
    for ((src, (n1, dNum, d)) <- got) {
      val mine = rows.filter(_._1 == src).map(_._2)
      assert(n1 === mine.length.toLong)
      val n2 = n - n1
      val ref = values.map { t =>
        val c1 = mine.count(_ <= t).toLong
        val cg = rows.count(_._2 <= t).toLong
        math.abs(c1 * n2 - (cg - c1) * n1)
      }.max
      assert(dNum === ref, s"$src D_num $dNum != reference $ref")
      assert(d === math.floor(ref.toDouble / (n1 * n2).toDouble * 1e6 + 0.5) / 1e6)
    }
  }
}
