package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q109 (BM25 retrieval) and q111 (hashed-feature linear quality
  * classifier) against independent sequential reference implementations on
  * plain Scala collections — same contract as BpeSpec: agreement with a
  * no-Spark re-derivation is evidence, not tautology. Both queries are also
  * DuckDB-oracled; these specs additionally pin the exact doc-level values
  * at sf0.001 so a drift in either engine's formula order is caught here
  * first.
  */
class RetrievalClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Spark ROUND(double, 9): decimal HALF_UP on the canonical repr. */
  private def round9(d: Double): Double =
    BigDecimal(d).setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** graft.functions.Rounding.stable — same IEEE ops. */
  private def stable(d: Double, n: Int): Double = {
    val f = math.pow(10, n)
    math.floor(d * f + 0.5) / f
  }

  /** Spark split(text, " ") keeps trailing empties (Java limit -1). */
  private def docs(): Seq[(Long, Array[String])] = {
    import spark.implicits._
    graft.Fixtures.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t.split(" ", -1)) }
  }

  test("q109_bm25 equals the sequential BM25 reference at sf0.001") {
    val terms = Seq("table", "hash", "window")
    val corpus = docs()
    val nd = corpus.size.toLong
    val nt = corpus.map(_._2.length.toLong).sum
    val avgdl = nt.toDouble / nd
    val df = terms.map(t => corpus.count(_._2.contains(t)).toLong)
    val idf = df.map(d => round9(math.log((nd.toDouble - d + 0.5) / (d + 0.5) + 1.0)))
    val expected = corpus.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val norm = 1.2 * (0.25 + 0.75 * (dl / avgdl))
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = toks.count(_ == t).toDouble
        idf(i) * ((tf * 2.2) / (tf + norm))
      }.reduceLeft(_ + _)
      (id, stable(score, 6))
    }.filter(_._2 > 0.0).sortBy { case (id, s) => (-s, id) }.take(20)

    import spark.implicits._
    val got = SparkEntry.queries("q109_bm25")(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q111_quality_classifier equals the sequential reference at sf0.001") {
    def bucket(t: String): Int = Integer.parseInt(md5hex("feat:" + t).substring(0, 4), 16) % 1024
    def weight(b: Int): Double =
      (Integer.parseInt(md5hex("w:" + b).substring(0, 4), 16) % 2001 - 1000) / 1000.0
    val expected = docs().map { case (id, toks) =>
      val sumw = toks.map(t => BigDecimal(round9(weight(bucket(t)))).setScale(12))
        .foldLeft(BigDecimal(0).setScale(12))(_ + _)
      val z = -0.01 + sumw.toDouble / toks.length
      (id, toks.length.toLong, stable(z, 6), if (z >= 0.0) 1 else 0)
    }.sortBy(_._1)

    import spark.implicits._
    val got = SparkEntry.queries("q111_quality_classifier")(spark, dir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got == expected)
    // the classifier must actually discriminate at this fixture scale
    assert(expected.exists(_._4 == 1) && expected.exists(_._4 == 0))
  }
}
