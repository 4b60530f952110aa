package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The distributed BPE trainer must reproduce the sequential reference
  * algorithm EXACTLY: same greedy left-to-right merge application, same
  * (count desc, left asc, right asc) argmax, same end-of-word marker.
  * The reference below is implemented independently on plain Scala
  * collections — no Spark — so agreement is evidence, not tautology.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** UTF-8 binary string order — Spark's native string comparison (UTF8String
    * bytes). Java's String.compareTo is UTF-16 code-unit order, which
    * disagrees for supplementary-plane characters (surrogates sort below
    * U+E000..U+FFFF in UTF-16 but above in UTF-8), so the reference must
    * compare the same way the engine's argmax does.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Sequential reference: classic BPE on a weighted vocab. */
  private def referenceMerges(wordFreq: Map[String, Long],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordFreq
      .groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ "</w>" }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        val maxCnt = counts.valuesIterator.max
        val (a, b) = counts.collect { case (p, c) if c == maxCnt => p }
          .reduceLeft { (p, q) =>
            val c = utf8Compare(p._1, q._1)
            if (c < 0 || (c == 0 && utf8Compare(p._2, q._2) <= 0)) p else q
          }
        val cnt = maxCnt
        out += ((r, a, b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result()
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("distributed merge table equals the sequential reference exactly") {
    val wordFreq = Fixtures.documents(spark, dir)
      .selectExpr("explode(split(text, ' ')) AS w")
      .filter("length(w) > 0")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceMerges(wordFreq, 12)
    val got = SparkEntry.queries("q107_bpe_merges")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    assert(got.size === 12, "fixture corpus must support 12 merges")
    // merged symbols appear as inputs of later merges (vocab actually grows)
    val produced = got.map { case (_, a, b, _) => a + b }.toSet
    assert(got.exists { case (_, a, b, _) => produced(a) || produced(b) },
      "no later merge consumed an earlier merge's symbol — trainer not iterating")
  }

  test("encoding histogram equals the sequential reference encoder") {
    val wordFreq = Fixtures.documents(spark, dir)
      .selectExpr("explode(split(text, ' ')) AS w")
      .filter("length(w) > 0")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceMerges(wordFreq, 12).map { case (_, a, b, _) => (a, b) }
    // sequential encode: apply merges in rank order to each word
    def encode(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector :+ "</w>") { case (syms, (a, b)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
    val expected = wordFreq.toSeq
      .flatMap { case (w, n) => encode(w).map(_ -> n) }
      .groupMapReduce(_._1)(_._2)(_ + _).toSeq
      .sortBy { case (s, n) => (-n, s) }.take(20)
    val got = SparkEntry.queries("q108_bpe_encode")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("greedy merge application handles overlapping runs (aaa + (a,a) -> [aa, a])") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"))
      .toDF("symbols")
    val merged = df.select(Bpe.mergePair(col("symbols"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(merged.toList === List(List("aa", "a"), List("aa", "aa"), List("b", "aa")))
  }
}
