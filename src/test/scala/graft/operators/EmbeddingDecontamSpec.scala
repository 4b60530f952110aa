package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode.HALF_UP

/** q112 (embedding-space decontamination) against an independent sequential
  * reference: md5 hash split, exact-decimal cosine over every eval × train
  * pair, threshold + argmax — no Spark, no cells, so it also proves the
  * exhaustive cell-probe formulation is assignment-independent.
  */
class EmbeddingDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
  private val Tau = 0.35

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def round9(d: Double): Double =
    BigDecimal(d).setScale(9, HALF_UP).toDouble

  private def dotDec(a: Array[Float], b: Array[Float]): BigDecimal =
    a.indices.map(i => BigDecimal(round9(a(i).toDouble * b(i).toDouble)))
      .foldLeft(BigDecimal(0))(_ + _)

  test("q112_embedding_decontam equals the brute-force sequential reference at sf0.001") {
    import spark.implicits._
    val vecs = graft.Fixtures.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    def bkt(id: Long): Long = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 4), 16) % 100
    val train = vecs.filter(v => bkt(v._1) < 80)
    val evals = vecs.filter(v => bkt(v._1) >= 80)
    assert(train.nonEmpty && evals.nonEmpty)
    val n2 = vecs.map { case (id, v) => id -> dotDec(v, v) }.toMap

    val expected = evals.flatMap { case (q, qv) =>
      val hits = train.map { case (t, tv) =>
        val c = dotDec(qv, tv).toDouble /
          (math.sqrt(n2(t).toDouble) * math.sqrt(n2(q).toDouble))
        (t, c)
      }.filter(_._2 >= Tau)
      if (hits.isEmpty) None
      else {
        val (t, c) = hits.maxBy { case (t, c) => (c, -t) }
        Some((q, t, math.floor(c * 1e4 + 0.5) / 1e4))
      }
    }.sortBy(_._1)
    assert(expected.nonEmpty, "vacuous fixture: no cross-split semantic leaks")

    val got = SparkEntry.queries("q112_embedding_decontam")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }
}
