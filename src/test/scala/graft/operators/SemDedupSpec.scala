package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode.HALF_UP

/** q110 (SemDeDup-style cluster dedup) against a full independent reference
  * on plain Scala collections: md5 plane signs, decimal projections, scaled-
  * long cell sums, exact-decimal pairwise cosine, dominated removal — no
  * Spark in the re-derivation, so agreement is evidence, not tautology
  * (same contract as BpeSpec / RetrievalClassifierSpec).
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
  private val Planes = 4
  private val PlaneBase = 128
  private val Tau = 0.35

  private def planeSign(p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 1) 1.0 else -1.0
  }

  /** Spark ROUND(double, n): HALF_UP on the canonical decimal repr. */
  private def roundN(d: Double, n: Int): Double =
    BigDecimal(d).setScale(n, HALF_UP).toDouble

  private def stable6(d: Double): Double = math.floor(d * 1e6 + 0.5) / 1e6

  /** dotDec: Σ DECIMAL(round(xᵢ·yᵢ, 9)) — exact, order-free. */
  private def dotDec(a: Array[Float], b: Array[Float]): BigDecimal =
    a.indices.map(i => BigDecimal(roundN(a(i).toDouble * b(i).toDouble, 9)))
      .foldLeft(BigDecimal(0))(_ + _)

  test("q110_semantic_dedup equals the sequential SemDeDup reference at sf0.001") {
    import spark.implicits._
    val vecs = graft.Fixtures.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq

    // cells: AND-LSH over md5-derived hyperplanes, decimal-exact projections
    val bucketOf = vecs.map { case (id, v) =>
      val bits = (0 until Planes).map { j =>
        val p = PlaneBase + j
        val pr = v.indices.map(d =>
            BigDecimal(roundN(v(d).toDouble * planeSign(p, d), 9)))
          .foldLeft(BigDecimal(0))(_ + _)
        if (pr >= 0) 1L << j else 0L
      }.sum
      id -> bits
    }.toMap

    // centrality: dot(round(x·1e6) longs, cell component sums) / ‖x‖ — exact
    // integer arithmetic divided once in double
    val r6 = vecs.map { case (id, v) =>
      id -> v.map(x => BigDecimal(x.toDouble * 1e6).setScale(0, HALF_UP).toLong)
    }.toMap
    val cellSum: Map[Long, Array[Long]] = vecs.groupBy(v => bucketOf(v._1))
      .map { case (b, members) =>
        val s = new Array[Long](64)
        members.foreach { case (id, _) =>
          val r = r6(id); r.indices.foreach(i => s(i) += r(i)) }
        b -> s
      }
    val centOf = vecs.map { case (id, _) =>
      val r = r6(id); val s = cellSum(bucketOf(id))
      val num = r.indices.map(i => BigInt(r(i)) * BigInt(s(i))).sum
      val n2 = r.map(x => BigInt(x) * BigInt(x)).sum
      id -> (BigDecimal(num).toDouble / math.sqrt(BigDecimal(n2).toDouble))
    }.toMap

    // qualifying same-cell pairs at exact-decimal cosine ≥ τ
    val emb = vecs.toMap
    val n2d = vecs.map { case (id, v) => id -> dotDec(v, v) }.toMap
    val pairs = for {
      (a, b) <- vecs.map(_._1).combinations(2).map(p => (p(0) min p(1), p(0) max p(1))).toSeq
      if bucketOf(a) == bucketOf(b)
      c = dotDec(emb(a), emb(b)).toDouble /
        (math.sqrt(n2d(a).toDouble) * math.sqrt(n2d(b).toDouble))
      if c >= Tau
    } yield (a, b)

    // dominated removal: a pair drops its less-central member
    val dropped = pairs.map { case (a, b) =>
      if (centOf(a) > centOf(b) || (centOf(a) == centOf(b) && a < b)) b else a
    }.distinct.sorted
    val expected = dropped.map(id => (id, bucketOf(id), stable6(centOf(id))))

    val got = SparkEntry.queries("q110_semantic_dedup")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "vacuous fixture: no within-cell near-dups")

    // survivor invariant: every qualifying pair lost a member, so no
    // qualifying pair remains among survivors — and the most-central member
    // of each cell can never drop
    val droppedSet = dropped.toSet
    assert(pairs.forall { case (a, b) => droppedSet(a) || droppedSet(b) })
    val best = vecs.map(_._1).groupBy(bucketOf)
      .map { case (_, ids) => ids.maxBy(id => (centOf(id), -id)) }
    assert(best.forall(id => !droppedSet(id)))
  }
}
