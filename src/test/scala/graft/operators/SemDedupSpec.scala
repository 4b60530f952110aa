package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode.HALF_UP

/** q110 (SemDeDup-style cluster dedup) against a full independent reference
  * on plain Scala collections: md5 plane signs, decimal projections, scaled-
  * long cell sums, exact-decimal pairwise cosine, dominated removal — no
  * Spark in the re-derivation, so agreement is evidence, not tautology
  * (same contract as BpeSpec / RetrievalClassifierSpec).
  *
  * The reference is PARAMETERIZED over the plane count and swept at 2, 4
  * (the oracle fixture shape), and 6 planes: the no-false-drop property —
  * every dropped vec has an exact-cosine ≥ τ same-cell partner that is more
  * central — must hold under ANY cell granularity, and adding planes must
  * only REFINE cells (bucket-bit prefix property), which is what makes
  * [[Similarity.semPlanesFor]]'s corpus-sized plane count a safe scale dial
  * rather than a semantics change.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
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

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    import spark.implicits._
    graft.Fixtures.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
  }

  /** Cells: AND-LSH over md5-derived hyperplanes, decimal-exact projections. */
  private def bucketsAt(planes: Int): Map[Long, Long] =
    vecs.map { case (id, v) =>
      val bits = (0 until planes).map { j =>
        val p = PlaneBase + j
        val pr = v.indices.map(d =>
            BigDecimal(roundN(v(d).toDouble * planeSign(p, d), 9)))
          .foldLeft(BigDecimal(0))(_ + _)
        if (pr >= 0) 1L << j else 0L
      }.sum
      id -> bits
    }.toMap

  /** The sequential reference at `planes`: (expected dropped rows, the
    * qualifying same-cell pair list, centrality map, bucket map).
    */
  private def reference(planes: Int): (Seq[(Long, Long, Double)],
      Seq[(Long, Long)], Map[Long, Double], Map[Long, Long]) = {
    val bucketOf = bucketsAt(planes)

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
    (dropped.map(id => (id, bucketOf(id), stable6(centOf(id)))),
      pairs, centOf, bucketOf)
  }

  /** The shared check: operator output ≡ reference, plus the no-false-drop
    * invariants, at a given plane count.
    */
  private def checkAt(planes: Int,
      got: Seq[(Long, Long, Double)], requireNonEmpty: Boolean): Unit = {
    val (expected, pairs, centOf, bucketOf) = reference(planes)
    assert(got == expected, s"planes=$planes")
    if (requireNonEmpty)
      assert(expected.nonEmpty, "vacuous fixture: no within-cell near-dups")

    // NO FALSE DROPS: every dropped vec has a same-cell exact-cosine ≥ τ
    // partner that is more central (or an equal-centrality smaller id) —
    // and the most-central member of each cell can never drop
    val droppedSet = expected.map(_._1).toSet
    val partners = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2)
    assert(droppedSet.forall { d =>
      partners.getOrElse(d, Nil).exists(p =>
        centOf(p) > centOf(d) || (centOf(p) == centOf(d) && p < d))
    }, s"planes=$planes: a drop without a dominating partner is a false drop")
    assert(pairs.forall { case (a, b) => droppedSet(a) || droppedSet(b) },
      s"planes=$planes: every qualifying pair must lose a member")
    val best = vecs.map(_._1).groupBy(bucketOf)
      .map { case (_, ids) => ids.maxBy(id => (centOf(id), -id)) }
    assert(best.forall(id => !droppedSet(id)),
      s"planes=$planes: a cell's most-central member dropped")
  }

  test("q110_semantic_dedup equals the sequential SemDeDup reference at sf0.001") {
    import spark.implicits._
    val got = SparkEntry.queries("q110_semantic_dedup")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    checkAt(Similarity.SemPlanes, got, requireNonEmpty = true)
  }

  test("the no-false-drop property holds at other plane counts (2 and 6)") {
    import spark.implicits._
    for (planes <- Seq(2, 6)) {
      val got = Similarity.semDedup(spark, dir, planes)
        .as[(Long, Long, Double)].collect().toSeq
      checkAt(planes, got, requireNonEmpty = false)
    }
  }

  test("adding planes only refines cells: bucket-bit prefix property and population bound") {
    val b2 = bucketsAt(2); val b4 = bucketsAt(4); val b6 = bucketsAt(6)
    assert(vecs.forall { case (id, _) => (b4(id) & 3L) == b2(id) })
    assert(vecs.forall { case (id, _) => (b6(id) & 15L) == b4(id) })
    def maxPop(b: Map[Long, Long]): Int =
      b.values.groupBy(identity).values.map(_.size).max
    assert(maxPop(b4) <= maxPop(b2) && maxPop(b6) <= maxPop(b4),
      "refinement must never grow a cell")
    // the sizing dial: more data → more planes, never fewer; floored at the
    // fixture shape and capped at the long-key width
    assert(Similarity.semPlanesFor(100L) === Similarity.SemPlanes)
    assert(Similarity.semPlanesFor(1L << 40, 256L) === 32)
    assert(Similarity.semPlanesFor(Long.MaxValue, 1L) === 62)
  }

  test("semDedupSized wires the dial: at fixture scale it sizes to the floor and equals q110") {
    import spark.implicits._
    val sized = Similarity.semDedupSized(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val fixture = SparkEntry.queries("q110_semantic_dedup")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(sized === fixture,
      "at n « targetCellPop·2^SemPlanes the sized entry must take the floor plane count")
  }
}
