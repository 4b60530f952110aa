package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ contract: with every cell probed and residual codebooks that
  * reconstruct every residual exactly, the compressed ADC ranking equals
  * brute force (both approximation layers removed at once — the q46 trick
  * applied to the composed index). On real fixtures the two-stage
  * configuration must still recover the exact neighbors (recall property).
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("all cells probed + exact residual reconstruction: ADC equals brute force") {
    import spark.implicits._
    // two far-apart cell bases (±50); every other vector is base-0 plus a
    // per-component pattern from a 4-entry vocabulary. Seeds 0..1 are the
    // bases (zero residual), seeds 2..5 enumerate the vocabulary, so the
    // k=6 residual codebooks represent every residual exactly (component
    // subtraction near 50 is Sterbenz-exact in float), and nprobe = nlist
    // probes everything: both approximations vanish.
    val dims = 16; val m = 4
    def pattern(j: Int)(i: Int): Float = ((1.0 + j + 0.03 * i) * 0.5).toFloat
    val vecs = (0 until 40).map { id =>
      val e: Array[Float] =
        if (id == 0) Array.fill(dims)(50.0f)
        else if (id == 1) Array.fill(dims)(-50.0f)
        else if (id < 6) Array.tabulate(dims)(i => 50.0f + pattern(id - 2)(i))
        else Array.tabulate(dims) { i =>
          val sub = i / (dims / m)
          50.0f + pattern((id * 7 + sub * 13) % 4)(i)
        }
      (id.toLong, e)
    }
    val e = vecs.toDF("vec_id", "embedding")

    val got = Similarity.ivfpqTopK(e, col("vec_id").between(2, 6),
      nlist = 2, nprobe = 2, m = m, k = 6, iters = 0, topK = 3,
      dims = dims, rerank = 0)
      .orderBy($"query_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = (2L to 6L).flatMap { q =>
      val qv = vecs(q.toInt)._2
      vecs.filter(_._1 != q)
        .map { case (id, v) =>
          (id, dot(qv, v) / (math.sqrt(dot(v, v)) * math.sqrt(dot(qv, qv)))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }
    assert(got == expected,
      "with exhaustive probing and exact residual codebooks, IVF-PQ must equal brute force")
  }

  test("recall@5 of the production IVF-PQ configuration vs the brute oracle") {
    val brute = SparkEntry.queries("q21_ann_brute")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivfpq = SparkEntry.queries("q100_ann_ivfpq")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      (brute(q) intersect ivfpq.getOrElse(q, Set.empty)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4,
      f"mean recall@5 $mean%.2f — nprobe=nlist/2 with 30-deep exact re-rank " +
        "should recover a large share of exact neighbors")
  }
}
