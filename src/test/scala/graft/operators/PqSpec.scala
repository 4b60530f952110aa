package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization contract:
  *  - when the per-subspace codebooks can represent every subvector
  *    exactly, ADC ranking IS exact ranking (the q46 trick applied to PQ);
  *  - on real fixtures the compressed search must still recover most of
  *    the brute-force neighbors (recall property — PQ is approximate by
  *    contract, so no value oracle);
  *  - codes are deterministic across partitionings and within range
  *    (the compression claim: m small ints per vector).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact-reconstruction corpus: ADC top-k equals brute-force top-k") {
    import spark.implicits._
    // vocabulary of 4 distinct subvector patterns per subspace; the first 4
    // vectors enumerate the vocabulary, so k=4 seed codebooks cover every
    // subvector exactly and iters=0 keeps them — reconstruction is exact,
    // hence ADC cosine == exact cosine for every pair
    val dims = 16; val m = 4; val d = dims / m
    def pattern(p: Int, sub: Int): Array[Float] =
      Array.tabulate(d)(i => (1.0 + p + 0.1 * sub + 0.01 * i).toFloat)
    val vecs = (0 until 40).map { id =>
      val e = (0 until m).flatMap { sub =>
        val p = if (id < 4) id else (id * 7 + sub * 13) % 4
        pattern(p, sub)
      }.toArray
      (id.toLong, e)
    }
    val e = vecs.toDF("vec_id", "embedding")

    val got = Similarity.pqTopK(e, col("vec_id") < 5, m = m, k = 4,
      iters = 0, topK = 3, dims = dims)
      .orderBy($"query_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

    // brute-force exact cosine reference, same tie order
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = (0L until 5L).flatMap { q =>
      val qv = vecs(q.toInt)._2
      vecs.filter(_._1 != q)
        .map { case (id, v) =>
          (id, dot(qv, v) / (math.sqrt(dot(v, v)) * math.sqrt(dot(qv, qv)))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }
    assert(got == expected,
      "with exact codebooks, compressed ADC ranking must equal exact ranking")
  }

  test("recall@5 of PQ against the brute-force oracle on fixtures") {
    val brute = SparkEntry.queries("q21_ann_brute")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pq = SparkEntry.queries("q99_pq_topk")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      (brute(q) intersect pq.getOrElse(q, Set.empty)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5,
      f"mean recall@5 $mean%.2f — 32x-compressed codes should still recover " +
        "half the exact neighbors on these fixtures")
  }

  test("codes are in range and deterministic across partitionings") {
    val e = Fixtures.embeddings(spark, TestSpark.sf0001)
    val cb = Similarity.pqTrain(e, m = 8, k = 16, iters = 1)
    def codesOf(parts: Int) =
      Similarity.pqEncode(e.repartition(parts), cb, m = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val a = codesOf(2)
    assert(a == codesOf(13), "codes must be partitioning-invariant")
    assert(a.forall { case (_, sub, code) => sub >= 0 && sub < 8 && code >= 0 && code < 16 })
    // every vector carries exactly m codes — the 8-byte compressed form
    val perVec = a.groupBy(_._1).values.map(_.size).toSet
    assert(perVec == Set(8))
  }

  test("pq scoring never reads the raw corpus vectors (compressed-index plan)") {
    val e = Fixtures.embeddings(spark, TestSpark.sf0001)
    val cb = Similarity.pqTrain(e, m = 8, k = 16, iters = 1)
    val codes = Similarity.pqEncode(e, cb, m = 8)
    // the scoring join is codes ⋈ broadcast LUT: assert the compressed side
    // exposes no embedding column to score from
    assert(!codes.columns.contains("embedding"))
    assert(codes.schema("code").dataType == org.apache.spark.sql.types.IntegerType)
  }
}
