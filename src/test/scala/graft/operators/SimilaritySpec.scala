package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contracts for the approximate operators (no DuckDB oracle):
  * IVF-ANN recall vs the brute-force baseline, HLL distinct error bound.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF ANN returns k neighbors per query with recall over brute force") {
    val brute = SparkEntry.queries("q21_ann_brute")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SparkEntry.queries("q22_ann_ivf")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == brute.keySet, "every query id answered")
    assert(ivf.values.forall(_.size == 5), "k results per query")
    val recall = brute.keys.toSeq
      .map(q => ivf(q).intersect(brute(q)).size / 5.0).sum / brute.size
    info(f"IVF recall@5 = $recall%.2f (nlist=16, nprobe=4, 1 Lloyd iter)")
    // nprobe/nlist = 1/4 of cells scanned; one Lloyd refinement lifts the
    // seed-centroid recall from ~0.2 to ~0.94 on the fixture — floor set
    // well below the measured value but far above the unrefined index, so a
    // regression to seed-quality centroids fails loudly.
    assert(recall >= 0.6, f"recall $recall%.2f below floor")
  }

  test("LSH bucketing is deterministic and distributes vectors") {
    import graft.Fixtures
    val e = Fixtures.embeddings(spark, TestSpark.sf0001)
    val b1 = Similarity.lshBuckets(e, nPlanes = 4)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = Similarity.lshBuckets(e, nPlanes = 4)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2, "deterministic buckets")
    val sizes = b1.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size > 4, s"vectors spread over buckets: ${sizes.toMap}")
    assert(sizes.values.max < b1.size, "not all in one bucket")
  }

  test("vec_dot is registered as a SQL function via GraftExtensions") {
    val v = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))""".stripMargin)
      .head().getDouble(0)
    assert(v == 11.0)
  }

  test("LSH-bucketed near-dup is a subset of brute force with identical scores") {
    // q106 applies q20's exact threshold + rescore to LSH candidates, so
    // every emitted pair MUST appear in q20 with the same cos_sim (false
    // positives are impossible by construction; misses are the LSH recall
    // tradeoff, observed ~13/14 at sf0.01 with 16 tables × 6 planes).
    val brute = SparkEntry.queries("q20_dedup_embedding")(spark, TestSpark.sf001)
    val lsh = SparkEntry.queries("q106_embed_dedup_lsh")(spark, TestSpark.sf001)
    val extras = lsh.join(brute, Seq("vec_a", "vec_b", "cos_sim"), "left_anti")
    assert(extras.isEmpty, "q106 emitted a pair q20 does not have (or a different score)")
    val (nb, nl) = (brute.count(), lsh.count())
    assert(nl <= nb)
    if (nb > 0) assert(nl > 0, "LSH found none of the brute-force pairs")
  }

  test("approx_count_distinct within 10% of exact") {
    val exact = SparkEntry.queries("q10_distinct")(spark, TestSpark.sf001)
      .collect().head
    val approx = SparkEntry.queries("q10_approx_distinct")(spark, TestSpark.sf001)
      .collect().head
    val (du, dt) = (exact.getLong(0).toDouble, exact.getLong(1).toDouble)
    assert(math.abs(approx.getLong(0) - du) / du <= 0.10)
    assert(math.abs(approx.getLong(1) - dt) / math.max(dt, 1.0) <= 0.10)
  }
}
