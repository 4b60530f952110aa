package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-means semantics beyond the q123 value oracle: the distributed Lloyd
  * loop must equal a sequential reference fold of the SAME integer
  * recurrence (quantize → argmin assign → truncated-mean update), and the
  * result must be invariant to input partitioning.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 8
  private val Iters = 3

  /** Sequential reference: plain Scala, no Spark. Mirrors q62 quantization,
    * min-(dist, cid) assignment, `sum / n` truncated-mean update (Scala Long
    * division truncates toward zero, same as Spark `div`), empty-cluster
    * centroid carry, and final-assignment stats.
    */
  private def refKmeans(vecs: Seq[(Long, Array[Double])], k: Int,
      iters: Int): Seq[(Int, Long, Long, Long)] = {
    val q: Seq[(Long, Array[Long])] = vecs.flatMap { case (id, xs) =>
      val m = xs.map(math.abs).max
      if (m <= 0) None
      else Some(id -> xs.map(x => math.floor(x / (m / 127.0) + 0.5).toLong))
    }.sortBy(_._1)
    val byId = q.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var cents: Map[Int, Array[Long]] =
      q.take(k).zipWithIndex.map { case ((_, v), i) => i -> v }.toMap
    def assign(): Seq[(Long, Int, Long)] = q.map { case (id, v) =>
      val (d, cid) = cents.toSeq.map { case (c, cv) => (dist(v, cv), c) }.min
      (id, cid, d)
    }
    for (_ <- 1 to iters) {
      val members = assign().groupBy(_._2)
      cents = cents.map { case (cid, old) =>
        members.get(cid) match {
          case Some(ms) =>
            val vs = ms.map(m => byId(m._1))
            cid -> Array.tabulate(old.length)(i => vs.map(_(i)).sum / vs.size)
          case None => cid -> old
        }
      }
    }
    assign().groupBy(_._2).toSeq.map { case (cid, ms) =>
      (cid, ms.size.toLong, ms.map(_._3).sum, cents(cid).map(math.abs).sum)
    }.sortBy(_._1)
  }

  private def refFromFixture(dir: String): Seq[(Int, Long, Long, Long)] = {
    val vecs = Fixtures.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .toSeq
    refKmeans(vecs, K, Iters)
  }

  test("distributed Lloyd loop equals the sequential integer reference") {
    val got = SparkEntry.queries("q123_kmeans")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === refFromFixture(TestSpark.sf0001))
  }

  test("every vector lands in exactly one of k clusters") {
    val out = SparkEntry.queries("q123_kmeans")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val n = Fixtures.embeddings(spark, TestSpark.sf0001).count()
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.forall { case (cid, _) => cid >= 0 && cid < K })
    assert(out.map(_._2).sum === n, "members across clusters partition the corpus")
  }

  test("result is invariant to input partitioning") {
    import org.apache.spark.sql.DataFrame
    def viaPartitions(parts: Int): Seq[(Int, Long, Long, Long)] = {
      val absmax = aggregate(col("embedding"),
        lit(0.0), (a, x) => greatest(a, abs(x.cast("double"))))
      val qdocs: DataFrame = Fixtures.embeddings(spark, TestSpark.sf0001)
        .repartition(parts)
        .select(col("vec_id"), col("embedding"), absmax.as("m"))
        .filter(col("m") > 0)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") / (col("m") / 127.0) + 0.5).cast("long"))
            .as("qv"))
      Clustering.kmeans(qdocs, K, Iters)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }
    assert(viaPartitions(1) === viaPartitions(13))
  }
}
