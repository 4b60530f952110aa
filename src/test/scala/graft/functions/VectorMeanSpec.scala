package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF centroid step must combine map-side (no corpus × dims explode)
  * and stay bit-deterministic across partitionings — that invariance is
  * what lets the refined index be rebuilt reproducibly on any cluster.
  */
class VectorMeanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vmean = udaf(new VectorMean(9),
    org.apache.spark.sql.Encoders.product[VecIn])

  test("mean equals the per-component arithmetic mean") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f, 3.0f)),
      (0, Array(3.0f, 4.0f, 5.0f)),
      (1, Array(-1.0f, 0.5f, 0.25f))).toDF("g", "v")
    val got = df.groupBy($"g").agg(vmean($"v").as("m"))
      .orderBy($"g").collect()
      .map(_.getSeq[Float](1).toSeq)
    assert(got(0) == Seq(2.0f, 3.0f, 4.0f))
    assert(got(1) == Seq(-1.0f, 0.5f, 0.25f))
  }

  test("result is identical for every partitioning (order-free accumulation)") {
    import spark.implicits._
    val vecs = (1 to 500).map(i =>
      (i % 7, Array.tabulate(16)(d => ((i * 31 + d * 17) % 1000) / 999.0f - 0.5f)))
    def run(parts: Int) =
      vecs.toDF("g", "v").repartition(parts)
        .groupBy($"g").agg(vmean($"v").as("m"))
        .orderBy($"g").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq)).toSeq
    val a = run(1)
    assert(a == run(3) && a == run(32),
      "centroids must be bit-identical across partitionings")
  }

  test("plan aggregates partially before the shuffle (map-side combine)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 4, Array.fill(8)(i.toFloat))).toDF("g", "v")
    val p = df.groupBy($"g").agg(vmean($"v").as("m"))
      .queryExecution.executedPlan.toString
    // two aggregate phases around the exchange = partial buffers on the
    // wire (nlist × tasks), not raw vectors
    assert("(Sort|Hash|ObjectHash)Aggregate".r.findAllIn(p).size >= 2, p.take(1200))
    assert(!p.contains("Generate"), "no explode may appear in the centroid plan")
  }

  test("ragged vectors in one group fail loudly") {
    import spark.implicits._
    val df = Seq((0, Array(1.0f, 2.0f)), (0, Array(1.0f))).toDF("g", "v")
    val e = intercept[Exception] {
      df.coalesce(1).groupBy($"g").agg(vmean($"v").as("m")).collect()
    }
    assert(e.getMessage != null)
  }
}
