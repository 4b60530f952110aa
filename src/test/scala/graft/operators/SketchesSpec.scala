package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("HLL estimates match exact distinct counts within 5% per type and overall") {
    val est = SparkEntry.queries("q69_hll_users")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = Fixtures.events(spark, dir)
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("ALL" -> e.select(countDistinct(col("user_id"))).head().getLong(0))
    assert(est.keySet === exact.keySet)
    for ((k, ex) <- exact) {
      val er = math.abs(est(k) - ex).toDouble / ex
      assert(er <= 0.05, s"$k: estimate ${est(k)} vs exact $ex (err $er)")
    }
  }

  test("sketch union is merge-associative: union of per-type sketches == whole-table sketch") {
    val e = Fixtures.events(spark, dir)
    val viaUnion = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long"))
      .head().getLong(0)
    val direct = e.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).cast("long"))
      .head().getLong(0)
    assert(viaUnion === direct)
  }
}
