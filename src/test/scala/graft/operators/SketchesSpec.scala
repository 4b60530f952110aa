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

  test("approx percentiles bracket the exact percentiles within rank tolerance") {
    val approx = SparkEntry.queries("q73_approx_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // exact value at rank p ± 1% (accuracy 10000 ⇒ rank error 1e-4; the
    // loose ±1% window keeps the test robust at tiny fixture sizes)
    val exact = Fixtures.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.49, 0.51, 0.94, 0.96, 0.98, 1.0))").as("e"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, Seq(p50, p95, p99)) <- approx) {
      val e = exact(k)
      assert(p50 >= e(0) && p50 <= e(1), s"$k p50=$p50 not in [${e(0)}, ${e(1)}]")
      assert(p95 >= e(2) && p95 <= e(3), s"$k p95=$p95 not in [${e(2)}, ${e(3)}]")
      assert(p99 >= e(4) && p99 <= e(5), s"$k p99=$p99 not in [${e(4)}, ${e(5)}]")
    }
  }

  test("theta set-op estimates are EXACT below the sketch's nominal entries (unsampled mode)") {
    // The q76 oracle depends on this regime: no fixture cohort reaches the
    // 4096-entry nominal, so estimate == exact distinct for every set op.
    val r = SparkEntry.queries("q76_theta_setops")(spark, dir).head()
    // same high-value cohort definition as the query (value ≥ 70)
    val e = Fixtures.events(spark, dir).filter(col("value") >= 70)
    def exact(cond: org.apache.spark.sql.Column) =
      e.filter(cond).select(countDistinct(col("user_id"))).head().getLong(0)
    val click = exact(col("event_type") === "click")
    val view = exact(col("event_type") === "view")
    val union = exact(col("event_type").isin("click", "view"))
    assert(r.getLong(0) === click)
    assert(r.getLong(1) === view)
    assert(r.getLong(2) === union)
    assert(r.getLong(3) === click + view - union, "inclusion-exclusion intersection")
    assert(r.getLong(4) === union - view, "difference = union minus view side")
  }

  test("CMS estimates never under-count and hit exactly on a small key universe") {
    val est = SparkEntry.queries("q78_cms_freq")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Fixtures.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, ex) <- exact) {
      assert(est(k) >= ex, s"$k: CMS must never under-count (${est(k)} < $ex)")
      assert(est(k) === ex, s"$k: 20000-cell width over a 5-key universe must be exact")
    }
  }

  test("approx_top_k with capacity above the vocabulary returns the exact top-k") {
    val got = SparkEntry.queries("q79_topk_terms")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = Fixtures.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact)
  }

  test("KLL quantile estimates bracket exact percentiles within rank tolerance") {
    val approx = SparkEntry.queries("q80_kll_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val e = Fixtures.events(spark, dir)
    // exact values at rank p ± 3% (default k=200 ⇒ ~1.65% rank error)
    val brackets = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.47, 0.53, 0.92, 0.98, 0.96, 1.0))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap +
      ("ALL" -> e.agg(
        expr("percentile(value, array(0.47, 0.53, 0.92, 0.98, 0.96, 1.0))"))
        .head().getSeq[Double](0))
    assert(approx.keySet === brackets.keySet)
    for ((k, Seq(p50, p95, p99)) <- approx) {
      val b = brackets(k)
      assert(p50 >= b(0) && p50 <= b(1), s"$k p50=$p50 not in [${b(0)}, ${b(1)}]")
      assert(p95 >= b(2) && p95 <= b(3), s"$k p95=$p95 not in [${b(2)}, ${b(3)}]")
      assert(p99 >= b(4) && p99 <= b(5), s"$k p99=$p99 not in [${b(4)}, ${b(5)}]")
    }
  }

  test("persisted sketches survive a parquet round-trip and still merge exactly") {
    // the 100-TB contract in miniature: per-slice sketches written today
    // are re-unioned/intersected tomorrow without rescanning the data
    val e = Fixtures.events(spark, dir)
    val skDir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    e.groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"),
        hll_sketch_agg(col("user_id")).as("hll"))
      .write.mode("overwrite").parquet(skDir)
    val back = spark.read.parquet(skDir)
    val thetaUnion = back.agg(
      theta_sketch_estimate(theta_union_agg(col("sk"))).as("u"))
      .head().getLong(0)
    val hllUnion = back.agg(
      hll_sketch_estimate(hll_union_agg(col("hll"))).cast("long").as("u"))
      .head().getLong(0)
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(thetaUnion === exact, "theta union from persisted sketches (exact mode)")
    assert(math.abs(hllUnion - exact).toDouble / exact <= 0.05,
      "HLL union from persisted sketches within error bound")
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

  test("q84's pair matrix is observable: the metric counts exactly the materialized pairs") {
    // the sketch pair matrix is the engine's one non-broadcast crossJoin —
    // |types|²-bounded, but a wide-schema run must be able to SEE the
    // quadratic (the q133 TriCap pattern), not infer it from runtime
    val df = SparkEntry.queries("q84_overlap_matrix")(TestSpark.spark, TestSpark.sf0001)
    val rows = df.collect()
    val m = df.queryExecution.observedMetrics("q84_pairs")
    assert(m.getAs[Long]("pairs_emitted") === rows.length.toLong)
    val nTypes = (1 + math.sqrt(1 + 8.0 * rows.length)).toLong / 2
    assert(rows.length === (nTypes * (nTypes - 1) / 2),
      "matrix must hold exactly one row per unordered type pair")
  }
}
