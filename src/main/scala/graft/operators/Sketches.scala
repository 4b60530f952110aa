package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — [EXT]: Apache DataSketches HLL via
  * Spark's native `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
  * (codegen'd Catalyst aggregates, not UDFs).
  *
  * Why sketches and not `approx_count_distinct` (q10_approx): HLL++ inside
  * `approx_count_distinct` produces only a number; the DataSketches
  * functions produce a MERGEABLE binary sketch, which is the 100-TB
  * building block — per-partition/per-day sketches are aggregated once,
  * persisted, and re-unioned across arbitrary slices without rescanning
  * the fact table (the same partial-aggregation contract as the engine's
  * decomposable aggregates, extended to distinct counts).
  *
  * No DuckDB oracle (DuckDB's approx_distinct uses a different HLL
  * implementation — estimates can't hash-match) → driver records the
  * rows-only check; SketchesSpec pins the estimates against exact distinct
  * counts within HLL error bounds, and pins merge associativity
  * (union-of-parts == whole).
  */
object Sketches {

  // ---------------------------------------------------------------- q69
  // Distinct users per event type, plus the union across all types —
  // computed once over the events scan as sketches, then estimated.
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val e = Fixtures.events(s, dir)
    val perType = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val all = perType.agg(hll_union_agg(col("sk")).as("sk"))
      .select(lit("ALL").as("event_type"), col("sk"))
    perType.unionByName(all)
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).cast("long").as("est_users"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q73
  // Mergeable approximate percentiles (Greenwald-Khanna summaries inside
  // `approx_percentile`): the distribution-drift monitor for a 100 TB
  // column — partial summaries combine map-side and merge across
  // partitions/days, unlike exact percentiles (q38) which need a full sort
  // per group. Rank error ≤ 1/accuracy; value bounds are property-tested
  // against the exact percentiles in SketchesSpec (no DuckDB oracle:
  // its approx_quantile uses a different sketch).
  private def q73(s: SparkSession, dir: String): DataFrame =
    Fixtures.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("p"))
      .select(col("l_returnflag"),
        col("p").getItem(0).as("p50"),
        col("p").getItem(1).as("p95"),
        col("p").getItem(2).as("p99"))
      .orderBy(col("l_returnflag"))

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q69_hll_users", q69, None),
    GraftQuery("q73_approx_percentiles", q73, None))
}
