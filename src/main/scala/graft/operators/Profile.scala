package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling — [EXT]: the per-column statistics pass every
  * large-scale ingestion runs before training (null rates, ranges,
  * checksums) to catch schema drift and corrupt loads.
  *
  * Scale shape: ONE full-scan aggregate computes every metric for every
  * profiled column map-side (a single partial-agg row per task), then a
  * codegen'd `stack` unpivots the 1-row result into the (column, metrics)
  * report — the scan is never repeated per column, which is the difference
  * between profiling at 100 TB in one pass and in N.
  *
  * Determinism: numeric metrics are cast to DECIMAL before aggregation
  * (order-free sums) and emitted as DOUBLE (the decimal is rounded to 2 dp
  * first, exactly representable at these magnitudes). Raw DECIMAL output
  * columns are never exposed — decimal stringification differs between
  * engines even when values are identical (same lesson as the HUGEINT
  * case documented in Multimodal.scala).
  */
object Profile {

  private val Dec = DecimalType(18, 2)

  // ---------------------------------------------------------------- q71
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val li = Fixtures.lineitem(s, dir)
    def m(c: String, p: String) = Seq(
      (count(lit(1)) - count(col(c))).as(s"${p}_nulls"),
      min(col(c).cast(Dec)).as(s"${p}_min"),
      max(col(c).cast(Dec)).as(s"${p}_max"),
      sum(col(c).cast(Dec)).cast(Dec).as(s"${p}_sum"))
    val ms = m("l_quantity", "q") ++ m("l_extendedprice", "e") ++ m("l_discount", "d")
    val agged = li.agg(ms.head, ms.tail: _*)
    agged.selectExpr(
      """stack(3,
        |  'l_discount',      d_nulls, d_min, d_max, d_sum,
        |  'l_extendedprice', e_nulls, e_min, e_max, e_sum,
        |  'l_quantity',      q_nulls, q_min, q_max, q_sum
        |) as (col_name, n_nulls, vmin, vmax, vsum)""".stripMargin)
      .select(col("col_name"), col("n_nulls"),
        round(col("vmin"), 2).cast("double").as("vmin"),
        round(col("vmax"), 2).cast("double").as("vmax"),
        round(col("vsum"), 2).cast("double").as("vsum"))
      .orderBy(col("col_name"))
  }

  private val q71Sql = {
    def row(c: String) =
      s"""SELECT '$c' AS col_name,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |  CAST(ROUND(MIN(CAST($c AS DECIMAL(18,2))), 2) AS DOUBLE) AS vmin,
         |  CAST(ROUND(MAX(CAST($c AS DECIMAL(18,2))), 2) AS DOUBLE) AS vmax,
         |  CAST(ROUND(SUM(CAST($c AS DECIMAL(18,2))), 2) AS DOUBLE) AS vsum
         |FROM lineitem""".stripMargin
    Seq("l_discount", "l_extendedprice", "l_quantity").map(row)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------- q90
  // Fixed-width histogram of events.value per event_type (bin width 50).
  // The distribution-profiling companion to q71's scalar stats. The policy
  // constant width keeps this ONE narrow map + one (type, bin)-keyed
  // aggregate — no data-dependent min/max pre-pass — so per-partition
  // partial counts are mergeable across any number of executors/batches
  // (the same mergeability contract as the sketches, but exact). Both
  // engines compute FLOOR(value / 50.0) with identical double semantics;
  // the per-bin sum is decimal so accumulation order cannot shift it.
  private val BinWidth = 50.0

  private def q90(s: SparkSession, dir: String): DataFrame =
    Fixtures.events(s, dir)
      .groupBy(col("event_type"),
        floor(col("value") / lit(BinWidth)).as("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2)
          .cast("double").as("sv"))
      .orderBy(col("event_type"), col("bin"))

  private val q90Sql =
    s"""SELECT event_type, CAST(FLOOR(value / $BinWidth) AS BIGINT) AS bin,
       |  COUNT(*) AS n,
       |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sv
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q71_profile", q71, Some(q71Sql)),
    GraftQuery("q90_histogram", q90, Some(q90Sql)))
}
