package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------------------- q121
  // Distribution-drift monitor (PSI — population stability index) between a
  // baseline and a current window of the SAME table: the check every
  // ingestion pipeline runs when a new dump lands ("did the event-type mix
  // shift?"). psi_term = (p−q)·ln(p/q) per bin; Σ > 0.2 is the classic
  // retrain/alert threshold — emitting per-bin terms keeps the report
  // actionable (which bin moved) and the output BIGINT/6-dp-double exact.
  //
  // Scale shape: ONE conditional-aggregate scan produces both windows' bin
  // counts (never two scans of a 100 TB table), totals ride a 1-row
  // broadcast (provably safe, same as q40's corpus_n). Bins with an empty
  // side emit NULL psi (ln would be ±∞) — mirrored CASE in the oracle.
  /** Per-bin PSI report between the rows where `isBase` holds (baseline
    * window) and the rest (current window). One conditional-aggregate scan;
    * `bin` must name a column in `df`.
    */
  def psi(df: DataFrame, bin: String, isBase: Column): DataFrame = {
    val binned = df
      .groupBy(col(bin))
      .agg(sum(when(isBase, 1L).otherwise(0L)).as("n_base"),
        sum(when(!isBase, 1L).otherwise(0L)).as("n_cur"))
    val totals = binned.agg(sum(col("n_base")).as("t_base"), sum(col("n_cur")).as("t_cur"))
    val p = col("n_base").cast("double") / col("t_base")
    val q = col("n_cur").cast("double") / col("t_cur")
    binned.crossJoin(broadcast(totals))
      .select(col(bin), col("n_base"), col("n_cur"),
        graft.functions.Rounding.stable(p, 6).as("p"),
        graft.functions.Rounding.stable(q, 6).as("q"),
        when(col("n_base") > 0 && col("n_cur") > 0,
          graft.functions.Rounding.stable((p - q) * log(p / q), 6)).as("psi_term"))
      .orderBy(col(bin))
  }

  private def q121(s: SparkSession, dir: String): DataFrame =
    psi(Fixtures.events(s, dir), "event_type",
      col("ts") < lit("2024-01-16").cast("timestamp"))

  private val q121Sql =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY event_type),
      |t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS t_base, CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM b)
      |SELECT event_type, n_base, n_cur,
      |  floor((CAST(n_base AS DOUBLE) / t_base) * 1000000.0 + 0.5) / 1000000.0 AS p,
      |  floor((CAST(n_cur AS DOUBLE) / t_cur) * 1000000.0 + 0.5) / 1000000.0 AS q,
      |  CASE WHEN n_base > 0 AND n_cur > 0 THEN
      |    floor(((CAST(n_base AS DOUBLE) / t_base - CAST(n_cur AS DOUBLE) / t_cur)
      |      * ln((CAST(n_base AS DOUBLE) / t_base) / (CAST(n_cur AS DOUBLE) / t_cur)))
      |      * 1000000.0 + 0.5) / 1000000.0
      |  END AS psi_term
      |FROM b CROSS JOIN t ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q136
  // Exact two-sample Kolmogorov–Smirnov drift per source: for each source,
  // D = sup_t |F_source(t) − F_rest(t)| over the document-length
  // distribution — the bin-free complement to q121's PSI (PSI needs a
  // binning choice and goes ±∞ on empty bins; KS is distribution-free and
  // the classic "did this source's length profile shift?" test before
  // mixing a new dump).
  //
  // EXACT INTEGER sup: D_num = max_t |cum1·n2 − cum2·n1| over the dense
  // (source × value) grid, so the supremum and argmax are bit-exact in both
  // engines (n1·n2 ≤ (N/2)² keeps BIGINT safe to N ≈ 6·10⁹ documents); only
  // the final normalized d = D_num/(n1·n2) is a double, rounded 6 dp from
  // identical integer inputs. The dense grid is |sources| × |distinct
  // lengths| — catalog-sized, built by a constant-key broadcast join, never
  // a corpus-scale product; the corpus itself is touched by ONE
  // per-(source, value) aggregate.
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sv = Fixtures.documents(s, dir)
      .select(col("source"), col("n_chars").as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      .persist() // read thrice: per-value margin, per-source sizes, the grid
    val gv = sv.groupBy(col("v")).agg(sum(col("c")).as("cv"))
    val srcs = sv.groupBy(col("source")).agg(sum(col("c")).as("n1"))
    val nTot = srcs.agg(sum(col("n1")).as("n"))
    val grid = srcs.withColumn("k", lit(1))
      .join(gv.withColumn("k", lit(1)), Seq("k")).drop("k")
      .join(sv, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .withColumn("cum1", sum(col("c")).over(w))
      .withColumn("cumg", sum(col("cv")).over(w))
      .crossJoin(broadcast(nTot))
      .withColumn("stat", abs(col("cum1") * (col("n") - col("n1"))
        - (col("cumg") - col("cum1")) * col("n1")))
      .groupBy(col("source"), col("n1"), col("n"))
      .agg(max(col("stat")).as("d_num"))
      .select(col("source"), col("n1").as("n_docs"), col("d_num"),
        graft.functions.Rounding.stable(
          col("d_num").cast("double") / (col("n1") * (col("n") - col("n1"))).cast("double"),
          6).as("d"))
      .orderBy(col("source"))
  }

  private val q136Sql =
    """WITH sv AS (
      |  SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |gv AS (SELECT v, SUM(c) AS cv FROM sv GROUP BY 1),
      |srcs AS (SELECT source, SUM(c) AS n1 FROM sv GROUP BY 1),
      |tot AS (SELECT SUM(n1) AS n FROM srcs),
      |grid AS (
      |  SELECT srcs.source, gv.v, srcs.n1, gv.cv, COALESCE(sv.c, 0) AS c
      |  FROM srcs CROSS JOIN gv
      |  LEFT JOIN sv ON sv.source = srcs.source AND sv.v = gv.v),
      |cum AS (
      |  SELECT source, n1,
      |    SUM(c) OVER (PARTITION BY source ORDER BY v
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    SUM(cv) OVER (PARTITION BY source ORDER BY v
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumg
      |  FROM grid),
      |stat AS (
      |  SELECT source, n1,
      |    abs(cum1 * ((SELECT n FROM tot) - n1) - (cumg - cum1) * n1) AS st
      |  FROM cum)
      |SELECT source, CAST(n1 AS BIGINT) AS n_docs,
      |  CAST(MAX(st) AS BIGINT) AS d_num,
      |  floor(CAST(MAX(st) AS DOUBLE)
      |        / CAST(n1 * ((SELECT n FROM tot) - n1) AS DOUBLE) * 1000000.0 + 0.5)
      |    / 1000000.0 AS d
      |FROM stat GROUP BY source, n1 ORDER BY source""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q71_profile", q71, Some(q71Sql)),
    GraftQuery("q90_histogram", q90, Some(q90Sql)),
    GraftQuery("q121_drift_psi", q121, Some(q121Sql)),
    GraftQuery("q136_ks_drift", q136, Some(q136Sql)))
}
