package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar resampling with forward fill — the gap-filling step every
  * time-series feature pipeline runs before training (turn an irregular
  * event log into one row per key per period, carrying the last observation
  * forward across silent periods).
  *
  * Scale shape: the observed-value aggregate and the per-key bounds both
  * shuffle once on the key; the calendar grid is generated in-plan with
  * `sequence()+explode` (rows proportional to key-count × period-count, no
  * driver loop); the fill is ONE WindowExec over (key, period) — the same
  * single shuffle the grid join already required, so AQE reuses the
  * exchange. Nothing is collected to the driver and no state exceeds one
  * key's period range, so the plan survives an arbitrary key count. A
  * pathological single key spanning decades at fine grain explodes to that
  * key's period count — bound `every` accordingly (the reference's stream
  * model has the same property: state per key grows with retained windows,
  * cf. /root/reference/src/main/scala/com/iravid/fs2/kafka/streams/Tables.scala
  * fold-per-key semantics).
  */
object TimeSeries {

  /** One row per `key` per `every`-truncation between that key's first and
    * last observation; `value` = the per-period aggregate, forward-filled
    * from the most recent observed period when a period has no rows.
    *
    * @param every a `date_trunc` unit ("day", "hour", …) — the grid step
    * @param agg   per-period observed aggregate (must be deterministic)
    */
  def resampleFill(df: DataFrame, key: String, ts: String, every: String,
      agg: Column): DataFrame = {
    val obs = df
      .groupBy(col(key), date_trunc(every, col(ts)).as("period"))
      .agg(agg.as("v_obs"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("period")).as("p0"), max(col("period")).as("p1"))
      .select(col(key),
        explode(sequence(col("p0"), col("p1"),
          expr(s"interval 1 $every"))).as("period"))
    val w = Window.partitionBy(col(key)).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(key, "period"), "left")
      .select(col(key), col("period"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v_fill"))
  }

  // ---------------------------------------------------------------- q91
  // Daily resample of each user's latest event value with forward fill.
  // The emitted doubles are raw parquet values carried through MAX_BY and
  // the fill (no arithmetic), so they are bit-identical across engines —
  // no rounding needed.
  private def q91(s: SparkSession, dir: String): DataFrame =
    resampleFill(Fixtures.events(s, dir), "user_id", "ts", "day",
      max_by(col("value"), col("event_id")))
      .orderBy(col("user_id"), col("period"))

  private val q91Sql =
    """WITH obs AS (
      |  SELECT user_id, DATE_TRUNC('day', ts) AS period,
      |         MAX_BY(value, event_id) AS v_obs
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT user_id, MIN(period) p0, MAX(period) p1 FROM obs GROUP BY 1),
      |grid AS (
      |  SELECT user_id, UNNEST(generate_series(p0, p1, INTERVAL 1 DAY)) AS period
      |  FROM bounds)
      |SELECT g.user_id, CAST(g.period AS TIMESTAMP) AS period,
      |  (SELECT o.v_obs FROM obs o
      |   WHERE o.user_id = g.user_id AND o.period <= g.period
      |   ORDER BY o.period DESC LIMIT 1) AS v_fill
      |FROM grid g ORDER BY user_id, period""".stripMargin

  // ---------------------------------------------------------------- q95
  // Rolling 1-hour sum per user over EVENT TIME (RANGE frame on epoch
  // seconds, 3599 preceding → current row incl. peers) — the trailing-
  // window feature every behavioral / fraud / rate-limit pipeline derives.
  // A RANGE frame is bounded by the key's events inside one hour, so frame
  // state is O(events-per-key-per-hour) regardless of history length; the
  // one shuffle partitions by user. Decimal sum keeps the frame total
  // order-free; both engines floor the same epoch value.
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"))
      .rangeBetween(-3599L, 0L)
    Fixtures.events(s, dir)
      .withColumn("ts_sec", col("ts").cast("long"))
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w), 2).cast("double").as("roll_1h"))
      .orderBy(col("event_id"))
  }

  private val q95Sql =
    """SELECT event_id, user_id,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS roll_1h
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q96
  // Time-series similarity search via a PAA sketch (cf. PAPERS.md, "Time
  // Series Similarity Search for Streaming Data in Distributed Systems",
  // EDBT 2019): each user's activity series is compressed to 5-day
  // Piecewise-Aggregate segments, and the 10 users closest to user 1 by
  // squared euclidean distance over the sketch are returned. Distance on
  // the O(span/5)-dim sketch instead of the raw series is what makes
  // similarity search over billions of keys tractable — the sketch build
  // is one shuffle keyed by (user, segment), the query vector broadcasts
  // (segments of ONE user), and top-10 is a TakeOrdered, never a global
  // sort. All arithmetic is integer cents, so both engines agree exactly.
  private def q96(s: SparkSession, dir: String): DataFrame = {
    val daily = Fixtures.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("user_id"), col("d")).agg(sum(col("cents")).as("dc"))
    val dmin = daily.agg(min(col("d")).as("dmin"))
    val segs = daily.crossJoin(broadcast(dmin))
      .select(col("user_id"),
        floor(datediff(col("d"), col("dmin")) / lit(5.0)).cast("int").as("seg"),
        col("dc"))
      .groupBy(col("user_id"), col("seg")).agg(sum(col("dc")).as("v"))
    val smax = segs.agg(max(col("seg")).as("m"))
    val dense = segs.select(col("user_id")).distinct()
      .crossJoin(broadcast(smax))
      .select(col("user_id"), explode(sequence(lit(0), col("m"))).as("seg"))
      .join(segs, Seq("user_id", "seg"), "left")
      .select(col("user_id"), col("seg"), coalesce(col("v"), lit(0L)).as("v"))
    val qv = dense.filter(col("user_id") === 1)
      .select(col("seg").as("qseg"), col("v").as("qv"))
    dense.filter(col("user_id") =!= 1)
      .join(broadcast(qv), col("seg") === col("qseg"))
      .groupBy(col("user_id"))
      .agg(sum((col("v") - col("qv")) * (col("v") - col("qv"))).as("dist"))
      .orderBy(col("dist"), col("user_id"))
      .limit(10)
  }

  private val q96Sql =
    """WITH daily AS (
      |  SELECT user_id, DATE_TRUNC('day', ts) AS d,
      |         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS dc
      |  FROM events GROUP BY 1, 2),
      |dmin AS (SELECT MIN(d) AS dmin FROM daily),
      |segs AS (
      |  SELECT user_id,
      |         CAST(FLOOR(DATEDIFF('day', dmin.dmin, d) / 5.0) AS INT) AS seg,
      |         CAST(SUM(dc) AS BIGINT) AS v
      |  FROM daily, dmin GROUP BY 1, 2),
      |grid AS (
      |  SELECT u.user_id, s.seg
      |  FROM (SELECT DISTINCT user_id FROM segs) u,
      |       (SELECT UNNEST(generate_series(0, (SELECT MAX(seg) FROM segs))) AS seg) s),
      |dense AS (
      |  SELECT g.user_id, g.seg, COALESCE(segs.v, 0) AS v
      |  FROM grid g LEFT JOIN segs ON segs.user_id = g.user_id AND segs.seg = g.seg),
      |q AS (SELECT seg, v AS qv FROM dense WHERE user_id = 1)
      |SELECT d.user_id, CAST(SUM((d.v - q.qv) * (d.v - q.qv)) AS BIGINT) AS dist
      |FROM dense d JOIN q ON q.seg = d.seg
      |WHERE d.user_id <> 1
      |GROUP BY 1 ORDER BY dist, user_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q140
  // Rolling z-score anomaly detection, EXACT-INTEGER formulation: flag an
  // event whose value deviates > 3σ from the trailing AnomWin events of its
  // type (window EXCLUDES the current row, so an outlier cannot mask
  // itself). The test runs entirely in BIGINT cents:
  //   (n·x − S)² > 9·(n·Q − S²)   with S = Σc, Q = Σc² over the frame
  // — algebraically (x − μ)² > (3σ)² scaled by n², with no division and no
  // floating point, so both engines agree bit-for-bit (a float stddev over
  // a running frame would depend on each engine's accumulation algorithm —
  // the exact nondeterminism class this repo bans from outputs). Magnitude
  // audit: c ≤ 10⁶ cents keeps every product < 2⁶² at AnomWin ≤ 10³.
  //
  // Scale shape: the naive plan partitions the window by event_type alone —
  // cardinality = |event types| (a handful), so the whole events table
  // sorts inside that many tasks: a parallelism ceiling at 100×. The
  // shipped plan is the overlapping-chunk decomposition: a dense global
  // per-type position is computed scalably (per-(type, day) local
  // row_number — parallel — plus a catalog-sized cumulative day-offset
  // table broadcast back), rows are chunked by position so every chunk
  // holds exactly AnomChunk rows, each chunk is prefixed with a REPLICA of
  // the previous chunk's last AnomWin rows, and the ROWS frame runs per
  // (event_type, chunk) — parallelism = rows/AnomChunk, replication
  // overhead AnomWin/AnomChunk. Position-based chunking (not time-based)
  // guarantees the frame never needs more than the replica prefix, with no
  // assumptions about event density; replicas only ever FEED frames (their
  // own frame rows are dropped), so the result is row-identical to the
  // single-partition-per-type form (TimeSeriesSpec pins the equality, the
  // oracle keeps the naive window SQL).
  private[graft] val AnomWin = 50
  private[graft] val AnomChunk = 200 // ≥ AnomWin; at cluster scale this is
                                     // ~millions (state per task, not rows)

  /** Single-partition-per-type reference form — the oracle's plan shape;
    * the spec pins the chunked plan against it.
    */
  private[graft] def rollingAnomalyPerType(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-AnomWin, -1)
    events
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"), col("ts"))
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("q", sum(col("c") * col("c")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") === AnomWin &&
        (col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))
          > lit(9L) * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_id"), col("event_type"), col("c").as("cents"),
        ((col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))).as("dev2"),
        (lit(9L) * (col("n") * col("q") - col("s") * col("s"))).as("bound"))
      .orderBy(col("event_id"))
  }

  /** Chunk-parallel rolling anomaly (see q140 scaladoc). Exact: every own
    * row's trailing-AnomWin frame is fully contained in its chunk's replica
    * prefix + own predecessors, because chunks are position-dense.
    */
  private[graft] def rollingAnomaly(events: DataFrame, chunkRows: Int): DataFrame = {
    require(chunkRows >= AnomWin,
      s"chunk must cover the frame: $chunkRows < $AnomWin")
    val e = events
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"), col("ts"))
      .withColumn("tb", to_date(col("ts"))) // tb = date(ts) ⇒ ordering by
                                            // (tb, ts) ≡ ordering by ts
    val wLocal = Window.partitionBy(col("event_type"), col("tb"))
      .orderBy(col("ts"), col("event_id"))
    // explicit-count widening on the window keys: the window's own exchange
    // is byte-sized by AQE (events ≈ a few MB at fixture scale → 1
    // partition), which would serialize the per-(type, day) sort the chunk
    // decomposition exists to parallelize; the explicit repartition
    // satisfies the window's required clustering, so no second exchange is
    // added (see Engine.widen)
    val local = graft.Engine.widen(e, col("event_type"), col("tb"))
      .withColumn("lr", row_number().over(wLocal).cast("long"))
    // cumulative rows before each (type, day): |types|·|days| rows — a
    // catalog-sized table, broadcast back to make positions global
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy(col("event_type"), col("tb"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("event_type"), col("tb"), col("off"))
    val g = local.join(broadcast(offs), Seq("event_type", "tb"))
      .withColumn("gpos", col("off") + col("lr"))
      .withColumn("chunk", floor((col("gpos") - 1) / chunkRows))
    // last AnomWin rows of each chunk also feed the NEXT chunk's frames
    val reps = g.filter(pmod(col("gpos") - 1, lit(chunkRows)) >= chunkRows - AnomWin)
      .withColumn("chunk", col("chunk") + 1)
    val wFrame = Window.partitionBy(col("event_type"), col("chunk"))
      .orderBy(col("gpos")).rowsBetween(-AnomWin, -1)
    // same explicit widening for the chunked frame window (the whole point
    // of the chunk decomposition is that this partitioning is wide)
    graft.Engine.widen(
        g.withColumn("replica", lit(false))
          .unionByName(reps.withColumn("replica", lit(true))),
        col("event_type"), col("chunk"))
      .withColumn("s", sum(col("c")).over(wFrame))
      .withColumn("q", sum(col("c") * col("c")).over(wFrame))
      .withColumn("n", count(lit(1)).over(wFrame))
      .filter(!col("replica") && col("n") === AnomWin &&
        (col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))
          > lit(9L) * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_id"), col("event_type"), col("c").as("cents"),
        ((col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))).as("dev2"),
        (lit(9L) * (col("n") * col("q") - col("s") * col("s"))).as("bound"))
      .orderBy(col("event_id"))
  }

  private def q140(s: SparkSession, dir: String): DataFrame =
    rollingAnomaly(Fixtures.events(s, dir), AnomChunk)

  private val q140Sql =
    s"""WITH e AS (
       |  SELECT event_id, event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c, ts
       |  FROM events),
       |w AS (
       |  SELECT event_id, event_type, c,
       |    SUM(c) OVER win AS s, SUM(c * c) OVER win AS q, COUNT(*) OVER win AS n
       |  FROM e WINDOW win AS (
       |    PARTITION BY event_type ORDER BY ts, event_id
       |    ROWS BETWEEN $AnomWin PRECEDING AND 1 PRECEDING))
       |SELECT event_id, event_type, c AS cents,
       |  CAST((n * c - s) * (n * c - s) AS BIGINT) AS dev2,
       |  CAST(9 * (n * q - s * s) AS BIGINT) AS bound
       |FROM w
       |WHERE n = $AnomWin AND (n * c - s) * (n * c - s) > 9 * (n * q - s * s)
       |ORDER BY event_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q91_resample_ffill", q91, Some(q91Sql)),
    GraftQuery("q95_rolling_window", q95, Some(q95Sql)),
    GraftQuery("q96_series_paa_knn", q96, Some(q96Sql)),
    GraftQuery("q140_rolling_anomaly", q140, Some(q140Sql)))
}
