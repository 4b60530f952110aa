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

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q91_resample_ffill", q91, Some(q91Sql)),
    GraftQuery("q95_rolling_window", q95, Some(q95Sql)))
}
