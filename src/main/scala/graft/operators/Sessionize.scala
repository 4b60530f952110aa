package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Session windows (gap-based sessionization) — capability-matrix item the
  * reference lacks entirely (no event-time at all, SURVEY §2.B).
  *
  * Batch form uses Spark's native `session_window` (plans as a single
  * aggregation over gap-merged windows; in streaming the same expression
  * runs stateful with watermark eviction). The oracle reproduces the
  * semantics with the classic gaps-and-islands construction.
  */
object Sessionize {

  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sv"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("sv"))

  // ---------------------------------------------------------------- q32
  private def q32(s: SparkSession, dir: String): DataFrame =
    sessions(Fixtures.events(s, dir), "10 minutes")
      .orderBy(col("user_id"), col("session_start"))

  // Gaps-and-islands: new session when the gap to the previous event is
  // >= 10 min (session_window's end bound is exclusive). MIN(ts) = session
  // start (cast ns → µs to match Spark's timestamps).
  private val q32Sql =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sids AS (
      |  SELECT user_id, ts, value,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sv
      |FROM sids GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q36
  // Sliding windows (2 h wide, 1 h slide): each event lands in two windows;
  // Spark's `window()` plans this as a generate (expand) + one hash agg —
  // a narrow op before the aggregation, no extra shuffle.
  private def q36(s: SparkSession, dir: String): DataFrame =
    Fixtures.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sv"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("sv"))
      .orderBy(col("wstart"), col("event_type"))

  private val q36Sql =
    """WITH w AS (
      |  SELECT event_type, value,
      |    unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS wstart
      |  FROM events)
      |SELECT CAST(wstart AS TIMESTAMP) AS wstart, event_type, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sv
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q32_session_window", q32, Some(q32Sql)),
    GraftQuery("q36_sliding_window", q36, Some(q36Sql)))
}
