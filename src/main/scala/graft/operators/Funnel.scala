package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over the event stream —
  * the two classic event-sequence rollups a product pipeline runs on the
  * same keyed event data the reference consumes (its per-key fold surface,
  * `/root/reference/src/main/scala/com/iravid/fs2/kafka/streams/
  * Tables.scala`, is the per-user state this generalizes).
  *
  * Both are expressed as staged aggregations, NOT per-user sequence scans:
  *
  *  - funnel: stage k is `events(stage_k) ⨝ reached(k-1)` filtered to
  *    strictly-later timestamps, then `min(ts)` per user. Each stage is one
  *    equi-join on user_id plus a partial-aggregated min — at 100 TB the
  *    stage frontier (users who reached stage k) is a small fraction of the
  *    event volume, so each successive join shrinks.
  *  - retention: distinct (user, week) pairs, per-user min week = cohort,
  *    then one grouped count — two shuffles total regardless of how many
  *    retention offsets are reported.
  *
  * Timestamp comparisons: the Spark side sees µs-truncated timestamps
  * ([[graft.Fixtures.events]]); the oracle truncates ns→µs up front
  * (`CAST(ts AS TIMESTAMP)`) so the strict `>` comparisons agree at the
  * boundary by construction, not by luck.
  */
object Funnel {

  /** Users reaching each stage of an ordered event-type funnel: a user
    * counts for stage k if they have a stage-k event strictly after their
    * earliest qualifying stage-(k-1) event (earliest-completion semantics).
    * Returns `(stage, users)` with stages index-prefixed so lexicographic
    * order is funnel order.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // frontier(k): user_id + earliest completion time of stages 0..k
    val frontiers = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val hits = events.filter(col("event_type") === stage)
        val reached = prev match {
          case None => hits
          case Some(p) => hits.join(p.select(col("user_id"), col("t").as("tprev")), "user_id")
            .filter(col("ts") > col("tprev"))
        }
        Some(reached.groupBy("user_id").agg(min(col("ts")).as("t")))
    }.flatten
    frontiers.zip(stages).zipWithIndex
      .map { case ((f, stage), i) =>
        f.select(lit(s"${i + 1}_$stage").as("stage"), col("user_id"))
      }
      .reduce(_.unionByName(_))
      .groupBy("stage").agg(count(lit(1)).as("users"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: cohort = week index (7-day buckets from
    * `epoch`) of the user's first event; one row per (cohort, k) with the
    * number of cohort users active k weeks later, k ≤ maxOffset.
    */
  def retention(events: DataFrame, epoch: String, maxOffset: Int): DataFrame = {
    val weeks = events
      .select(col("user_id"),
        expr(s"cast(datediff(cast(ts as date), date'$epoch') div 7 as bigint)").as("wk"))
      .distinct()
    val cohorts = weeks.groupBy("user_id").agg(min("wk").as("cohort"))
    weeks.join(cohorts, "user_id")
      .select(col("cohort"), (col("wk") - col("cohort")).as("k"))
      .filter(col("k") <= maxOffset)
      // (user, wk) pairs are already distinct ⇒ count(*) IS distinct users
      .groupBy("cohort", "k").agg(count(lit(1)).as("users"))
      .orderBy("cohort", "k")
  }

  // ---------------------------------------------------------------- q118
  private def q118(s: SparkSession, dir: String): DataFrame =
    funnel(Fixtures.events(s, dir), Seq("view", "click", "purchase"))

  private val q118Sql =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s1 ON s1.user_id = e.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s2 ON s2.user_id = e.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id),
      |stages AS (
      |  SELECT '1_view' AS stage, user_id FROM s1
      |  UNION ALL SELECT '2_click', user_id FROM s2
      |  UNION ALL SELECT '3_purchase', user_id FROM s3)
      |SELECT stage, CAST(count(*) AS BIGINT) AS users
      |FROM stages GROUP BY stage ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q119
  private def q119(s: SparkSession, dir: String): DataFrame =
    retention(Fixtures.events(s, dir), epoch = "2024-01-01", maxOffset = 3)

  private val q119Sql =
    """WITH wk AS (
      |  SELECT DISTINCT user_id,
      |         CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS wk
      |  FROM events),
      |cohorts AS (SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id)
      |SELECT c.cohort, w.wk - c.cohort AS k, CAST(count(*) AS BIGINT) AS users
      |FROM wk w JOIN cohorts c ON w.user_id = c.user_id
      |WHERE w.wk - c.cohort <= 3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q118_funnel", q118, Some(q118Sql)),
    GraftQuery("q119_retention", q119, Some(q119Sql)))
}
