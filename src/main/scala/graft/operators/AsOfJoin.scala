package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — [EXT] from the capability matrix (SURVEY
  * §2.B): for each left row, attach the latest right row with
  * `right.time <= left.time` per key.
  *
  * Scale design: NOT a range join (which Spark plans as a quadratic
  * nested-loop per key). Both sides are unioned, hash-partitioned by key,
  * sorted once by (time, side), and swept with `last(_, ignoreNulls)` over
  * an unbounded-preceding frame — one shuffle + one sort, O(n log n), the
  * same shape a native as-of operator (e.g. a time-series engine's) uses
  * internally. Ties at equal time resolve right-before-left (`<=`
  * semantics) and by right offset for determinism.
  */
object AsOfJoin {

  /** Generic as-of join. Right payload columns must not collide with left
    * columns; both sides need `keyCol` and `timeCol`.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String): DataFrame = {
    val leftOnly = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val rightOnly = right.columns.filterNot(c => c == keyCol || c == timeCol)
    val l2 = rightOnly.foldLeft(left.withColumn("__side", lit(1))) {
      case (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r2 = leftOnly.foldLeft(right.withColumn("__side", lit(0))) {
      case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l2.unionByName(r2)
    // right rows (side 0) sort before left rows at equal time → `<=`;
    // rightOnly.head in the ordering makes equal-time right rows resolve
    // deterministically (greatest offset wins, matching max_by semantics).
    val ord: Seq[Column] = col(timeCol) +: col("__side") +:
      rightOnly.headOption.map(col).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightOnly.foldLeft(unioned) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    matched.filter(col("__side") === 1).drop("__side")
  }

  // ---------------------------------------------------------------- q31
  // For each click, the user's latest purchase at-or-before the click.
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val e = Fixtures.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    asOf(clicks, purchases, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
      .orderBy(col("event_id"))
  }

  // DuckDB has a native ASOF JOIN — the reference oracle. Determinism note:
  // event timestamps are unique per user in the fixtures (µs-aligned ns),
  // so the greatest-ts₂ match is unique.
  private val q31Sql =
    """SELECT c.event_id, c.user_id, p.purchase_id,
      |       ROUND(p.purchase_value, 2) AS purchase_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      |                FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q31_asof_join", q31, Some(q31Sql)))
}
