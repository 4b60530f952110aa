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
    *
    * `forward = false` (default): latest right row with time ≤ left time.
    * `forward = true`: EARLIEST right row with time ≥ left time — the same
    * single-shuffle sweep run over the reversed time order, so the scale
    * properties are identical (never a per-key range nested loop).
    *
    * All right payload columns come from the SAME matched right row: the
    * sweep carries one `last(struct(payload*), ignoreNulls)` rather than a
    * per-column `last`, so a legitimately-NULL payload field in the matched
    * row stays NULL instead of being stitched from an older right row.
    * Equal-time right rows tie-break deterministically by the ORDERABLE
    * payload fields in struct order (backward: greatest wins; forward:
    * smallest wins); non-orderable payload types (maps) are carried in the
    * sweep struct but excluded from the sort key — with no orderable
    * payload field at all, equal-time right duplicates resolve arbitrarily.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      forward: Boolean = false): DataFrame = {
    val leftOnly = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val rightOnly = right.columns.filterNot(c => c == keyCol || c == timeCol)
    if (rightOnly.isEmpty) return left
    val payloadType = org.apache.spark.sql.types.StructType(
      rightOnly.map(c => right.schema(c).copy(name = c)))
    val l2 = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
    val r2 = leftOnly.foldLeft(
      right.withColumn("__side", lit(0))
        .withColumn("__p", struct(rightOnly.map(col): _*))
        .drop(rightOnly: _*)) {
      case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l2.unionByName(r2)
    // Right rows (side 0) sort before left rows at equal time → inclusive
    // semantics in both directions. The struct tie-break keeps equal-time
    // right rows deterministic: backward = greatest payload wins (max_by),
    // forward = smallest wins — in the DESC sweep the smallest must sort
    // LAST, hence .desc on the payload struct too. Left rows carry a NULL
    // struct, which never competes (ignoreNulls + differing __side). The
    // sort key uses only ORDERABLE payload fields — a map-typed payload
    // column in orderBy would throw at planning time.
    val orderableFields = rightOnly.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    val tieBreak: Seq[Column] =
      if (orderableFields.isEmpty) Nil
      else {
        val key = struct(orderableFields.map(c => col("__p").getField(c)): _*)
        Seq(if (forward) key.desc else key.asc)
      }
    val ord: Seq[Column] =
      if (forward) Seq(col(timeCol).desc, col("__side")) ++ tieBreak
      else Seq(col(timeCol), col("__side")) ++ tieBreak
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val out = rightOnly.foldLeft(matched.filter(col("__side") === 1)) {
      case (df, c) => df.withColumn(c, col("__p").getField(c))
    }
    out.drop("__side", "__p")
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

  // ---------------------------------------------------------------- q60
  // Forward as-of: for each click, the user's EARLIEST purchase at-or-after
  // the click — the "next conversion" question. Same sweep, reversed order.
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val e = Fixtures.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    asOf(clicks, purchases, "user_id", "ts", forward = true)
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
      .orderBy(col("event_id"))
  }

  // DuckDB's ASOF JOIN matches the nearest row under any inequality; `>=`
  // gives the forward direction.
  private val q60Sql =
    """SELECT c.event_id, c.user_id, p.purchase_id,
      |       ROUND(p.purchase_value, 2) AS purchase_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      |                FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND p.ts >= c.ts
      |ORDER BY c.event_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q31_asof_join", q31, Some(q31Sql)),
    GraftQuery("q60_asof_forward", q60, Some(q60Sql)))
}
