package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded (interval / range) join — [EXT]: all (left, right) pairs sharing
  * an equi-key whose event times fall within a fixed band of each other.
  * The batch analogue of Structured Streaming's stream-stream interval join
  * (`leftTime BETWEEN rightTime - lo AND rightTime + hi`), and the shape
  * behind attribution windows ("purchases within 2 h after a click").
  *
  * Scale design: Spark plans a raw `l.key = r.key AND abs(l.t - r.t) <= B`
  * as a sort-merge join on the key with the band as a post-join filter —
  * for a hot key with n left × m right rows that materializes n·m
  * candidate pairs regardless of the band. [[bandJoin]] instead buckets
  * both sides by `floor(t / B)` and equi-joins on (key, bucket), with the
  * right side exploded to its three adjacent buckets, so candidate pairs
  * are bounded by rows that are actually within ~2B of each other — the
  * same banding idea as the LSH dedup joins (Dedup.scala) applied to time.
  * Replication factor is a fixed 3× on one side; no driver-side state, no
  * broadcast of an unbounded side. With `keyCol = lit(1)` (no key) it
  * degrades gracefully to a pure time-bucket join, which is still bounded —
  * a keyless theta band join in Spark would be a broadcast nested loop.
  *
  * Each qualifying pair joins exactly once: the left row carries its single
  * bucket value and the right row's three exploded buckets are distinct, so
  * at most one matches (spec-pinned against the naive theta join).
  *
  * Reference scope: the reference's joins are stream-table enrichment only
  * (`/root/reference/src/main/scala/com/iravid/fs2/kafka/streams/package.scala`);
  * band joins are part of the [EXT] analytics surface.
  */
object RangeJoin {

  /** Pairs with `|unix_micros(l.timeL) - unix_micros(r.timeR)| <= bandMicros`
    * and equal `keyCol`. Non-key/time columns of the two sides must not
    * collide (rename before calling, as with [[AsOfJoin.asOf]]).
    */
  /** Exact floor division on longs. `floor(a / b)` would divide in DOUBLE,
    * whose 53-bit mantissa can round a quotient onto the wrong integer for
    * |a| ≳ 9.0e15 (µs timestamps past ~year 2255) — an off-by-one bucket
    * silently drops in-band pairs. `(a - pmod(a,b)) div b` stays integral:
    * the numerator is exactly divisible, so truncating `div` == floor.
    */
  private def floorDivCol(a: org.apache.spark.sql.Column, b: Long) = {
    val num = a - pmod(a, lit(b))
    call_function("div", num, lit(b))
  }

  def bandJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, bandMicros: Long): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    val lb = left.withColumn("__b",
      floorDivCol(unix_micros(col(leftTime)), bandMicros))
    val rBucket = floorDivCol(unix_micros(col(rightTime)), bandMicros)
    val rb = right.withColumn("__b",
      explode(array(rBucket - 1, rBucket, rBucket + 1)))
    lb.join(rb, Seq(keyCol, "__b"))
      .filter(abs(unix_micros(col(rightTime)) - unix_micros(col(leftTime)))
        <= lit(bandMicros))
      .drop("__b")
  }

  // ---------------------------------------------------------------- q65
  // Attribution: purchases by the same user within 2 hours AFTER a click.
  // Forward-only semantics are the symmetric band join plus a sign filter
  // (delta in [0, band]) — the bucketing stays identical. delta_us is an
  // exact integer in both engines (fixture timestamps are µs-aligned).
  private val BandUs = 2L * 3600 * 1000 * 1000
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val e = Fixtures.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val delta = (unix_micros(col("pts")) - unix_micros(col("cts"))).cast("long")
    bandJoin(clicks, purchases, "user_id", "cts", "pts", BandUs)
      .filter(delta >= 0)
      .select(col("click_id"), col("purchase_id"), delta.as("delta_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  private val q65Sql =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |       date_diff('microsecond', c.ts, p.ts) AS delta_us
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
      |ORDER BY click_id, purchase_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q65_interval_join", q65, Some(q65Sql)))
}
