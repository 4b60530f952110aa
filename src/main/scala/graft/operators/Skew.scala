package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (100-TB posture, SURVEY §7.1).
  *
  * AQE's skew-join splitting covers joins automatically; aggregations over
  * a hot grouping key still funnel that key's entire partition through one
  * task. [[saltedAgg]] is the classic two-phase fix: aggregate on
  * (key, salt) first — spreading a hot key over `saltBuckets` tasks — then
  * combine the partials. Only decomposable aggregates (sum/count/min/max
  * shapes) qualify; the caller provides both phases.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partials combine functions for phase 1 (per key+salt)
    * @param finals   re-combine functions for phase 2 (per key), applied to
    *                 the phase-1 column names
    */
  /** Deterministic per-row salt: a hash of the full row. Task-identity salts
    * (spark_partition_id + monotonically_increasing_id) are NONdeterministic
    * across stage recomputation — after a shuffle-fetch failure a re-run map
    * task can assign different salts, and reducers that already fetched the
    * old attempt then double-count or drop rows. A row hash recomputes
    * identically. Identical rows share a salt, which is harmless for
    * decomposable aggregates and joins (same result either way).
    */
  private def rowSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets.toLong)).cast("int")

  def saltedAgg(df: DataFrame, keyCol: String, saltBuckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltBuckets))
    val phase1 = salted.groupBy(col(keyCol), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(col(keyCol)).agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: the hot left keys spread over
    * `saltBuckets` shuffle partitions; the (smaller, unskewed) right side is
    * replicated once per salt bucket so every (key, salt) pair still finds
    * its match. Semantics are exactly `left.join(right, key)` (inner).
    *
    * This is the manual fallback for engines/paths where AQE's runtime
    * skew-join splitting can't see the skew (e.g. a skewed key feeding a
    * sort-merge join straight from a bucketed table with no runtime stats).
    * Right-side replication costs |right| × saltBuckets — use only when the
    * right side is small relative to the hot key's row count.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", rowSalt(left, saltBuckets))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(keyCol, "__salt"))
      .drop("__salt")
  }
}
