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
  /** Deterministic per-row salt: a hash of the full row (plus an optional
    * caller-supplied disambiguator). Task-identity salts
    * (spark_partition_id + monotonically_increasing_id) are NONdeterministic
    * across stage recomputation — after a shuffle-fetch failure a re-run map
    * task can assign different salts, and reducers that already fetched the
    * old attempt then double-count or drop rows. A row hash recomputes
    * identically.
    *
    * CAVEAT: identical rows share a salt, so a hot key whose rows are exact
    * duplicates (common in heavy-hitter counting) collapses into ONE
    * (key, salt) bucket and is NOT spread. Results stay correct, but the
    * skew mitigation is defeated. When the input has a stable per-row
    * ordinal (a Kafka offset, an event id, a file row number), pass it as
    * `disambiguator` — it is mixed into the hash so duplicate rows land in
    * different buckets while staying recompute-deterministic.
    */
  private def rowSalt(df: DataFrame, saltBuckets: Int,
      disambiguator: Option[Column]): Column =
    pmod(xxhash64(df.columns.map(col) ++ disambiguator: _*),
      lit(saltBuckets.toLong)).cast("int")

  def saltedAgg(df: DataFrame, keyCol: String, saltBuckets: Int,
      partials: Seq[Column], finals: Seq[Column],
      disambiguator: Option[Column] = None): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltBuckets, disambiguator))
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
      saltBuckets: Int, disambiguator: Option[Column] = None): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      rowSalt(left, saltBuckets, disambiguator))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(keyCol, "__salt"))
      .drop("__salt")
  }
}
