package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Hot-key-aware salted equi-join: only keys with ≥ `hotThreshold` probe
    * rows are salted, so replication cost is `saltFactor ×` the HOT build
    * rows instead of [[saltedJoin]]'s `saltBuckets × |right|`. The shape
    * that survives 100 TB:
    *
    *   1. one map-side-combinable count finds hot probe keys — the hot set
    *      is bounded by |probe| / hotThreshold keys and broadcasts;
    *   2. probe rows of hot keys get a content-derived salt (see [[rowSalt]]
    *      — recompute-deterministic, no RNG in the lineage); cold rows salt 0;
    *   3. build rows of hot keys explode to all `saltFactor` salts, cold
    *      rows keep the single salt 0 — every probe row still meets every
    *      matching build row exactly once;
    *   4. equi-join on (key, salt).
    *
    * The result set is provably identical to `probe ⋈ build` (inner):
    * salting is pure physical re-partitioning. SkewSpec pins equality on
    * power-law data plus the replication accounting; the q125 oracle is the
    * plain SQL join. Non-key columns of the two sides must not collide.
    */
  def hotSaltedJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      saltFactor: Int, hotThreshold: Long,
      disambiguator: Option[Column] = None): DataFrame = {
    val (salted, replicated) =
      hotSaltedSides(probe, build, keyCol, saltFactor, hotThreshold, disambiguator)
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** The two salted inputs of [[hotSaltedJoin]], exposed so the replication
    * accounting is testable directly (the JOIN result is invariant even
    * under a replication bug — cold probe rows only ever match salt 0 — so
    * SkewSpec pins |replicated| = |cold build| + saltFactor·|hot build| on
    * this frame, not on the join output).
    */
  private[graft] def hotSaltedSides(probe: DataFrame, build: DataFrame,
      keyCol: String, saltFactor: Int, hotThreshold: Long,
      disambiguator: Option[Column] = None): (DataFrame, DataFrame) = {
    require(saltFactor > 1, "saltFactor must be > 1")
    require(hotThreshold > 0, "hotThreshold must be > 0")
    val hot = probe.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(col(keyCol), lit(true).as("__hot"))
    val isHot = col("__hot").isNotNull
    val salted = probe.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__salt",
        when(isHot, rowSalt(probe, saltFactor, disambiguator)).otherwise(lit(0)))
      .drop("__hot")
    val replicated = build.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__salt",
        explode(when(isHot, sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    (salted, replicated)
  }

  // ---------------------------------------------------------------- q125
  // Event enrichment under user skew: events ⋈ customer on user_id — the
  // q5 enrichment re-planned through the hot-key salted path. The oracle is
  // the PLAIN SQL join: the salted plan must be result-identical, which is
  // exactly the property that makes salting safe to apply mechanically at
  // 100 TB. hotThreshold is sized so the power-law fixture exercises both
  // the salted and the cold path; the output is invariant either way.
  private val SaltFactor = 8
  private val HotThreshold = 64L

  private def q125(s: SparkSession, dir: String): DataFrame = {
    val e = Fixtures.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val c = Fixtures.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    hotSaltedJoin(e, c, "user_id", SaltFactor, HotThreshold)
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        col("event_type"))
      .orderBy(col("event_id"))
  }

  private val q125Sql =
    """SELECT e.event_id, e.user_id, c.c_mktsegment, e.event_type
      |FROM events e JOIN customer c ON c.c_custkey = e.user_id
      |ORDER BY e.event_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q125_skew_join", q125, Some(q125Sql)))
}
