package graft.operators

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation must equal the direct aggregation — the
  * skew fix can never change results (sum/count are decomposable).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedAgg(sum, count) equals direct groupBy agg") {
    val li = Fixtures.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"),
        col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("q"))
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(li, "l_returnflag", saltBuckets = 16,
      partials = Seq(sum(col("q")).as("psq"), count(lit(1)).as("pn")),
      finals = Seq(sum(col("psq")).as("sq"), sum(col("pn")).as("n")))
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (sq, n)) =>
      assert(salted(k)._1.compareTo(sq) == 0 && salted(k)._2 == n, s"key $k")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (the automatic path saltedJoin backstops)") {
    // A hot key owning half the left side funnels into one shuffle
    // partition; with thresholds scaled down to fixture bytes, AQE's
    // OptimizeSkewedJoin must split it (skew=true on the SMJ node).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(100000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 500L).as("k"),
        concat(lit("p"), lpad(col("id").cast("string"), 64, "x")).as("payload"))
      val right = spark.range(500).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // collect() on THIS DataFrame: executedPlan must come from the same
      // QueryExecution that ran (count() would plan a separate query and
      // leave this one isFinalPlan=false)
      assert(joined.collect().length === 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedJoin equals plain inner join (hot-key spread, right replicated)") {
    val orders = Fixtures.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val cust = Fixtures.customer(spark, TestSpark.sf0001)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(2))
    val direct = orders.join(cust, "o_custkey")
      .select(col("o_orderkey"), col("c_name"), col("o_orderstatus"))
      .collect().map(key).toSet
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", saltBuckets = 8)
      .select(col("o_orderkey"), col("c_name"), col("o_orderstatus"))
      .collect().map(key).toSet
    assert(salted == direct)
  }

  test("hotSaltedJoin equals plain inner join on power-law data; only hot build rows replicate") {
    // one monster key (half the probe side), a mid key above threshold, and
    // 500 cold keys — duplicates included so multiset equality is exercised
    val probe = spark.range(20000).select(
      when(col("id") % 2 === 0, 0L)
        .when(col("id") % 5 === 1, 1L)
        .otherwise(col("id") % 500L + 2L).as("k"),
      (col("id") % 1000L).as("payload"))
    val build = spark.range(502).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getString(2))
    val direct = probe.join(build, "k")
      .select(col("k"), col("payload"), col("name"))
      .collect().map(key)
    val salted = Skew.hotSaltedJoin(probe, build, "k",
        saltFactor = 8, hotThreshold = 1000L)
      .select(col("k"), col("payload"), col("name"))
      .collect().map(key)
    // multiset equality, not set: replication bugs show up as duplicates
    assert(salted.groupBy(identity).view.mapValues(_.length).toMap ===
      direct.groupBy(identity).view.mapValues(_.length).toMap)
    // hot probe rows really spread: the operator's content-derived salt
    // (pmod(xxhash64(row), saltFactor)) lands the monster key's rows in
    // most of the 8 buckets on this data
    val salts = probe.filter(col("k") === 0L)
      .select(pmod(xxhash64(col("k"), col("payload")), lit(8L)).as("s"))
      .distinct().count()
    assert(salts >= 6, s"hot key spread over only $salts of 8 salt buckets")
    // replication accounting pinned on the REPLICATED FRAME itself — the
    // join output is invariant even if cold build rows were wrongly
    // replicated (cold probe rows only match salt 0), so count the frame:
    // 2 hot keys (0 and 1) replicate 8×, the 500 cold build rows once
    val (_, replicated) = Skew.hotSaltedSides(probe, build, "k",
      saltFactor = 8, hotThreshold = 1000L)
    assert(replicated.count() === 500 + 2 * 8)
    // and a cold-only probe must replicate nothing at all
    val coldProbe = probe.filter(col("k") >= 2)
    val (_, coldRepl) = Skew.hotSaltedSides(coldProbe, build, "k",
      saltFactor = 8, hotThreshold = 1000L)
    assert(coldRepl.count() === build.count())
  }
}
