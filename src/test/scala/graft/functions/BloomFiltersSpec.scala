package graft.functions

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("no false negatives: every build-side key passes mightContain") {
    val cust = Fixtures.customer(spark, dir)
      .filter(col("c_nationkey") === 7).select(col("c_custkey"))
    val bytes = BloomFilters.build(cust, col("c_custkey"), 10000L, 80000L)
    val misses = cust.filter(!BloomFilters.mightContain(bytes, col("c_custkey"))).count()
    assert(misses === 0L, "a bloom filter must never reject a true member")
  }

  test("bloom semiJoin returns exactly the plain semi-join answer") {
    val cust = Fixtures.customer(spark, dir)
      .filter(col("c_nationkey") === 7).select(col("c_custkey"))
    val orders = Fixtures.orders(spark, dir)
    val viaBloom = BloomFilters.semiJoin(
      orders, col("o_custkey"), cust, col("c_custkey"), 10000L, 80000L)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val exact = orders.join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(viaBloom.length === exact.length)
    assert(viaBloom === exact)
  }

  test("the prefilter prunes most non-matching rows before the confirm join") {
    val cust = Fixtures.customer(spark, dir)
      .filter(col("c_nationkey") === 7).select(col("c_custkey"))
    val bytes = BloomFilters.build(cust, col("c_custkey"), 10000L, 80000L)
    val orders = Fixtures.orders(spark, dir)
    val total = orders.count()
    val trueMatches = orders
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val prefiltered = orders
      .filter(BloomFilters.mightContain(bytes, col("o_custkey"))).count()
    assert(prefiltered >= trueMatches, "prefilter keeps all true matches")
    // sized at ~8 bits/key the false-positive rate is ~2%; even 10× slack
    // proves the big side shrank by an order of magnitude pre-shuffle
    val fpBudget = trueMatches + math.max(10, (0.2 * total).toLong)
    assert(prefiltered <= fpBudget,
      s"prefilter passed $prefiltered of $total rows ($trueMatches true) — not pruning")
  }

  test("might_contain is SQL-callable via GraftExtensions") {
    val cust = Fixtures.customer(spark, dir)
      .filter(col("c_nationkey") === 7).select(col("c_custkey"))
    val bytes = BloomFilters.build(cust, col("c_custkey"), 10000L, 80000L)
    val df = Fixtures.orders(spark, dir)
      .filter(call_function("might_contain", lit(bytes), xxhash64(col("o_custkey"))))
    assert(df.count() > 0)
  }
}
