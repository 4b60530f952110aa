package graft.sinks

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffled storage: aggregations and self-joins on the
  * bucket key must plan WITHOUT a shuffle exchange (the whole point of
  * paying the shuffle at write time).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aggregation on the bucket key plans without an exchange") {
    Sinks.writeBucketed(
      Fixtures.events(spark, TestSpark.sf0001)
        .select("event_id", "user_id", "event_type", "value"),
      "events_bucketed", Seq("user_id"), numBuckets = 8)
    val agg = spark.table("events_bucketed")
      .groupBy(col("user_id"))
      .agg(max_by(col("value"), col("event_id")).as("last_value"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg should not shuffle:\n${plan.take(1200)}")
    // and the answer matches the unbucketed path
    val a = agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Fixtures.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id")).agg(max_by(col("value"), col("event_id")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("self-join on the bucket key plans without a shuffle exchange") {
    val t1 = spark.table("events_bucketed").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n1"))
    val t2 = spark.table("events_bucketed").groupBy(col("user_id"))
      .agg(sum(col("value")).as("s2"))
    val j = t1.join(t2, "user_id")
    val plan = j.queryExecution.executedPlan.toString
    // no SHUFFLE exchange — a BroadcastExchange is fine (it moves one tiny
    // side, not the bucketed data)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-co-located join should not shuffle:\n${plan.take(1200)}")
    assert(j.count() == t1.count())
  }
}
