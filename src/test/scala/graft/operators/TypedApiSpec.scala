package graft.operators

import graft.{Fixtures, TestSpark}
import graft.streaming.Event
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset surface: the custom Aggregator (UDAF) and `joinWith` (the
  * reference's enrichment-join signature, `joinWith[A, K, V]` in
  * ReadOnlyTableSpec.scala:77-79) must agree with the untyped plans.
  */
class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value").as[Event]
  }

  test("typed LatestAggregator equals the max_by materialization") {
    import spark.implicits._
    val typed = events.groupByKey(_.user_id)
      .agg(LatestAggregator.toColumn.name("latest"))
      .collect()
      .map { case (k, (et, v, id)) => k -> ((et, v, id)) }.toMap
    val untyped = LatestByKey.materialize(
      events.toDF(), "user_id", "event_id", Seq("event_type", "value"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(typed == untyped)
  }

  test("typed joinWith enrichment matches the untyped left join") {
    import spark.implicits._
    case class Latest(user_id: Long, last_value: Double)
    val table = LatestByKey.table(spark, TestSpark.sf0001).scan
      .select(col("user_id"), col("last_value")).as[(Long, Double)]
    val clicks = events.filter(_.event_type == "click")
    val joined = clicks.joinWith(table, clicks("user_id") === table("user_id"), "left")
      .collect()
      .map { case (e, t) => e.event_id -> Option(t).map(_._2) }.toMap
    val untyped = clicks.toDF().join(
      LatestByKey.table(spark, TestSpark.sf0001).scan
        .select(col("user_id"), col("last_value")), Seq("user_id"), "left")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("last_value"))) None
         else Some(r.getAs[Double]("last_value"))))
      .toMap
    assert(joined == untyped)
  }
}
