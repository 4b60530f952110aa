package graft.operators

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def sides() = {
    val e = Fixtures.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    (clicks, purchases)
  }

  test("bandJoin equals the naive theta band join, each pair exactly once") {
    val (clicks, purchases) = sides()
    val band = 2L * 3600 * 1000 * 1000 // 2h in µs
    val banded = RangeJoin.bandJoin(clicks, purchases, "user_id", "cts", "pts", band)
      .select(col("click_id"), col("purchase_id"))
    val naive = clicks.join(purchases, Seq("user_id"))
      .filter(abs(unix_micros(col("pts")) - unix_micros(col("cts"))) <= band)
      .select(col("click_id"), col("purchase_id"))
    assert(banded.count() > 0, "fixture band should produce pairs")
    assert(banded.count() === naive.count)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("bucket replication never duplicates a pair at the band boundary") {
    val (clicks, purchases) = sides()
    val band = 24L * 3600 * 1000 * 1000 // wide band → many cross-bucket pairs
    val pairs = RangeJoin.bandJoin(clicks, purchases, "user_id", "cts", "pts", band)
      .groupBy(col("click_id"), col("purchase_id")).count()
    assert(pairs.filter(col("count") > 1).isEmpty)
  }
}
