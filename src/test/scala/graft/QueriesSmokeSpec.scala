package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1-style smoke: every declared query runs at sf0.001 and the contract
  * invariants hold (driver checks entry rows>0 and runs each queries()
  * entry; oracle keys must be a subset of query keys).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("every multi-row oracle query declares a deterministic ORDER BY") {
    // the driver hash-compares rows in emitted order — a multi-row result
    // without a total ORDER BY would hash-mismatch nondeterministically
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
        if !sql.toUpperCase.contains("ORDER BY")) {
      val rows = SparkEntry.queries(name)(spark, TestSpark.sf0001).count()
      assert(rows <= 1,
        s"$name returns $rows rows but its oracle has no ORDER BY")
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
