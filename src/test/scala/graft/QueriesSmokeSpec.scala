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
    // without a total ORDER BY would hash-mismatch nondeterministically.
    // The check targets the FINAL top-level clause: an ORDER BY buried in a
    // CTE or subquery (e.g. a LIMIT 1 inner query) does not order the outer
    // result, so a substring match alone would wave through an unordered
    // outer query.
    val outerOrdered = "(?is).*\\border\\s+by\\s+[^()]*\\z".r
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
        if outerOrdered.findFirstIn(sql.trim).isEmpty) {
      val rows = SparkEntry.queries(name)(spark, TestSpark.sf0001).count()
      assert(rows <= 1,
        s"$name returns $rows rows but its oracle's final clause is not a top-level ORDER BY")
    }
  }

  test("no query emits a DECIMAL output column (driver-hash stringification hazard)") {
    // DECIMAL (and DuckDB HUGEINT) render differently between the driver's
    // Spark and DuckDB paths even when values are identical — r1's q25/q28
    // and r4's q71/q72 were all red for exactly this. Aggregate in decimal
    // (order-free), then CAST the result to DOUBLE/BIGINT before emitting.
    val allowlist = Set.empty[String] // no exceptions today; add consciously
    def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.DecimalType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasDecimal(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !allowlist(name)) {
      val bad = fn(spark, TestSpark.sf0001).schema.fields
        .filter(f => hasDecimal(f.dataType)).map(_.name)
      assert(bad.isEmpty,
        s"$name emits DECIMAL column(s) ${bad.mkString(", ")} — cast to DOUBLE/BIGINT before output")
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
