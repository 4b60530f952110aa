package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The ReadOnlyTable surface (reference A18/A19/A20 —
  * streams/Table.scala:10-16): point lookup, multi-get, full scan over the
  * materialized latest-by-key view.
  */
class TableViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val table = LatestByKey.table(spark, TestSpark.sf0001)
  private lazy val full = table.scan.collect()
    .map(r => r.getLong(0) -> r).toMap

  test("scan returns one row per key") {
    val keys = full.keySet
    assert(keys.size == full.size)
    assert(keys.nonEmpty)
  }

  test("get returns exactly the key's row (or nothing for a miss)") {
    val k = full.keySet.head
    val got = table.get(k).collect()
    assert(got.length == 1 && got.head.getLong(0) == k)
    val missing = (0L to 100000L).find(!full.contains(_)).get
    assert(table.get(missing).isEmpty, "get miss is empty (reference get-miss contract)")
  }

  test("getAll returns present keys only (multiGet contract)") {
    val ks = full.keySet.take(3).toSeq
    val missing = (0L to 100000L).find(!full.contains(_)).get
    val got = table.getAll(ks :+ missing).collect().map(_.getLong(0)).toSet
    assert(got == ks.toSet)
  }
}
