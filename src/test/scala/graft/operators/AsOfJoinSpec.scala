package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct pins for the as-of join contract — the fixture oracles (q31/q60)
  * never exercise NULL payload fields or non-orderable payload types, so
  * the struct-sweep semantics are asserted here on hand-built inputs.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a NULL payload field in the matched row stays NULL (no cross-row stitching)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "click")).toDF("k", "t", "evt")
    // right rows: t=5 has note set; t=8 (the match) has note legitimately NULL.
    // A per-column last(ignoreNulls) sweep would reach back and attach t=5's
    // note to t=8's id — the struct sweep must not.
    val right = Seq((1L, 5L, Some("old-note"), 50L), (1L, 8L, None, 80L))
      .toDF("k", "t", "note", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "t").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("rid") === 80L, "must match the latest right row")
    assert(r.isNullAt(r.fieldIndex("note")),
      "matched row's NULL field must stay NULL, not be stitched from an older row")
  }

  test("map-typed payload columns are carried without breaking the sort (orderability)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, Map("a" -> "1"), 5L), (1L, 9L, Map("b" -> "2"), 9L))
      .toDF("k", "t", "attrs", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "t").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("rid") === 9L)
    assert(out.head.getAs[Map[String, String]]("attrs") === Map("b" -> "2"))
  }

  test("backward takes latest at-or-before; forward takes earliest at-or-after; no match → NULLs") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 3L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 4L, 4L), (1L, 10L, 10L), (1L, 12L, 12L)).toDF("k", "t", "rid")
    val back = AsOfJoin.asOf(left, right, "k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(back((1L, 10L)) === Some(10L), "inclusive <=")
    assert(back((1L, 3L)) === None, "nothing at-or-before")
    assert(back((2L, 10L)) === None, "no right rows for key")
    val fwd = AsOfJoin.asOf(left, right, "k", "t", forward = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(fwd((1L, 10L)) === Some(10L), "inclusive >=")
    assert(fwd((1L, 3L)) === Some(4L), "earliest at-or-after")
    assert(fwd((2L, 10L)) === None)
  }
}
