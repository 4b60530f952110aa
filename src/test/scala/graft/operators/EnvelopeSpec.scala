package graft.operators

import graft.TestSpark
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's core decode contract: failures stay in-stream
  * (RecordStream.scala:277-278) — a malformed payload must yield a row with
  * the error channel set, never a dropped row.
  */
class EnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("malformed JSON rows survive with error set; good rows decode") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 5}"""),
      (2L, """not json at all"""),
      (3L, """{"k": 7}"""),
      (4L, null.asInstanceOf[String])).toDF("id", "payload")
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val out = Envelope.decodeJson(df, "payload", schema)
    assert(out.count() == 4, "no rows dropped")
    assert(out.columns.toSeq == Seq("id", "payload", "error"))
    val errNull = out.collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(errNull(1L), "good row has no error")
    assert(!errNull(2L), "malformed row carries error")
    assert(errNull(4L), "null input is not an error (absent payload)")
    val decoded = out.selectExpr("payload.k").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(decoded.flatten.toSet == Set(5, 7))
  }

  test("fallback decoding: coalesce over decode variants (MonadError.handleErrorWith analogue)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // First decoder expects {"k": int}; fallback decoder expects a bare int string.
    val df = Seq("""{"k": 5}""", "42", "junk").toDF("payload")
    val primary = get_json_object(col("payload"), "$.k").cast("int")
    val fallback = expr("try_cast(payload AS INT)") // ANSI mode: plain cast throws
    val out = df.select(coalesce(primary, fallback).as("k")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(5), Some(42), None))
  }
}
