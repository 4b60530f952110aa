package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-fallback decode composition (reference KafkaDecoder.scala:19-22:
  * `handleErrorWith` chains decoder alternatives): try the v2 schema, fall
  * back to v1 migrated into v2, else error channel — rows never drop.
  */
class FallbackDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val v2 = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val v1 = StructType(Seq(
    StructField("uid", LongType), StructField("label", StringType)))

  test("primary decodes, legacy migrates, garbage goes to the error channel") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"id": 10, "name": "new"}"""),   // v2
      (2L, """{"uid": 20, "label": "old"}"""), // v1 → migrate
      (3L, """definitely not json"""),         // malformed
      (4L, """{"other": true}"""),             // parses, matches neither schema
      (5L, null.asInstanceOf[String])).toDF("row_id", "raw")
    val out = Envelope.decodeFallback(df, "raw", v2, v1,
      lc => struct(lc.getField("uid").as("id"), lc.getField("label").as("name")))
    assert(out.count() == 5, "no rows dropped")
    val rows = out.selectExpr("row_id", "payload.id", "payload.name", "error")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(rows(1L) == ((Some(10L), Some("new"), None)), "v2 decodes directly")
    assert(rows(2L) == ((Some(20L), Some("old"), None)), "v1 migrates into v2 shape")
    assert(rows(3L)._1.isEmpty && rows(3L)._3.nonEmpty, "malformed carries error")
    assert(rows(4L)._1.isEmpty && rows(4L)._3.nonEmpty,
      "schema-less JSON must not decode vacuously")
    assert(rows(5L) == ((None, None, None)), "null input: absent payload, no error")
  }

  test("fallback order matters: primary wins when both schemas match") {
    import spark.implicits._
    // ambiguous record carrying BOTH v2 and v1 fields — primary must win
    val df = Seq((1L, """{"id": 1, "name": "a", "uid": 99, "label": "z"}"""))
      .toDF("row_id", "raw")
    val out = Envelope.decodeFallback(df, "raw", v2, v1,
      lc => struct(lc.getField("uid").as("id"), lc.getField("label").as("name")))
    val r = out.selectExpr("payload.id", "payload.name").head()
    assert((r.getLong(0), r.getString(1)) == ((1L, "a")))
  }
}
