package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's store codec contract
  * (KeyValueStoreSpec.scala:13-17 round-trips
  * `(variableSizeBytes(uint16, utf8) :: int32 :: bool)`): encode → decode
  * through the engine == identity, malformed bytes land in the error
  * channel instead of throwing.
  */
class BinaryRecordCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val recGen = Gen.zip(
    Gen.listOf(Gen.asciiPrintableChar).map(_.mkString),
    Gen.choose(Int.MinValue, Int.MaxValue),
    Gen.oneOf(true, false))

  test("decode(encode(r)) == r for random records (incl. unicode)") {
    import spark.implicits._
    val params = Gen.Parameters.default
    val recs = (1 to 40).flatMap(s => recGen(params, Seed(s.toLong))) ++
      Seq(("", 0, false), ("héllo wörld — ünïcode ✓", -1, true))
    val df = recs.map { case (i, k, b) =>
      (i, k, b, BinaryRecordDecode.encode(i, k, b))
    }.toDF("i", "k", "bla", "raw")
    val out = df.select(col("i"), col("k"), col("bla"),
      BinaryRecordDecode.decode(col("raw")).as("d"))
      .selectExpr("i", "k", "bla", "d.i AS di", "d.k AS dk", "d.bla AS dbla")
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(3))
      assert(r.getInt(1) == r.getInt(4))
      assert(r.getBoolean(2) == r.getBoolean(5))
    }
  }

  test("malformed input decodes to NULL (error channel), never throws") {
    import spark.implicits._
    val bad = Seq(
      Array[Byte](),                         // empty
      Array[Byte](0, 5, 'a', 'b'),           // short buffer
      BinaryRecordDecode.encode("x", 1, true) ++ Array[Byte](9)) // trailing
    val df = bad.toDF("raw")
      .select(BinaryRecordDecode.decode(col("raw")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("registered as SQL function") {
    import spark.implicits._
    Seq(BinaryRecordDecode.encode("sql", 7, true)).toDF("raw")
      .createOrReplaceTempView("braw")
    val r = spark.sql(
      "SELECT binary_record_decode(raw).i, binary_record_decode(raw).k FROM braw")
      .head()
    assert(r.getString(0) == "sql" && r.getInt(1) == 7)
  }
}
