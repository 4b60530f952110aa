package graft.plans

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must (a) rewrite the declarative HOF
  * dot-product into vec_dot, (b) leave non-matching shapes (the decimal
  * oracle fold) alone, and (c) never change results — bit-for-bit.
  */
class VectorDotRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofDot = aggregate(
    zip_with(col("embedding"), col("embedding"),
      (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("HOF dot-product shape rewrites to the codegen'd vec_dot") {
    val e = Fixtures.embeddings(spark, TestSpark.sf0001)
    val df = e.select(col("vec_id"), hofDot.as("n2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), optimized.take(800))
    assert(!optimized.contains("aggregate("), optimized.take(800))
  }

  test("rewrite is bit-for-bit: HOF result equals explicit VectorDot") {
    val e = Fixtures.embeddings(spark, TestSpark.sf0001).limit(200)
    val viaRule = e.select(col("vec_id"), hofDot.as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = e.select(col("vec_id"),
      graft.functions.VectorDot.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule == direct)
  }

  test("decimal oracle fold (dotDec) is NOT rewritten") {
    val e = Fixtures.embeddings(spark, TestSpark.sf0001)
    val df = e.select(
      graft.functions.VectorFunctions.norm2Dec(col("embedding")).as("n2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("vec_dot"), optimized.take(800))
  }

  test("vec_dot null semantics match the HOF (length mismatch / null element)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (2L, Seq(1.0f), Seq(3.0f, 4.0f)),
      (3L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("id", "a", "b")
      .withColumn("b", when(col("id") === 3, array(lit(3.0f), lit(null).cast("float")))
        .otherwise(col("b")))
    val hof = df.select(col("id"), aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val vd = df.select(col("id"),
      graft.functions.VectorDot.dot(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(hof == vd)
    assert(vd(1L) == Some(11.0))
    assert(vd(2L).isEmpty, "length mismatch is NULL")
    assert(vd(3L).isEmpty, "null element is NULL")
  }
}
