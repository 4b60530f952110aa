package graft.functions

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Md5Hash60 must be bit-identical to the conv/substring SQL formulation
  * (which is what the DuckDB oracles compute) on real token data.
  */
class Md5Hash60Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("digest-prefix hash equals the conv(substring(md5)) formulation") {
    val toks = Fixtures.documents(spark, TestSpark.sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val mismatches = toks.select(
      TextFunctions.hash60(col("tok")).as("fast"),
      TextFunctions.hash60Sql(col("tok")).as("sql"))
      .filter(col("fast") =!= col("sql"))
      .count()
    assert(mismatches == 0)
    // and on assorted edge inputs incl. unicode + empty
    import spark.implicits._
    val edge = Seq("", " ", "héllo", "✓ünï", "a" * 1000).toDF("tok")
    val bad = edge.select(
      TextFunctions.hash60(col("tok")).as("fast"),
      TextFunctions.hash60Sql(col("tok")).as("sql"))
      .filter(col("fast") =!= col("sql")).count()
    assert(bad == 0)
  }

  test("md5_hash60 and word_ngrams are registered SQL functions (extension jar surface)") {
    val r = spark.sql(
      "SELECT md5_hash60('spark'), word_ngrams('a b c d', 2)").head()
    assert(r.getLong(0) ===
      spark.range(1).select(TextFunctions.hash60(lit("spark"))).head().getLong(0))
    assert(r.getSeq[String](1) === Seq("a b", "b c", "c d"))
    // literal-arity misuse fails loud, not silently wrong
    val e = intercept[Exception](spark.sql("SELECT word_ngrams('a b', 1 + 1)").head())
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("word_ngrams"))
  }
}
