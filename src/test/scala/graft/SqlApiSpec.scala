package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry point is a first-class surface (SURVEY §1.3: `spark.sql`
  * next to the Column API): representative queries must give identical
  * results through both. Catalyst plans both paths to the same physical
  * operators, so this pins the API contract, not a second engine.
  */
class SqlApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def viewsOnce(): Unit = {
    Fixtures.lineitem(spark, dir).createOrReplaceTempView("sql_lineitem")
    Fixtures.documents(spark, dir).createOrReplaceTempView("sql_documents")
  }

  test("filter+agg through spark.sql equals the DataFrame-API query") {
    viewsOnce()
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM sql_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val viaDf = Fixtures.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(viaSql === viaDf)
  }

  test("window rank through spark.sql equals the DataFrame-API query") {
    viewsOnce()
    val viaSql = spark.sql(
      """SELECT * FROM (
        |  SELECT doc_id, lang,
        |         RANK() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS r
        |  FROM sql_documents)
        |WHERE r <= 3 ORDER BY lang, r, doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))
    val viaDf = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("lang"), rank().over(w).as("r"))
      .filter(col("r") <= 3)
      .orderBy(col("lang"), col("r"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(viaSql === viaDf)
  }

  test("graft extension functions compose inside plain SQL text") {
    viewsOnce()
    // vec_dot (custom codegen'd expression) + md5-based split bucketing in
    // one SQL statement — the extension registry serving ad-hoc SQL users
    val rows = spark.sql(
      """SELECT doc_id,
        |       vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |               CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d,
        |       conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) % 100 AS bucket
        |FROM sql_documents LIMIT 5""".stripMargin).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getDouble(1) === 11.0))
    assert(rows.forall(r => { val b = r.getAs[Any](2).toString.toLong; b >= 0 && b < 100 }))
  }

  test("md5_hash60/word_ngrams via spark.sql equal the Column-API primitives") {
    viewsOnce()
    val viaSql = spark.sql(
      """SELECT lang, COUNT(DISTINCT md5_hash60(text)) AS n_hash,
        |       SUM(size(word_ngrams(text, 3))) AS n_shingles
        |FROM sql_documents GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val viaDf = Fixtures.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(countDistinct(functions.TextFunctions.hash60(col("text"))).as("n_hash"),
        sum(size(functions.WordNGrams.distinctNGrams(col("text"), 3))).as("n_shingles"))
      .orderBy(col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql === viaDf)
  }
}
