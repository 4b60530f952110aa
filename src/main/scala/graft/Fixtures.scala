package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Scans are plain parquet reads: Catalyst pushes predicates and prunes
  * columns into the scan (verify with `.explain("formatted")` —
  * `PushedFilters`/`ReadSchema`), so callers should filter/select as early
  * as possible and let the optimizer do the rest. At 100 TB these become
  * partitioned-directory scans; nothing here assumes single-file inputs.
  */
object Fixtures {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  /** events.ts normalization. The fixture has shipped two physical types:
    * parquet TIMESTAMP(NANOS,false) (arrives as epoch-nanos LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`; truncated here to µs) and
    * plain timestamp[us] with no timezone (arrives as TIMESTAMP_NTZ). Both
    * are normalized to a session-UTC TimestampType so downstream
    * `unix_micros`/epoch arithmetic resolves; with the session pinned to UTC
    * the NTZ→TZ cast is value-preserving, and DuckDB's naive TIMESTAMP
    * oracle reads the same instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
