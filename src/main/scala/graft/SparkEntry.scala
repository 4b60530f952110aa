package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are assembled from the operator modules' declared
  * inventories (SURVEY.md §2.C Q1–Q16 plus the [EXT] dedup / similarity /
  * text-analysis / envelope operators).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Latest-value-per-key — THE reference semantic (Tables.scala fold).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.LatestByKey.table(spark, "/root/testdata/sf0.001").scan

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.all.map(q => q.name -> q.run).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate ops (q10_approx,
    * q22_ann_ivf) → driver records a weaker rows-only check; those are
    * property-tested in ScalaTest instead.
    */
  def oracleSql: Map[String, String] =
    GraftQuery.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
