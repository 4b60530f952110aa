package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the engine's declared query inventory (SURVEY.md §2.C).
  *
  * @param name   stable query id (drives CORRECTNESS/BENCH keys)
  * @param run    the Spark-native program: (session, fixture dir) => result
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables; None for ops whose semantics aren't SQL-expressible
  *               (approximate/ANN paths) — those get a rows-only check plus a
  *               ScalaTest property against an exact in-engine reference.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  /** Full inventory, assembled from the operator modules. */
  def all: Seq[GraftQuery] =
    operators.Relational.queries ++
      operators.LatestByKey.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Envelope.queries ++
      operators.Multimodal.queries ++
      operators.AsOfJoin.queries ++
      operators.Sessionize.queries ++
      operators.Curation.queries ++
      operators.RangeJoin.queries ++
      operators.Sketches.queries ++
      operators.Layout.queries ++
      operators.Profile.queries ++
      operators.TimeSeries.queries ++
      operators.Bpe.queries ++
      operators.Graph.queries ++
      operators.Funnel.queries ++
      operators.Clustering.queries ++
      operators.Skew.queries ++
      operators.Winnow.queries
}
