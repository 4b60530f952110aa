package graft.operators

import graft.{Fixtures, GraftQuery}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships, built from the operators the engine already provides
  * ([EXT], BASELINE.json north star).
  *
  * Scale shape: every stage is a narrow map over the single corpus scan
  * except the dedup (one shuffle on the normalized-text key — at 100 TB
  * you'd key on md5(norm), cf. Dedup.exactDedupByHash) and the final tiny
  * per-language aggregate. The stage ORDER matters at scale: cheap
  * quality/contamination predicates run before the shuffle so the dedup
  * only pays for surviving rows.
  */
object Curation {

  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
  private val blockPhrases = Seq("lorem ipsum", "correct horse battery")

  // ---------------------------------------------------------------- q63
  // Full pipeline: quality-score ≥ 0.5 → contamination drop → near-exact
  // dedup on normalized text (keep the min doc_id) → per-language funnel
  // counts. The emitted funnel (raw → filtered → kept) is the number a
  // curation run reports.
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(enStops: _*)))
    val quality =
      lit(0.4) * (least(col("n_chars"), lit(500)) / lit(500.0)) +
        lit(0.3) * (stopCnt / nTok) +
        lit(0.3) * (least(col("n_chars") / nTok, lit(8.0)) / lit(8.0))
    val clean = blockPhrases.map(p => !col("text").contains(p)).reduce(_ && _)
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val filtered = Fixtures.documents(s, dir)
      .filter(quality >= 0.5 && clean)
      .select(col("doc_id"), col("lang"), norm.as("norm"))
    val kept = filtered
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("grp"))
    val raw = Fixtures.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
    filtered.join(kept, filtered("doc_id") === kept("keep_id"), "left_semi")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .join(raw, Seq("lang"), "right")
      .select(col("lang"), col("n_raw"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  private val q63Sql = {
    val enList = enStops.map(w => s"'$w'").mkString("(", ", ", ")")
    val cleanPred = blockPhrases.map(p => s"strpos(text, '$p') = 0").mkString(" AND ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |    0.4 * (LEAST(n_chars, 500) / 500.0) +
       |    0.3 * (len(list_filter(string_split(text, ' '), t -> t IN $enList)) /
       |           len(string_split(text, ' '))) +
       |    0.3 * (LEAST(n_chars / len(string_split(text, ' ')), 8.0) / 8.0) AS quality
       |  FROM documents),
       |filtered AS (
       |  SELECT doc_id, lang,
       |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
       |  FROM scored WHERE quality >= 0.5 AND $cleanPred),
       |kept AS (SELECT MIN(doc_id) AS keep_id FROM filtered GROUP BY norm),
       |raw AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang),
       |kc AS (
       |  SELECT lang, COUNT(*) AS n_kept FROM filtered
       |  WHERE doc_id IN (SELECT keep_id FROM kept) GROUP BY lang)
       |SELECT raw.lang, raw.n_raw, COALESCE(kc.n_kept, 0) AS n_kept
       |FROM raw LEFT JOIN kc USING (lang) ORDER BY raw.lang""".stripMargin
  }

  // ---------------------------------------------------------------- q64
  // Deterministic train/val/test split: bucket = md5(doc_id) mod 100 →
  // 90/5/5. Hash-based splits are reproducible across runs/engines and
  // stable under corpus growth (a document's split never changes) —
  // the property random() splits lack. Pure narrow map + tiny aggregate.
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    val split = when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    Fixtures.documents(s, dir)
      .select(col("lang"), split.as("split"))
      .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))
  }

  private val q64Sql =
    """WITH b AS (
      |  SELECT lang,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q63_curation_pipeline", q63, Some(q63Sql)),
    GraftQuery("q64_dataset_split", q64, Some(q64Sql)))
}
