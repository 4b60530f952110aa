package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch EXACT-substring gating for a streaming corpus ingest — the
  * streaming twin of q102's duplicated-span detector, complementing
  * [[DedupStream]] (whole-document near-dup) with span-level semantics:
  * boilerplate and licence blocks arrive spread across batches, and a doc
  * dominated by spans the corpus has already accepted should not enter.
  *
  * Index layout under `indexDir` (plain parquet, one `batch=<id>`
  * partition per micro-batch, queryable by any reader):
  *  - `fps/`   — (doc_id, fp): distinct 16-token window fingerprints of
  *               every ACCEPTED document.
  *  - `flags/` — (doc_id, n_win, n_dup, dup_frac): the gated stream.
  *
  * Flag contract (deterministic, mirrored by StreamingSpanDedupSpec's
  * reference simulation): a window of batch doc d is DUPLICATED iff its
  * fp appears in the accepted index from earlier batches, or some doc e in
  * the SAME batch with e.doc_id < d.doc_id has it (conservative in-batch
  * collapse — e's own verdict does not matter, exactly [[DedupStream]]'s
  * rule (b)); d is flagged iff duplicated windows / total windows ≥ τ.
  * Docs shorter than one window carry no windows and always pass.
  *
  * Scale shape: per batch the work is O(batch windows) — one fingerprint
  * pass over the batch, one equi join on the 64-bit fp against the index,
  * one in-batch min-owner aggregate, one per-doc fold. The index grows by
  * accepted docs only. Exactly-once follows DedupStream: every write lands
  * in its own `batch=<id>` partition with OVERWRITE semantics and reads
  * filter `batch < currentId`, so at-least-once re-delivery rewrites the
  * same bytes instead of double-appending.
  */
object SpanDedupStream {

  private def readBefore(spark: SparkSession, path: String,
      batchId: Long, cols: Seq[String]): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(path)
        .filter(col("batch") < lit(batchId))
        .select(cols.map(col): _*))
    else None
  }

  /** Process one micro-batch: flag span-dominated docs vs the index +
    * smaller in-batch ids, append survivors' fingerprints. Returns the
    * flagged frame.
    */
  def gateBatch(batch: DataFrame, indexDir: String, threshold: Double,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val winsB = Curation.windowFps(batch.select(col("doc_id"), col("text")))
      .localCheckpoint() // consumed by mark + survivor write
    val idxFps = readBefore(spark, s"$indexDir/fps", batchId, Seq("fp"))
      .map(_.distinct().withColumn("hit_idx", lit(true)))

    // smallest in-batch owner per fp — rule (b)'s cause, one tiny aggregate
    val minOwner = winsB.groupBy(col("fp")).agg(min(col("doc_id")).as("min_doc"))
    val markedBase = winsB.join(minOwner, Seq("fp"))
    val marked = idxFps match {
      case Some(ix) => markedBase.join(ix, Seq("fp"), "left")
        .select(col("doc_id"),
          (coalesce(col("hit_idx"), lit(false)) ||
            col("min_doc") < col("doc_id")).as("dup"))
      case None => markedBase
        .select(col("doc_id"), (col("min_doc") < col("doc_id")).as("dup"))
    }
    val flagged = marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        graft.functions.Rounding.stable(col("n_dup") / col("n_win"), 4))
      .filter(col("n_dup") / col("n_win") >= threshold)
      .localCheckpoint() // consumed twice; decouples from the dirs below

    val survivors = batch.select(col("doc_id"))
      .join(flagged, Seq("doc_id"), "left_anti")
    winsB.join(survivors, Seq("doc_id"), "left_semi")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/fps/batch=$batchId")
    flagged
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/flags/batch=$batchId")
    flagged
  }

  /** Attach the gate to a document stream with `doc_id` and `text`. */
  def start(docs: DataFrame, indexDir: String, checkpoint: String,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) { gateBatch(b, indexDir, threshold, id); () }
      }
      .start()
}
