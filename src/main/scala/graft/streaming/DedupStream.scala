package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch near-dup gating for a streaming corpus ingest — the
  * streaming twin of the q92 incremental dedup: each micro-batch of
  * documents is checked against a PERSISTED signature index accumulated
  * from every previously accepted document, accepted survivors are
  * appended to the index, and flagged duplicates never enter it
  * (keep-first corpus semantics).
  *
  * Index layout under `indexDir` (plain parquet, one `batch=<id>`
  * partition per micro-batch, queryable by any reader):
  *  - `sigs/`     — (doc_id, band, sig): the LSH band-signature index;
  *                  the bipartite candidate join per batch probes this.
  *  - `shingles/` — (doc_id, sh): hashed shingle posting lists; the exact
  *                  jaccard verify reads ONLY candidates' rows from it.
  *  - `dups/`     — (doc_id, matched_doc, jac): the flagged stream.
  *
  * Duplicate contract (deterministic, mirrored by StreamingDedupSpec's
  * reference simulation): a batch doc d is flagged iff
  *  (a) some ACCEPTED doc a from an earlier batch has jaccard(a,d) ≥ τ, or
  *  (b) some doc e in the SAME batch with e.doc_id < d.doc_id has
  *      jaccard(e,d) ≥ τ (conservative in-batch collapse: e's own status
  *      does not matter — a chain collapses to its smallest id).
  *
  * Scale shape: per batch the work is O(batch) — shingle + signature build
  * for the batch only, an equi band-join probing the index, and an exact
  * verify touching only candidate posting lists. The index grows by
  * accepted docs only. State lives OUTSIDE the streaming state store, so
  * any engine can query it and it survives checkpoint loss.
  *
  * Exactly-once: every write lands in a `batch=<id>` partition with
  * OVERWRITE semantics and reads filter `batch < currentId`, so a
  * re-delivered batch (foreachBatch is at-least-once on retry) rewrites
  * its own partition byte-identically instead of double-appending, and a
  * partially-written crashed batch is invisible to its own retry.
  */
object DedupStream {

  private def readBefore(spark: SparkSession, path: String,
      batchId: Long, cols: Seq[String]): Option[DataFrame] = {
    // Hadoop FileSystem, not java.io.File: the index lives wherever the
    // pipeline puts it (HDFS/S3 at scale) — a local-only existence probe
    // would silently disable cross-batch dedup off-box.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(path)
        .filter(col("batch") < lit(batchId))
        .select(cols.map(col): _*))
    else None
  }

  /** Process one micro-batch: flag dups vs the index + smaller in-batch
    * ids, append survivors to the index. Returns the flagged frame.
    */
  def dedupBatch(batch: DataFrame, indexDir: String, threshold: Double,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val shB = Dedup.shinglesOf(batch.select(col("doc_id"), col("text")))
      .localCheckpoint()
    val sigsB = Dedup.bandSignatures(shB)
    val idxSigs = readBefore(spark, s"$indexDir/sigs", batchId,
      Seq("doc_id", "band", "sig"))
    val idxSh = readBefore(spark, s"$indexDir/shingles", batchId,
      Seq("doc_id", "sh"))

    // candidates: batch-vs-index (bipartite) ∪ in-batch (smaller id is the
    // keeper) — both equi joins on (band, sig), never all-pairs. Both
    // sides reuse the ONE materialized sigsB (bandSignatures ends in a
    // localCheckpoint; calling minhashCandidates here would re-run the
    // 64-hash min-aggregation on the hot per-batch path).
    val x = sigsB.select(col("doc_id").as("a"), col("band"), col("sig"))
    val candIn = x.join(
      sigsB.select(col("doc_id").as("b"),
        col("band").as("band2"), col("sig").as("sig2")),
      col("band") === col("band2") && col("sig") === col("sig2") &&
        col("a") > col("b")) // dup candidate = larger id
      .select(col("a"), col("b"))
    val cands = idxSigs match {
      case Some(ix) =>
        val y = ix.select(col("doc_id").as("b"),
          col("band").as("band2"), col("sig").as("sig2"))
        x.join(y, col("band") === col("band2") && col("sig") === col("sig2"))
          .select(col("a"), col("b"))
          .union(candIn).distinct()
      case None => candIn.distinct()
    }
    val allSh = idxSh.map(shB.union).getOrElse(shB)

    // per flagged doc: the SMALLEST matching cause, with that pair's OWN
    // jaccard (min-struct argmin — min(doc_b) and max(jac) taken
    // separately would stitch one match's jac onto another's doc id)
    val flagged = Dedup.verifyJaccard(allSh, Some(cands), threshold)
      .groupBy(col("doc_a").as("doc_id"))
      .agg(min(struct(col("doc_b"), col("jac"))).as("m"))
      .select(col("doc_id"), col("m.doc_b").as("matched_doc"),
        col("m.jac").as("jac"))
      .localCheckpoint() // consumed 3× below; also decouples from the index
                         // dirs this batch is about to rewrite

    val survivors = batch.select(col("doc_id"))
      .join(flagged, Seq("doc_id"), "left_anti")
    sigsB.join(survivors, Seq("doc_id"), "left_semi")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/sigs/batch=$batchId")
    shB.join(survivors, Seq("doc_id"), "left_semi")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/shingles/batch=$batchId")
    flagged
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/dups/batch=$batchId")
    flagged
  }

  /** Attach the gate to a document stream with `doc_id` and `text`. */
  def start(docs: DataFrame, indexDir: String, checkpoint: String,
      threshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) { dedupBatch(b, indexDir, threshold, id); () }
      }
      .start()
}
