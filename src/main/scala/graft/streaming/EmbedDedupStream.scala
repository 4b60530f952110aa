package graft.streaming

import graft.operators.Similarity
import graft.functions.VectorDot
import graft.functions.VectorFunctions.{cosineFast, cosineWithNorms, dotDec, norm2Dec}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch EMBEDDING near-dup gating — the streaming twin of q106's
  * OR-amplified LSH near-dup (as [[DedupStream]] is to q92's text dedup):
  * each micro-batch of vectors is checked against a PERSISTED bucket index
  * accumulated from every previously accepted vector, survivors are
  * appended, and flagged near-dups never enter the index (keep-first
  * corpus semantics).
  *
  * Index layout under `indexDir` (plain parquet, one `batch=<id>`
  * partition per micro-batch, queryable by any reader):
  *  - `buckets/` — (vec_id, tbl, bucket): q106's 16-table bucket rows; the
  *                 per-batch candidate probe is an equi join on these slim
  *                 rows — raw vectors never ride the probe.
  *  - `vecs/`    — (vec_id, embedding): fetched by id ONLY for candidate
  *                 pairs (the exact-rescore side).
  *  - `dups/`    — (vec_id, matched_vec, cos_sim): the flagged stream.
  *
  * Duplicate contract (deterministic, mirrored by StreamingEmbedDedupSpec's
  * reference simulation): a batch vector d is flagged iff it shares ANY of
  * the 16 table buckets with, and has exact-decimal cosine ≥ τ to,
  *  (a) an ACCEPTED vector a from an earlier batch, or
  *  (b) a vector e in the SAME batch with e.vec_id < d.vec_id (conservative
  *      in-batch collapse — e's own status does not matter).
  * The bucket-candidate restriction is part of the contract: the relation
  * is exactly q106's pair set, so the batch query value-oracles the gate.
  *
  * Scale shape: per batch the work is O(batch) — 96 plane projections for
  * the batch only, slim equi bucket-joins against the index, and the
  * two-phase cosine (fast-double prefilter at τ−1e-6, exact-decimal
  * confirm) touching only candidate pairs. Exactly-once: every write lands
  * in a `batch=<id>` partition with OVERWRITE semantics and reads filter
  * `batch < currentId`, so a re-delivered batch rewrites byte-identically
  * instead of double-appending (same contract as [[DedupStream]]).
  */
object EmbedDedupStream {

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

  /** Process one micro-batch: flag near-dups vs the index + smaller
    * in-batch ids, append survivors to the index. Returns the flagged frame.
    */
  def dedupBatch(batch: DataFrame, indexDir: String, threshold: Double,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val vecs = batch.select(col("vec_id"), col("embedding")).localCheckpoint()
    // materialized once: the 96 interpreted decimal-fallback projections are
    // the expensive narrow stage, and the in-batch self-join reads it twice
    val tb = Similarity.orLshBuckets(vecs).localCheckpoint()
    val idxTb = readBefore(spark, s"$indexDir/buckets", batchId,
      Seq("vec_id", "tbl", "bucket"))
    val idxVec = readBefore(spark, s"$indexDir/vecs", batchId,
      Seq("vec_id", "embedding"))

    val x = tb.select(col("vec_id").as("d"), col("tbl"), col("bucket"))
    val candIn = x.join(
      tb.select(col("vec_id").as("m"), col("tbl").as("t2"), col("bucket").as("b2")),
      col("tbl") === col("t2") && col("bucket") === col("b2") &&
        col("d") > col("m")) // dup candidate = larger id
      .select(col("d"), col("m"))
    val cands = (idxTb match {
      case Some(ix) =>
        x.join(ix.select(col("vec_id").as("m"),
            col("tbl").as("t2"), col("bucket").as("b2")),
          col("tbl") === col("t2") && col("bucket") === col("b2"))
          .select(col("d"), col("m"))
          .union(candIn)
      case None => candIn
    }).distinct()

    // decimal norms computed once per vector, never per pair (q106's shape)
    val allVecs = idxVec.map(vecs.union).getOrElse(vecs)
    val withNorm = allVecs.select(col("vec_id"), col("embedding"),
      norm2Dec(col("embedding")).as("n2"),
      VectorDot.dot(col("embedding"), col("embedding")).as("n2d"))
    val fastc = cosineFast(VectorDot.dot(col("ed"), col("em")),
      col("n2dd"), col("n2dm"))
    val exact = cosineWithNorms(dotDec(col("ed"), col("em")), col("n2_d"), col("n2_m"))
    // per flagged vector: the SMALLEST matching cause with that pair's OWN
    // cosine (min-struct argmin, same contract as DedupStream)
    val flagged = cands
      .join(withNorm.select(col("vec_id").as("d"), col("embedding").as("ed"),
        col("n2").as("n2_d"), col("n2d").as("n2dd")), Seq("d"))
      .join(withNorm.select(col("vec_id").as("m"), col("embedding").as("em"),
        col("n2").as("n2_m"), col("n2d").as("n2dm")), Seq("m"))
      .filter(fastc >= threshold - 1e-6)
      .select(col("d"), col("m"), exact.as("c"))
      .filter(col("c") >= threshold)
      .groupBy(col("d").as("vec_id"))
      .agg(min(struct(col("m"), col("c"))).as("mm"))
      .select(col("vec_id"), col("mm.m").as("matched_vec"),
        graft.functions.Rounding.stable(col("mm.c"), 4).as("cos_sim"))
      .localCheckpoint() // consumed 3× below; also decouples from the index
                         // dirs this batch is about to rewrite

    val survivors = vecs.select(col("vec_id"))
      .join(flagged, Seq("vec_id"), "left_anti")
    tb.join(survivors, Seq("vec_id"), "left_semi")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/buckets/batch=$batchId")
    vecs.join(survivors, Seq("vec_id"), "left_semi")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/vecs/batch=$batchId")
    flagged
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/dups/batch=$batchId")
    flagged
  }

  /** Attach the gate to a vector stream with `vec_id` and `embedding`. */
  def start(vecs: DataFrame, indexDir: String, checkpoint: String,
      threshold: Double = 0.45): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) { dedupBatch(b, indexDir, threshold, id); () }
      }
      .start()
}
