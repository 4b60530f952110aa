package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch weighted reservoir sampling — the streaming twin of q134's
  * Efraimidis–Spirakis exact-k sample. Top-k-by-priority is a mergeable
  * monoid: keeping the k best (priority, doc) pairs seen so far and folding
  * each micro-batch into that state yields, after any prefix of batches,
  * EXACTLY the batch A-Res answer over the documents streamed so far
  * (StreamingReservoirSpec pins the equality after every batch, plus
  * idempotent re-delivery). That is the property that lets one reservoir be
  * maintained continuously over an unbounded ingest instead of re-sampling
  * the corpus per snapshot.
  *
  * State lives OUTSIDE the streaming state store as plain parquet under
  * `stateDir/res/batch=<id>` — the same externalized-index choice as
  * [[DedupStream]]: any engine can read the current sample, and the state
  * survives checkpoint loss. Each batch writes the ENTIRE post-batch
  * reservoir (k rows — bounded, so full rewrite is the cheap move) to its
  * own partition with OVERWRITE semantics and reads only partitions
  * `batch < id`, so an at-least-once re-delivered batch rewrites its
  * partition byte-identically (priorities are the deterministic md5 coin —
  * recomputation is reproducible) instead of corrupting the fold. Old
  * partitions are an audit trail of the sample's evolution; a janitor can
  * drop all but the latest.
  *
  * CHECKPOINT LOSS is detected, not silently mis-folded: with a fresh
  * checkpoint dir, batch ids restart at 0 while higher-numbered partitions
  * remain, so `latestBefore(batch < 0)` would ignore all prior state and
  * later batches would read the STALE old max-batch partition. The fold
  * therefore fails loudly when a partition with `batch > batchId` exists
  * (strictly greater: an at-least-once re-delivery of batch N legitimately
  * sees its own `batch = N` partition and rewrites it). Recovery: either
  * delete `stateDir/res` and restream, or keep the sample by renaming the
  * latest partition to `batch=-1` (negative ids sort below every fresh
  * batch, so the new stream's batch 0 folds on top of it).
  *
  * Scale shape: per batch the work is one narrow scoring projection over
  * the batch + a top-k over (k + |batch|) rows — TakeOrderedAndProject,
  * nothing shuffles but k rows, state size is k regardless of stream
  * length.
  */
object ReservoirStream {

  /** Latest persisted reservoir strictly before `batchId` (None on the
    * first batch).
    */
  private def latestBefore(spark: SparkSession, resDir: String,
      batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(resDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    // partition-column values are type-inferred on read (small ids parse as
    // INT) — normalize to long before comparing
    val all = spark.read.parquet(resDir)
      .withColumn("batch", col("batch").cast("long"))
    // ONE pass over the (ever-growing) state dir yields both bounds: the
    // global max (checkpoint-loss guard) and the latest prior partition
    val bounds = all.agg(max(col("batch")).as("mx"),
      max(when(col("batch") < lit(batchId), col("batch"))).as("prior_mx")).head()
    if (!bounds.isNullAt(0) && bounds.getLong(0) > batchId)
      throw new IllegalStateException(
        s"reservoir state at $resDir has partition batch=${bounds.getLong(0)} > " +
          s"current batch $batchId: the streaming checkpoint was reset without " +
          "clearing reservoir state. Delete the res dir (restream), or rename " +
          "the latest partition to batch=-1 to seed the fresh stream with it.")
    if (bounds.isNullAt(1)) None
    else Some(all.filter(col("batch") === bounds.getLong(1))
      .select(col("doc_id"), col("n_tok"), col("pri")))
  }

  /** Fold one micro-batch of documents `(doc_id, text)` into the reservoir;
    * returns (and persists) the post-batch top-k.
    */
  def sampleBatch(batch: DataFrame, stateDir: String, k: Int,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val scored = TextAnalysis.reservoirScores(batch.select(col("doc_id"), col("text")))
    val merged = latestBefore(spark, s"$stateDir/res", batchId) match {
      case Some(prev) => prev.union(scored)
      case None => scored
    }
    val next = merged
      // a re-delivered doc must not fill two slots. Collisions resolve
      // DETERMINISTICALLY to the max-(pri, n_tok) copy — under the declared
      // identical-re-delivery contract both copies are the same row anyway,
      // but if an updated document is ever re-streamed under its old id the
      // persisted state still converges to one well-defined winner (vs
      // dropDuplicates keeping whichever partition answered first)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("pri"), col("n_tok"))).as("m"))
      .select(col("doc_id"), col("m.n_tok").as("n_tok"), col("m.pri").as("pri"))
      .orderBy(col("pri").desc, col("doc_id"))
      .limit(k)
      .localCheckpoint() // consumed twice (write + return); also decouples
                         // from the partition this batch is about to rewrite
    next.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/res/batch=$batchId")
    next
  }

  /** Current reservoir as last persisted (k rows, priority-ordered). */
  def reservoir(spark: SparkSession, stateDir: String): DataFrame = {
    val all = spark.read.parquet(s"$stateDir/res")
      .withColumn("batch", col("batch").cast("long"))
    val last = all.agg(max(col("batch"))).head().getLong(0)
    all.filter(col("batch") === last)
      .select(col("doc_id"), col("n_tok"), col("pri"))
      .orderBy(col("pri").desc, col("doc_id"))
  }

  /** Attach the sampler to a document stream with `doc_id` and `text`. */
  def start(docs: DataFrame, stateDir: String, checkpoint: String,
      k: Int = TextAnalysis.ResK): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) { sampleBatch(b, stateDir, k, id); () }
      }
      .start()
}
