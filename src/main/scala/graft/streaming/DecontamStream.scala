package graft.streaming

import graft.functions.BloomFilters
import graft.functions.TextFunctions.wsTokens
import graft.operators.{Curation, SignalStore}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming benchmark-decontamination gate — the streaming twin of q104,
  * completing the curation gate family (DedupStream / SpanDedupStream /
  * EmbedDedupStream / AnomalyStream all have batch twins): incoming
  * evaluation documents are checked, micro-batch by micro-batch, for
  * 8-token windows that appear anywhere in a FIXED training corpus, and
  * verdicts land as an exactly-once parquet stream.
  *
  * The reference's changelog-fold posture
  * (`/root/reference/src/main/scala/com/iravid/fs2/kafka/streams/Tables.scala:110-139`
  * — a stream folded against a materialized table) applied to
  * decontamination: the TRAIN side is the table (static, built once at
  * stream start), the eval docs are the stream.
  *
  * Per-batch shape mirrors batch q104 exactly, so verdicts are pinned
  * ≡ `decontam(bloom = true)` by StreamingDecontamSpec:
  *  - the batch's width-8 window inventory (one tokenize + hash projection
  *    over the BATCH, bounded by batch size);
  *  - `n_win` folds per doc BEFORE the prefilter;
  *  - the broadcast train-side bloom (bytes built ONCE at stream start —
  *    a long-running stream amortizes the one sizing count the lazy batch
  *    form avoids) drops definitely-clean windows in-map;
  *  - the exact confirm semi-join against the train fingerprints removes
  *    false positives, so each verdict is EXACT.
  *
  * Verdicts are per-doc deterministic functions of (doc text, train
  * corpus) — NO cross-batch state — so re-delivery in any batch
  * arrangement yields identical rows: exactly-once follows the
  * DedupStream/SpanDedupStream layout (every batch writes its own
  * `batch=<id>` partition with OVERWRITE semantics, so an at-least-once
  * retry rewrites the same bytes), and a doc re-delivered across DIFFERENT
  * batch ids writes equal rows twice — the reader contract is
  * `read(...).dropDuplicates("doc_id")` ([[verdicts]]).
  */
object DecontamStream {

  /** The static train side, built once at stream start: the persisted
    * train-split fingerprints (via [[SignalStore.decontamWins]], shared
    * with batch q104) plus the serialized bloom over them. `bloomBytes` is
    * None for an empty train split — the gate then short-circuits (no
    * window can hit an empty train set).
    */
  final case class TrainFilter(trainFp: DataFrame, bloomBytes: Option[Array[Byte]])

  /** Build the train filter for a corpus dir: one sizing count + one bloom
    * build, both riding the store-persisted inventory — eager by design
    * (stream initialization, amortized over the stream's lifetime).
    */
  def trainFilter(s: SparkSession, dir: String): TrainFilter = {
    val trainFp = SignalStore.decontamWins(s, dir)
      .filter(col("bucket") < 90).select(col("fp"))
    val n = trainFp.count()
    val bytes =
      if (n == 0L) None
      else Option(BloomFilters.build(trainFp, col("fp"), numItems = n))
    TrainFilter(trainFp, bytes)
  }

  /** Gate one micro-batch of `(doc_id, text)` docs: emit q104-shaped
    * verdicts `(doc_id, n_win, n_hit, contam_frac)` for docs with ≥ 1
    * confirmed train hit, written to `outDir/verdicts/batch=<id>`
    * (overwrite — idempotent under retry). Returns the verdict frame.
    */
  def gateBatch(batch: DataFrame, tf: TrainFilter, outDir: String,
      batchId: Long): DataFrame = {
    // the batch's probe inventory: distinct width-8 fps, the same one-copy
    // formula as the train inventory (no bucket split — the stream IS the
    // eval side). localCheckpoint: consumed by the n_win fold and the
    // prefiltered confirm join.
    val probe = Curation.winFpsOver(
        batch.select(col("doc_id"), wsTokens(col("text")).as("toks")),
        Curation.DecontamWidth)
      .localCheckpoint()
    val nWin = probe.groupBy(col("doc_id")).agg(count(lit(1)).as("n_win"))
    val verdicts = tf.bloomBytes match {
      case None => // empty train corpus: nothing can hit
        Curation.decontamVerdict(probe.limit(0), tf.trainFp, nWin)
      case Some(bytes) =>
        Curation.decontamVerdict(
          probe.filter(BloomFilters.mightContain(bytes, col("fp"))),
          tf.trainFp, nWin)
    }
    verdicts.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/verdicts/batch=$batchId")
    verdicts
  }

  /** Attach the gate to a document stream with `doc_id` and `text`,
    * checking against the train split of the corpus at `trainDir`.
    */
  def start(docs: DataFrame, trainDir: String, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val tf = trainFilter(docs.sparkSession, trainDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) { gateBatch(b, tf, outDir, id); () }
      }
      .start()
  }

  /** The gated stream's cumulative verdicts — one row per flagged doc
    * (cross-batch re-deliveries collapse; rows are deterministic, so
    * duplicates are exact copies). A stream that has only ever seen empty
    * batches ([[start]] skips them) never lands a batch partition — the
    * data-file probe returns an empty verdict frame then, instead of the
    * schema-inference throw a bare parquet read hits on the missing path.
    */
  def verdicts(s: SparkSession, outDir: String): DataFrame =
    if (!graft.Pipeline.hasDataFiles(s, s"$outDir/verdicts"))
      // empty shape derived THROUGH the one-copy verdict producer (only
      // the narrow input contracts are spelled out), so a schema change
      // there can't leave this rarely-exercised branch emitting stale
      // columns
      Curation.decontamVerdict(
        s.range(0).select(col("id").as("doc_id"), col("id").as("fp")),
        s.range(0).select(col("id").as("fp")),
        s.range(0).select(col("id").as("doc_id"), col("id").as("n_win")))
    else
      s.read.parquet(s"$outDir/verdicts")
        .select(col("doc_id"), col("n_win"), col("n_hit"), col("contam_frac"))
        .dropDuplicates("doc_id")
}
