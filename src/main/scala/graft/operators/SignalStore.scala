package graft.operators

import graft.Fixtures
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-run cache of the shared corpus-derived signals — the pipeline-stage
  * materialization the window-fingerprint family (q102/q104/q105/q130/q139)
  * reads instead of each query re-scanning and re-tokenizing the corpus.
  *
  * The tokenize pass and the per-window fingerprint projection are the
  * expensive narrow stages of every span-level operator: before this store,
  * one bench run paid them ~5× (once per consumer query). Here each signal
  * materializes ONCE per (signal, sf-dir) and every consumer reads the
  * persisted frame — the in-session analogue of writing the signal to a
  * pipeline-stage parquet (DedupStream's externalized signature index is the
  * cross-engine form of the same idea; at 100 TB a scheduler would persist
  * these between pipeline stages rather than holding them in cluster
  * memory).
  *
  * Derivation chain: `tokens` (one corpus scan) → `winFpsPos` (one hash
  * projection, position-bearing) → `winFps` (distinct doc-level). Each layer
  * persists, so a consumer of a later layer never recomputes an earlier one.
  *
  * Entries are keyed by (session, signal, dir); `spark.catalog.clearCache()`
  * (used by plan-shape tests) unpersists the frames, so accessors re-persist
  * when the storage level has been dropped — the cache degrades to
  * recompute-once, never to silent per-query rescans.
  */
object SignalStore {

  // keyed by the SESSION REFERENCE (SparkSession does not override equals,
  // so tuple equality is reference equality — no hash-recycling collision
  // can hand one session another session's frame). Lifecycle: the first
  // cached() call for a session registers a context-stop listener that
  // calls evict(s), so a host that stops its session without calling
  // evict() still releases the entries (and their plans) instead of
  // pinning them for the JVM lifetime. Sibling sessions sharing one
  // SparkContext (`newSession()`) all evict when that context ends —
  // their frames die with it anyway; a host retiring a SIBLING session
  // mid-context calls evict() explicitly.
  private val cache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  // one stop listener per session; holding the listener lets the spec
  // exercise the eviction wiring without killing the shared test context
  private val stopHooks =
    scala.collection.concurrent.TrieMap[SparkSession, org.apache.spark.scheduler.SparkListener]()

  // cached scalar values (sizing estimates etc.) — computed once per
  // (session, key, dir) and retained across clearCache() (the underlying
  // data is immutable per dir, so the value never goes stale)
  private val scalars =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Long]()

  private def cached(s: SparkSession, key: String, dir: String)
      (build: => DataFrame): DataFrame = {
    // register the stop hook with addSparkListener-THEN-putIfAbsent, and
    // deregister on a lost race: a getOrElseUpdate thunk can run twice
    // under concurrent first access, leaving the loser's listener on the
    // bus but absent from the map — un-removable by evict(), pinning the
    // session reference for the context lifetime. Registering first means
    // the bus never holds a hook the map doesn't know about EXCEPT while
    // this block is mid-flight, and both exits reconcile: a lost
    // putIfAbsent removes our registration; a concurrent evict() that
    // raced ahead of our putIfAbsent removes someone's map entry, after
    // which our put wins and the registered hook is tracked again.
    if (!stopHooks.contains(s)) {
      val hook = new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          evict(s)
      }
      s.sparkContext.addSparkListener(hook)
      if (stopHooks.putIfAbsent(s, hook).isDefined)
        s.sparkContext.removeSparkListener(hook)
    }
    val df = cache.getOrElseUpdate((s, key, dir), build.persist())
    if (df.storageLevel == StorageLevel.NONE) df.persist()
    df
  }

  /** Drop (and unpersist) every signal owned by `s` — called automatically
    * on context stop via the registered listener, or explicitly by hosts
    * retiring a session mid-JVM. Unpersist failures are swallowed: on the
    * stop path the blocks are already gone with the context.
    */
  def evict(s: SparkSession): Unit = {
    // deregister from the bus too — the map remove alone would leave the
    // listener (closing over the session) registered for the context
    // lifetime, and an evict-then-reuse cycle would stack a fresh listener
    // per cycle. removeSparkListener on a stopping context is best-effort.
    stopHooks.remove(s).foreach { hook =>
      try s.sparkContext.removeSparkListener(hook)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach { df =>
        try df.unpersist()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    scalars.keys.filter(_._1 eq s).foreach(scalars.remove)
  }

  /** Number of live entries owned by `s` (spec visibility). */
  private[graft] def entryCount(s: SparkSession): Int =
    cache.keys.count(_._1 eq s)

  /** The registered stop listener for `s`, if any (spec visibility — lets
    * the eviction wiring be exercised without stopping the shared test
    * context).
    */
  private[graft] def stopHook(
      s: SparkSession): Option[org.apache.spark.scheduler.SparkListener] =
    stopHooks.get(s)

  /** `(doc_id, lang, source, toks)` — the tokenized corpus, one scan,
    * widened to the session's shuffle parallelism before the tokenize
    * projection (single-file fixture scans are one split, and AQE's
    * byte-sized coalescer would otherwise leave every downstream
    * window-fingerprint projection single-task — see [[graft.Engine.widen]]).
    */
  def tokens(s: SparkSession, dir: String): DataFrame =
    cached(s, "tokens", dir) {
      graft.Engine.widen(Fixtures.documents(s, dir), col("doc_id"))
        .select(col("doc_id"), col("lang"),
          col("source"), wsTokens(col("text")).as("toks"))
    }

  /** `(doc_id, start, fp)`: every [[Curation.SubWidth]]-token window
    * fingerprint at every offset (within-doc repeats kept — `start` is the
    * window's token offset). The fp is the codegen'd xxhash64 slice-array
    * hash of `Curation.windowFps` (match-only values; oracles keep md5).
    */
  def winFpsPos(s: SparkSession, dir: String): DataFrame =
    cached(s, "winFpsPos", dir) {
      tokens(s, dir)
        .filter(size(col("toks")) >= Curation.SubWidth)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("toks")) - Curation.SubWidth),
          i => xxhash64(slice(col("toks"), i + 1, lit(Curation.SubWidth)))))
          .as(Seq("start", "fp")))
    }

  /** Distinct `(doc_id, fp)` — the doc-level window-fingerprint inventory
    * (within-doc repeats count once).
    */
  def winFps(s: SparkSession, dir: String): DataFrame =
    cached(s, "winFps", dir) {
      winFpsPos(s, dir).select(col("doc_id"), col("fp")).distinct()
    }

  /** Distinct `(doc_id, bucket, fp)` — q104's width-8 decontamination
    * window inventory over the train/eval md5 buckets
    * ([[Curation.decontamWins]]). Separate from [[winFps]] because the
    * decontamination window width (8) differs from the span width (16);
    * derives from the shared [[tokens]] layer, so materializing it costs
    * one hash projection, never a second corpus scan. Consumed by the
    * train-fp side, the bloom build subquery, and both eval folds — the
    * store-owned persist replaces the per-call persist the old q104 body
    * leaked.
    */
  def decontamWins(s: SparkSession, dir: String): DataFrame =
    cached(s, "decontamWins", dir) {
      Curation.decontamWins(tokens(s, dir).select(col("doc_id"), col("toks")))
    }

  /** Approximate distinct count of q104's TRAIN-split window fps — the
    * bloom SIZING estimate (sizing needs an order of magnitude, not a
    * census: a bloom never false-negatives, and the confirm join removes
    * false positives, so estimate error only moves prefilter selectivity).
    * `approx_count_distinct` partial-aggregates a sketch per partition —
    * no fp-keyed shuffle, unlike `distinct().count()` — and the resulting
    * Long is cached per (session, dir) so it survives `clearCache()` and
    * repeated q104 constructions cost no further jobs. The r10 constant
    * `Curation.DecontamBloomItems` (4 Mi keys → a 4 MB filter whose
    * per-task build/merge dominated q104's idle-run cost) remains only as
    * the documented fallback for ad-hoc frames with no store entry.
    */
  def decontamTrainFpEst(s: SparkSession, dir: String): Long =
    scalars.getOrElseUpdate((s, "decontamTrainFpEst", dir),
      math.max(1L, decontamWins(s, dir).filter(col("bucket") < 90)
        .agg(approx_count_distinct(col("fp")).as("n")).head().getLong(0)))
}
