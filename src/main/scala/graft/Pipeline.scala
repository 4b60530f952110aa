package graft

import graft.operators.{Curation, Layout}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation run — the library's USER-FACING entry: evaluate the
  * q139 funnel gates ONCE, materialize the kept corpus hash-sharded to
  * parquet, and write the two artifacts a production run ships alongside
  * it: the shard manifest (q126's layout contract, computed over exactly
  * the kept corpus) and the per-(lang, source) keep report (q139's
  * rollup from the SAME verdicts — report and corpus cannot disagree).
  *
  * Layout: `outDir/corpus/shard=N/` (Hive-partitioned by the same
  * md5-prefix shard key the manifest describes, so a reader can prune to a
  * shard and the manifest row tells it what it will find),
  * `outDir/manifest/`, `outDir/report/`. Overwrite semantics: a re-run is
  * idempotent (all inputs and the md5 shard key are deterministic).
  *
  * Scale shape: one gate evaluation over the shared tokenized base, one
  * shuffle-free sharded write (the shard key is a narrow projection; files
  * per shard = upstream partitions — at 100 TB you'd `repartition(shard)`
  * first to get one file per shard, traded against the extra exchange),
  * manifest + report each one small aggregate.
  */
object Pipeline {

  /** Counts + artifact paths returned by [[curate]]. */
  final case class CurationRun(docsIn: Long, docsKept: Long, tokensKept: Long,
      corpusPath: String, manifestPath: String, reportPath: String)

  def curate(spark: SparkSession, sfDir: String, outDir: String,
      numShards: Int = 16): CurationRun = {
    val verdicts = Curation.funnelVerdicts(spark, sfDir)
      .persist() // consumed thrice: corpus write, report, counts
    val kept = verdicts.filter(col("kept"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
      .join(Fixtures.documents(spark, sfDir).select(col("doc_id"), col("text")),
        Seq("doc_id"))
    val totals = verdicts.agg(count(lit(1)),
      coalesce(sum(when(col("kept"), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("kept"), col("n_tok")).otherwise(0L)), lit(0L))).head()
    // Layout.shardKey is the ONE copy of the shard formula, so manifest
    // rows describe the written partitions by construction
    val corpusPath = s"$outDir/corpus"
    kept.withColumn("shard", Layout.shardKey(col("doc_id"), numShards))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(corpusPath)
    // manifest from the corpus AS WRITTEN (read back): describes the bytes
    // on disk, and costs a read of the kept corpus instead of a second
    // tokenize of the full-text join. An all-dropped corpus writes no
    // partition files (nothing to infer a schema from), so the empty
    // manifest folds from the empty kept frame instead.
    val manifestPath = s"$outDir/manifest"
    val manifestSrc =
      if (totals.getLong(1) == 0L) kept.select(col("doc_id"), col("text"))
      else spark.read.parquet(corpusPath).select(col("doc_id"), col("text"))
    Layout.shardManifest(manifestSrc, numShards)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath)
    // run parameters ride their own tiny artifact so the audit can never
    // be called with the wrong shard count
    spark.range(1).select(lit(numShards).as("num_shards"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
    val reportPath = s"$outDir/report"
    Curation.funnelRollup(verdicts)
      .write.mode(SaveMode.Overwrite).parquet(reportPath)
    verdicts.unpersist()
    CurationRun(totals.getLong(0), totals.getLong(1), totals.getLong(2),
      corpusPath, manifestPath, reportPath)
  }

  /** Per-epoch result of [[curateEpoch]] — the observability surface of an
    * incremental run: how the corpus-global verdicts MOVED this epoch
    * (retroactive drops are first-class, not silent).
    */
  final case class EpochResult(epochId: Long, docsSeen: Long, docsKept: Long,
      added: Long, removed: Long, changedShards: Seq[Int])

  /** Test-only fault injection: when set, [[curateEpoch]] throws right
    * after its staging commit, BEFORE the corpus overwrite —
    * PipelineIncrSpec uses it to pin the replay contract for the
    * overwrite's destructive window (old shard bytes deleted at job
    * commit, new bytes not yet moved). Never set outside tests.
    */
  @volatile private[graft] var failAfterStaging: Boolean = false

  /** Hash-bucket count of the per-fp count state
    * (`state/fpcnt/epoch=<e>/bucket=pmod(fp, FpBuckets)`). A layout
    * constant: changing it is safe — the stored count rides the pointer
    * map, and a mismatch triggers a compacting re-bucket — but pick it
    * for the deployment (more buckets = finer epoch pruning; at 100 TB
    * thousands, here 64 so fixture batches exercise real pruning).
    */
  private[graft] val FpBuckets = 64

  /** Compact (fold every referenced bucket forward into one epoch) when
    * the pointer map references this many distinct epochs — bounds both
    * the per-epoch state-read fan-out and the dead superseded-bucket
    * copies old epoch dirs accumulate between compactions.
    */
  private[graft] val FpCompactAt = 8

  private def fpBucket(fp: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(fp, lit(FpBuckets.toLong)).cast("int")

  // numShards validated once per (JVM, outDir) against the meta artifact
  private val metaShards =
    scala.collection.concurrent.TrieMap[String, Int]()

  /** One micro-batch epoch of the APPEND-MODE curation pipeline: fold a new
    * chunk of documents into the same corpus/manifest/report artifacts
    * [[curate]] writes in one shot, such that after any number of epochs
    * the artifacts EQUAL a one-shot run over the union (PipelineIncrSpec
    * pins corpus, manifest, and report equality, including across a
    * mid-run restart).
    *
    * Why this is not a per-doc gate: funnel gates 3–4 are corpus-GLOBAL —
    * a later epoch can deliver a smaller doc_id that displaces a bag-dedup
    * keeper, or new window fps that push an accepted doc over the span
    * threshold — so an already-kept document can retroactively flip to
    * dropped. Under append-only delivery those are the ONLY possible
    * flips, and both are MONOTONE (per-bag min doc_id only decreases;
    * per-fp distinct-doc counts only grow; the doc-local gates are fixed
    * at first sight), which is what makes the epoch INCREMENTAL: verdicts
    * are maintained as updatable per-doc state
    * (`(doc_id, lang, source, n_tok, h, bag, bag_keep, n_win, n_dup,
    * kept)` — [[graft.operators.Curation.verdictsFullFrom]]'s schema)
    * plus one per-fp aggregate `(fp, nd)`, and each epoch delta-joins the
    * batch against them instead of re-aggregating every doc ever seen:
    *
    *  - batch-only heavy lifting: tokenize, signals, window fps — O(batch)
    *    shuffles, nothing corpus-keyed;
    *  - re-delivered docs are detected by a broadcast probe of the batch's
    *    ids against the verdict state (scan, no shuffle) and contribute
    *    nothing;
    *  - per-fp counts merge by a broadcast join of the batch's fp tallies
    *    against the previous epoch's `fpcnt` (scan + map-side rewrite);
    *    fps CROSSING the duplicate threshold (nd 1→≥2) come out of that
    *    merge, and the docs they touch come from a broadcast probe of the
    *    batch-keyed window-fp log — shuffle O(touched), not O(corpus);
    *  - keeper displacement comes from a broadcast join of the batch's
    *    per-bag minima against the previous keepers (scan, small output);
    *  - the new verdict set is the old state re-emitted with the touched
    *    flips applied (map-side scan + broadcast joins) plus the batch's
    *    fresh rows — added/removed fall out of the SAME pass (added ⊆ the
    *    batch by monotonicity; removed = previously-kept docs whose flip
    *    landed this epoch), so no corpus-scale exceptAll ever runs.
    *
    * Crash safety follows the commit-marker design: every write is
    * batch/epoch-keyed and deterministic from (base state, batch); the
    * epoch's verdict state is written LAST with its `_SUCCESS` as the
    * commit marker, and a completed epoch short-circuits its own replay
    * via that marker. The one genuinely destructive window — dynamic
    * partition overwrite of the corpus deletes changed shards' old bytes
    * at job commit — is closed by STAGING: the changed shards' full new
    * content lands under `state/staging/epoch=<e>/base=<b>` (keyed by the
    * delta base so a stale attempt's staging can never be replayed
    * against the wrong base) before the corpus overwrite starts, so a
    * crash mid-overwrite replays from staging without re-reading the
    * half-rewritten shards. Staging also removes the old `state/texts`
    * mirror (which duplicated every doc's text forever): by the
    * monotonicity argument every doc the rewrite can need is either in a
    * live shard (carried over) or in the current batch (newly added), so
    * text state is TRANSIENT and bounded by the changed shards.
    *
    * Scale shape: per epoch the shuffled rows are O(batch + touched keys)
    * (PipelineIncrSpec pins this with a task-metrics listener). The
    * token-scale fp-count state is HASH-BUCKETED
    * (`state/fpcnt/epoch=<e>/bucket=<b>` + a tiny per-epoch pointer map):
    * an epoch reads and rewrites only the buckets its batch touches, so
    * unchanged buckets skip even the scan, and a bounded compaction
    * ([[FpCompactAt]]) folds every referenced bucket forward before
    * pointer fan-out or dead superseded copies can grow past about one
    * live-state's worth. The doc-scale verdict state is scanned against
    * broadcast deltas and rewritten map-side each epoch (narrow columnar
    * I/O, no corpus-keyed exchange); the window-fp log (`state/winv`,
    * append-only, batch-keyed) is read only under a broadcast of crossing
    * fps, and not at all in the no-crossing steady state. Driver-side
    * collects stay ≤ max(numShards, FpBuckets) ints. Re-delivered docs
    * (same doc_id in several batches, same text — the at-least-once
    * contract) collapse via the seen-id probe.
    */
  def curateEpoch(batch: DataFrame, outDir: String, numShards: Int,
      epochId: Long): EpochResult = {
    val spark = batch.sparkSession
    val verdictsPath = s"$outDir/state/verdicts"

    // a COMPLETED epoch short-circuits its own replay (the commit marker
    // landed, so every artifact is already applied — only the post-marker
    // cleanup may be outstanding): redo the idempotent cleanup and return
    // the persisted result. Without this, a replay that arrives after the
    // prune (no earlier base left) would treat the whole corpus as one
    // batch-sized delta and lose every non-batch doc from the state.
    if (isCommitted(spark, s"$verdictsPath/epoch=$epochId")) {
      cleanupAfterCommit(spark, outDir, epochId)
      return readEpochResult(spark, outDir, epochId)
    }

    // the shard count is immutable per outDir — PIN it before any write:
    // an epoch called with a different count would silently mix two
    // layouts in one corpus while the audit keeps the founding count.
    // Validated once per (JVM, outDir), so the check costs a 1-row read
    // only on the first epoch after a restart; the meta artifact itself
    // writes once (a crash mid-write leaves a fileless dir, which
    // rewrites).
    metaShards.get(outDir) match {
      case Some(n) => require(n == numShards,
        s"outDir $outDir was founded with numShards=$n; epoch called with $numShards")
      case None =>
        if (hasDataFiles(spark, s"$outDir/meta")) {
          val stored = spark.read.parquet(s"$outDir/meta")
            .head().getAs[Int]("num_shards")
          require(stored == numShards,
            s"outDir $outDir was founded with numShards=$stored; epoch called with $numShards")
        } else
          spark.range(1).select(lit(numShards).as("num_shards"))
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
        metaShards.put(outDir, numShards)
    }

    val docs = batch.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .dropDuplicates("doc_id")
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
      .localCheckpoint() // feeds the signal + window derivations below

    // the batch's window-fp log, appended batch-keyed (overwrite → an
    // at-least-once retry rewrites the same bytes). This is the only
    // token-scale state kept, and it is only ever probed under a
    // broadcast of crossing fps.
    Curation.winFpsOver(base.select(col("doc_id"), col("toks")), Curation.SubWidth)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/state/winv/batch=$epochId")
    val batchWins = spark.read.parquet(s"$outDir/state/winv/batch=$epochId")
    val batchSigs = Curation.docSignals(base)

    // delta base: the newest COMMITTED earlier epoch (marker = _SUCCESS of
    // the verdict-state write; a crashed attempt of THIS epoch is handled
    // by the short-circuit above). Driver FS listing — O(#epochs) names.
    // A base written by the PRE-delta layout (5-column verdicts, no fpcnt)
    // is migrated in place: that layout always carries batch-keyed
    // `state/sigs` + `state/winv`, from which the extended verdict state
    // and the per-fp counts rebuild exactly once (the one-shot formulas),
    // and this epoch then writes the new layout forward.
    val lastCommitted: Option[Long] =
      committedEpochs(spark, verdictsPath).filter(_ < epochId).maxOption
    val vPrev: DataFrame = lastCommitted match {
      case Some(e)
          if spark.read.parquet(s"$verdictsPath/epoch=$e").columns.contains("bag") =>
        spark.read.parquet(s"$verdictsPath/epoch=$e")
      case Some(e) => // legacy layout: rebuild the extended state from sigs
        val sigs = spark.read.parquet(s"$outDir/state/sigs")
          .filter(col("batch") <= e)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_tok"), col("h"), col("bag")).distinct()
        val winv = spark.read.parquet(s"$outDir/state/winv")
          .filter(col("batch") <= e)
          .select(col("doc_id"), col("fp")).distinct()
        Curation.verdictsFullFrom(sigs, winv)
      case None => emptyVerdictState(spark)
    }
    // fp-count base, by layout generation: (a) BUCKETED + pointer map —
    // the steady state; (b) an un-bucketed fpcnt dir (transitional) or
    // (c) no fpcnt at all (pre-delta legacy: rebuild from winv) — both of
    // which force a compacting full fold into the bucketed layout below.
    val emptyFp = spark.range(0).select(col("id").as("fp"), col("id").as("nd"))
    val (fpmapBase: Map[Int, Long], fpmapStoredBuckets: Int) = lastCommitted match {
      case Some(e) if hasDataFiles(spark, s"$outDir/state/fpmap/epoch=$e") =>
        val rows = spark.read.parquet(s"$outDir/state/fpmap/epoch=$e")
          .select(col("bucket"), col("epoch"), col("n_buckets")).collect()
        (rows.map(r => r.getInt(0) -> r.getLong(1)).toMap,
          rows.headOption.map(_.getInt(2)).getOrElse(FpBuckets))
      case _ => (Map.empty[Int, Long], FpBuckets)
    }
    val fullFpBase: Option[DataFrame] = lastCommitted match {
      case _ if fpmapBase.nonEmpty => None
      case Some(e) if hasDataFiles(spark, s"$outDir/state/fpcnt/epoch=$e") =>
        Some(spark.read.parquet(s"$outDir/state/fpcnt/epoch=$e")
          .select(col("fp"), col("nd")))
      case Some(e) =>
        Some(spark.read.parquet(s"$outDir/state/winv")
          .filter(col("batch") <= e)
          .select(col("doc_id"), col("fp")).distinct()
          .groupBy(col("fp")).agg(count(lit(1)).as("nd")))
      case None => None
    }

    // re-delivery: batch ids already in the state contribute nothing new
    // (same doc_id ⇒ same text under the at-least-once contract). The
    // probe broadcasts the BATCH side, so the state is scanned, never
    // shuffled; `seenIds` is ≤ batch-sized.
    val batchIds = docs.select(col("doc_id"))
    val seenIds = vPrev.select(col("doc_id"))
      .join(broadcast(batchIds), Seq("doc_id")).localCheckpoint()
    val newSigs = batchSigs.join(broadcast(seenIds), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val newIds = newSigs.select(col("doc_id"))
    val newWins = batchWins.join(broadcast(seenIds), Seq("doc_id"), "left_anti")

    // per-fp distinct-doc counts: merge the batch's tallies into the
    // BUCKETED fp state. The state is hash-partitioned on pmod(fp,
    // FpBuckets) and an epoch only reads + rewrites the buckets its batch
    // touches (pointer-map pruned; untouched buckets keep their bytes and
    // their pointer) — per-epoch fp I/O is O(touched buckets), not
    // O(all fps). `updated` (batch fps that already existed) and `fresh`
    // (fps first seen this batch) are both ≤ batch-sized.
    val contrib = newWins.groupBy(col("fp")).agg(count(lit(1)).as("add"))
      .withColumn("bucket", fpBucket(col("fp")))
      .localCheckpoint()
    val touched: Seq[Int] = contrib.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    // compaction folds EVERY referenced bucket forward into this epoch:
    // on a layout migration (un-bucketed or winv-rebuilt base, or a
    // changed FpBuckets constant), and whenever the pointer map references
    // more than FpCompactAt epochs — that bound caps both the number of
    // per-epoch state reads and the dead superseded-bucket copies old
    // epochs can accumulate (≲ one live-state's worth between compactions)
    val mustCompact = fullFpBase.isDefined ||
      (fpmapBase.nonEmpty && fpmapStoredBuckets != FpBuckets) ||
      fpmapBase.values.toSet.size >= FpCompactAt
    val fPrevFold: DataFrame = fullFpBase match {
      case Some(full) => full
      case None =>
        // epoch -> buckets to read from it (every bucket from exactly its
        // pointed epoch — a superseded copy in an older epoch dir is dead
        // and must not be read, or its counts would double)
        val wanted = (if (mustCompact) fpmapBase.toSeq
          else fpmapBase.toSeq.filter(t => touched.contains(t._1)))
          .groupBy(_._2).view.mapValues(_.map(_._1)).toSeq
        wanted.map { case (e, buckets) =>
          spark.read.parquet(s"$outDir/state/fpcnt/epoch=$e")
            .filter(col("bucket").isInCollection(buckets))
            .select(col("fp"), col("nd"))
        }.reduceOption(_ unionByName _).getOrElse(emptyFp)
    }
    val updated = fPrevFold.join(broadcast(contrib.select(col("fp"), col("add"))),
      Seq("fp")).localCheckpoint()
    val fresh = contrib.join(broadcast(updated.select(col("fp"))),
      Seq("fp"), "left_anti").select(col("fp"), col("add").as("nd"))
    val fNowFold = fPrevFold
      .join(broadcast(contrib.select(col("fp"), col("add"))), Seq("fp"), "left")
      .select(col("fp"), (col("nd") + coalesce(col("add"), lit(0L))).as("nd"))
      .unionByName(fresh)
      .withColumn("bucket", fpBucket(col("fp")))
    // coalesce before the partitioned write: without it every task holds
    // every touched bucket and the write fans out tasks × buckets small
    // files per epoch. Coalesce (not repartition) keeps the fold
    // SHUFFLE-FREE — a batch that happens to touch every bucket would
    // otherwise re-exchange the whole fp state each epoch, violating the
    // O(batch + touched) shuffle budget the spec pins — at the price of
    // write parallelism 8, ample for the narrow (fp, nd) rows.
    fNowFold.coalesce(8)
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$outDir/state/fpcnt/epoch=$epochId")
    // pointer map forward: untouched buckets keep pointing at their
    // current epoch; touched (or, on compaction, every written) buckets
    // point here. Written with the bucket-count constant so a future
    // constant change is detected and compacts instead of mis-bucketing.
    val fpmapNew: Map[Int, Long] =
      if (mustCompact)
        (if (!hasDataFiles(spark, s"$outDir/state/fpcnt/epoch=$epochId"))
          Map.empty[Int, Long]
        else spark.read.parquet(s"$outDir/state/fpcnt/epoch=$epochId")
          .select(col("bucket")).distinct()
          .collect().map(_.getInt(0) -> epochId).toMap)
      else fpmapBase ++ touched.map(_ -> epochId)
    locally {
      import spark.implicits._
      fpmapNew.toSeq.sortBy(_._1).toDF("bucket", "epoch")
        .withColumn("n_buckets", lit(FpBuckets))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/state/fpmap/epoch=$epochId")
    }

    // fps that CROSSED the duplicate threshold this epoch (an existing
    // doc's window flips non-dup → dup exactly when its fp crosses; a
    // fresh fp's holders are all in the batch and are handled fresh)
    val crossed = updated.filter(col("nd") < 2 && col("nd") + col("add") >= 2)
      .select(col("fp"))
    // Δn_dup for EXISTING docs holding a crossed fp: probe the batch-keyed
    // window log under a broadcast of the crossing set; distinct collapses
    // cross-batch re-deliveries of the same (doc, fp). The log is the one
    // unbounded (token-scale, append-only) state, so the common steady
    // state — an epoch that crosses NOTHING — must not scan it at all:
    // `crossed` is a local filter over the checkpointed batch-sized merge,
    // so the emptiness probe costs no job.
    val dDup =
      if (crossed.isEmpty)
        spark.range(0).select(col("id").as("doc_id"), col("id").as("d_dup"))
      else spark.read.parquet(s"$outDir/state/winv")
        .select(col("doc_id"), col("fp"))
        .join(broadcast(crossed), Seq("fp"))
        .distinct()
        .join(broadcast(newIds), Seq("doc_id"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("d_dup"))
        .localCheckpoint()

    // keeper displacement: batch minima vs the previous keepers (both
    // probes broadcast the batch side; outputs ≤ batch-sized)
    val batchMin = newSigs.groupBy(col("bag")).agg(min(col("doc_id")).as("b_min"))
    val bagMatch = vPrev.filter(col("bag_keep"))
      .select(col("bag"), col("doc_id").as("k_id"))
      .join(broadcast(batchMin), Seq("bag")).localCheckpoint()
    val displaced = bagMatch.filter(col("b_min") < col("k_id"))
      .select(col("k_id").as("doc_id"), lit(true).as("_disp"))

    // assemble the new verdict state: the old state re-emitted with the
    // touched flips applied (scan + broadcast joins, map-side), plus the
    // batch's fresh rows. kept_prev/is_new ride along so added/removed
    // fall out of the same pass.
    val exist = vPrev.withColumnRenamed("kept", "kept_prev")
      .join(broadcast(displaced), Seq("doc_id"), "left")
      .join(broadcast(dDup), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("h"), col("bag"),
        (col("bag_keep") && col("_disp").isNull).as("bag_keep"),
        col("n_win"),
        (col("n_dup") + coalesce(col("d_dup"), lit(0L))).as("n_dup"),
        col("kept_prev"), lit(false).as("is_new"))
    val nWinNew = newWins.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
    val dupFpsB = updated
      .select(col("fp"), (col("nd") + col("add")).as("nd2"))
      .unionByName(fresh.select(col("fp"), col("nd").as("nd2")))
      .filter(col("nd2") >= 2).select(col("fp"))
    val nDupNew = newWins.join(broadcast(dupFpsB), Seq("fp"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("ndp"))
    val freshRows = newSigs
      .join(batchMin, Seq("bag"))
      .join(broadcast(bagMatch.select(col("bag"), col("k_id"))), Seq("bag"), "left")
      .join(nWinNew, Seq("doc_id"), "left")
      .join(nDupNew, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("h"), col("bag"),
        (col("doc_id") === col("b_min") &&
          (col("k_id").isNull || col("b_min") < col("k_id"))).as("bag_keep"),
        coalesce(col("nw"), lit(0L)).as("n_win"),
        coalesce(col("ndp"), lit(0L)).as("n_dup"),
        lit(false).as("kept_prev"), lit(true).as("is_new"))
    val assembled = exist.unionByName(freshRows)
      .withColumn("kept", Curation.keptExpr(col("n_tok"), col("h"),
        col("bag_keep"), Curation.spanDropExpr(col("n_win"), col("n_dup"))))
      .localCheckpoint() // consumed by deltas, corpus, report, marker
    val vNow = assembled.drop("kept_prev", "is_new")

    // added ⊆ the batch (an existing doc can never flip TO kept under
    // append-only monotonicity); removed = previously-kept docs whose
    // displacement or span flip landed this epoch. No corpus-scale
    // exceptAll — both are filters over the assembled pass, and every
    // driver-side number the epoch needs (counts, changed shards, the
    // previous kept-shard set for manifest validation) folds out of ONE
    // aggregation job over the checkpointed blocks — per-epoch job count
    // is part of the fixed overhead a long stream pays every few seconds.
    val isNewKept = col("is_new") && col("kept")
    val isRemovedNow = !col("is_new") && col("kept_prev") && !col("kept")
    val added = assembled.filter(isNewKept)
    val removed = assembled.filter(isRemovedNow).select(col("doc_id"))
    val shardOf = Layout.shardKey(col("doc_id"), numShards)
    val stats = assembled.agg(
      count(lit(1)).as("seen"),
      coalesce(sum(when(col("kept"), 1L).otherwise(0L)), lit(0L)).as("kept"),
      coalesce(sum(when(isNewKept, 1L).otherwise(0L)), lit(0L)).as("added"),
      coalesce(sum(when(isRemovedNow, 1L).otherwise(0L)), lit(0L)).as("removed"),
      collect_set(when(isNewKept || isRemovedNow, shardOf)).as("delta_shards"),
      collect_set(when(!col("is_new") && col("kept_prev"), shardOf))
        .as("prev_shards")).head()
    val deltas: Seq[Int] =
      stats.getAs[scala.collection.Seq[Int]]("delta_shards").toSeq.sorted
    val nAdded = stats.getAs[Long]("added")
    val nRemoved = stats.getAs[Long]("removed")

    // rewrite only the changed shards, via crash-safe STAGING: the full
    // new content of every changed shard lands (atomically, _SUCCESS)
    // under a base-keyed staging dir BEFORE the dynamic overwrite deletes
    // any old bytes — a crash mid-overwrite replays from staging instead
    // of re-reading half-rewritten shards. Carryover text comes from the
    // live shards, added text from the batch: by monotonicity that covers
    // every doc the rewrite can need, so no permanent text mirror exists.
    val corpusPath = s"$outDir/corpus"
    if (deltas.nonEmpty) {
      val stagingRoot = s"$outDir/state/staging/epoch=$epochId"
      val stagingPath = s"$stagingRoot/base=${lastCommitted.getOrElse(-1L)}"
      if (!isCommitted(spark, stagingPath)) {
        deleteDir(spark, stagingRoot) // a stale attempt against another base
        val addedContent = added
          .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
          .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
          .withColumn("shard", Layout.shardKey(col("doc_id"), numShards))
          .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
            col("text"), col("shard"))
        val carry =
          if (hasDataFiles(spark, corpusPath))
            spark.read.parquet(corpusPath)
              .filter(col("shard").isInCollection(deltas))
              .join(broadcast(removed), Seq("doc_id"), "left_anti")
              .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
                col("text"), col("shard"))
          else addedContent.limit(0)
        // staged shard-partitioned: the written shard set falls out of a
        // driver directory listing instead of a distinct-collect job; the
        // shard-keyed repartition keeps the file count at one per changed
        // shard (its exchange moves only the changed shards' content)
        carry.unionByName(addedContent)
          .repartition(col("shard"))
          .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(stagingPath)
      }
      if (failAfterStaging)
        throw new IllegalStateException(
          "graft test failpoint: crash after staging commit")
      val writtenShards: Set[Int] = {
        val p = new org.apache.hadoop.fs.Path(stagingPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fromDirs =
          if (!fs.exists(p)) Set.empty[Int]
          else fs.listStatus(p).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("shard="))
            .map(_.stripPrefix("shard=").toInt).toSet
        // a crashed epoch staged by the pre-partitioned layout holds flat
        // files with shard as a data column — no shard= dirs. Falling
        // through with an empty set would skip the overwrite and then
        // DELETE every changed shard (silent data loss); read the staged
        // shard values instead for that one replay.
        if (fromDirs.nonEmpty || !hasDataFiles(spark, stagingPath)) fromDirs
        else spark.read.parquet(stagingPath).select(col("shard")).distinct()
          .collect().map(_.getInt(0)).toSet
      }
      if (writtenShards.nonEmpty) {
        val newContent = spark.read.parquet(stagingPath)
          .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
            col("text"), col("shard"))
        val mode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try newContent.write.mode(SaveMode.Overwrite)
          .partitionBy("shard").parquet(corpusPath)
        finally mode match {
          case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      // explicitly drop shards whose kept set emptied (dynamic overwrite
      // never touches a partition the output frame doesn't mention)
      deltas.filterNot(writtenShards).foreach { sh =>
        deleteDir(spark, s"$corpusPath/shard=$sh")
      }
    }

    // manifest: carry-over for untouched shards, recompute changed
    // shards from the corpus as re-read (partition-pruned); localCheckpoint
    // decouples the self-overwrite (manifest is both read and rewritten).
    // The carry-over base is validated against the last COMMITTED verdicts
    // (the manifest overwrite is the one non-partitioned artifact a crash
    // can leave partial): its shard set must equal the shards the previous
    // kept set implies — on any mismatch the epoch repairs by recomputing
    // the FULL manifest from the corpus on disk. (The distinct here is on
    // a ≤ numShards-cardinality key, so partial aggregation shrinks the
    // exchange to a few rows per input partition.)
    // (previous kept set read back out of the checkpointed `assembled`
    // pass — kept_prev preserves it row for row — so this costs a local
    // block scan, not a 4th parquet scan of the verdict state)
    val manifestPath = s"$outDir/manifest"
    val prevShards: Set[Int] =
      stats.getAs[scala.collection.Seq[Int]]("prev_shards").toSet
    val storedManifest: Option[DataFrame] =
      // hasDataFiles, not fs.exists: a crash mid-overwrite leaves the dir
      // existing but fileless, and a parquet read on it would throw forever
      if (hasDataFiles(spark, manifestPath))
        Some(spark.read.parquet(manifestPath))
      else None
    val carryOver: Option[DataFrame] = storedManifest.filter { m =>
      m.select(col("shard")).collect().map(_.getInt(0)).toSet == prevShards
    }
    val fullCorpusView =
      if (!hasDataFiles(spark, corpusPath))
        docs.select(col("doc_id"), col("text")).limit(0)
      else spark.read.parquet(corpusPath).select(col("doc_id"), col("text"))
    // a no-change epoch with a validated stored manifest would rewrite
    // byte-identical rows — skip the two jobs
    if (deltas.isEmpty && carryOver.isDefined) ()
    else {
      val manifest = carryOver match {
        case Some(prev) =>
          val changedManifest =
            if (deltas.isEmpty || !hasDataFiles(spark, corpusPath))
              Layout.shardManifest(docs.select(col("doc_id"), col("text")).limit(0),
                numShards)
            else Layout.shardManifest(
              spark.read.parquet(corpusPath)
                .filter(col("shard").isInCollection(deltas))
                .select(col("doc_id"), col("text")), numShards)
          prev.filter(!col("shard").isInCollection(deltas))
            .unionByName(changedManifest)
        case None => // epoch 0, or a crash-corrupted manifest: full recompute
          Layout.shardManifest(fullCorpusView, numShards)
      }
      manifest.orderBy(col("shard")).localCheckpoint()
        .write.mode(SaveMode.Overwrite).parquet(manifestPath)
    }
    // (the meta artifact was validated/written at epoch entry)
    Curation.funnelRollup(vNow)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/report")

    // persist the epoch's result row BEFORE the marker, so a post-commit
    // replay (short-circuit above) can return the identical result (all
    // counts came from the single stats aggregation above)
    val result = EpochResult(epochId, stats.getAs[Long]("seen"),
      stats.getAs[Long]("kept"), nAdded, nRemoved, deltas)
    spark.range(1).select(lit(result.docsSeen).as("docs_seen"),
        lit(result.docsKept).as("docs_kept"), lit(result.added).as("added"),
        lit(result.removed).as("removed"),
        array(deltas.map(lit(_)): _*).cast("array<int>").as("changed_shards"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/state/epochres/epoch=$epochId")

    // commit marker LAST: epoch e's verdict state landing (its _SUCCESS)
    // ⇒ e fully applied (`epoch` stays a directory-only partition key — a
    // data column of the same name would collide with partition discovery)
    vNow.write.mode(SaveMode.Overwrite).parquet(s"$verdictsPath/epoch=$epochId")

    // prune superseded epochs AFTER the marker lands — only the newest
    // committed state is ever a delta base, so state stays O(docs) /
    // O(distinct fps), not × epochs — and drop this epoch's staging (its
    // content is live in the corpus now)
    cleanupAfterCommit(spark, outDir, epochId,
      fpReferenced = Some(fpmapNew.values.toSet))
    result
  }

  /** Post-marker cleanup for a committed epoch — idempotent, re-runnable
    * by a replay that arrives after the marker: drop superseded verdict /
    * fpcnt / epoch-result state and the epoch's transient staging.
    */
  private def cleanupAfterCommit(spark: SparkSession, outDir: String,
      epochId: Long, fpReferenced: Option[Set[Long]] = None): Unit = {
    Seq(s"$outDir/state/verdicts", s"$outDir/state/fpmap",
      s"$outDir/state/epochres").foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("epoch="))
          .filter(_.getName.stripPrefix("epoch=").toLong < epochId)
          .foreach(old => fs.delete(old, true))
    }
    // fpcnt epochs live as long as the CURRENT pointer map references
    // them (a bucket an epoch didn't touch keeps pointing at its older
    // version); only wholly-unreferenced older epochs drop. The normal
    // commit path already holds the map in memory and passes it in; the
    // parquet re-read is only for the replay short-circuit, which has
    // nothing else to go on.
    val referenced: Set[Long] = fpReferenced.getOrElse {
      if (!hasDataFiles(spark, s"$outDir/state/fpmap/epoch=$epochId")) Set.empty
      else spark.read.parquet(s"$outDir/state/fpmap/epoch=$epochId")
        .select(col("epoch")).distinct().collect().map(_.getLong(0)).toSet
    }
    val p = new org.apache.hadoop.fs.Path(s"$outDir/state/fpcnt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("epoch="))
        .filter { d =>
          val e = d.getName.stripPrefix("epoch=").toLong
          e < epochId && !referenced.contains(e)
        }
        .foreach(old => fs.delete(old, true))
    deleteDir(spark, s"$outDir/state/staging")
  }

  /** The persisted result row of a committed epoch (written just before
    * its marker), for the replay short-circuit. Falls back to counts
    * re-derived from the verdict state if the row is missing (state
    * written by a pre-staging layout).
    */
  private def readEpochResult(spark: SparkSession, outDir: String,
      epochId: Long): EpochResult = {
    val path = s"$outDir/state/epochres/epoch=$epochId"
    if (hasDataFiles(spark, path)) {
      val r = spark.read.parquet(path).head()
      EpochResult(epochId, r.getAs[Long]("docs_seen"), r.getAs[Long]("docs_kept"),
        r.getAs[Long]("added"), r.getAs[Long]("removed"),
        r.getAs[scala.collection.Seq[Int]]("changed_shards").toSeq)
    } else {
      val v = spark.read.parquet(s"$outDir/state/verdicts/epoch=$epochId")
      val t = v.agg(count(lit(1)),
        coalesce(sum(when(col("kept"), 1L).otherwise(0L)), lit(0L))).head()
      EpochResult(epochId, t.getLong(0), t.getLong(1), 0L, 0L, Nil)
    }
  }

  /** Epoch ids under `path` whose write fully committed (`_SUCCESS`
    * present — a crash mid-job-commit can leave a partial file set that
    * `hasDataFiles` alone would mistake for a complete state).
    */
  private def committedEpochs(spark: SparkSession, path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
      .filter(e => isCommitted(spark, s"$path/epoch=$e"))
  }

  /** True iff `dir` holds a completed Spark write (`_SUCCESS` marker). */
  private def isCommitted(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Empty frame with [[graft.operators.Curation.verdictsFullFrom]]'s
    * schema — the epoch-0 delta base. Derived THROUGH the producer over
    * empty inputs (only the narrow sigs/winv input contracts are spelled
    * out here), so a schema change in the one-copy formula can never
    * leave this branch emitting a stale shape.
    */
  private def emptyVerdictState(spark: SparkSession): DataFrame =
    Curation.verdictsFullFrom(
      spark.range(0).select(col("id").as("doc_id"), lit("").as("lang"),
        lit("").as("source"), col("id").as("n_tok"), lit(0.0).as("h"),
        lit("").as("bag")),
      spark.range(0).select(col("id").as("doc_id"), col("id").as("fp")))

  /** Attach the incremental pipeline to a document stream with `doc_id`,
    * `lang`, `source`, `text`.
    */
  def startIncremental(docs: org.apache.spark.sql.DataFrame, outDir: String,
      checkpoint: String, numShards: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) { curateEpoch(b, outDir, numShards, id); () }
      }
      .start()

  /** Post-copy/post-migration audit: recompute the shard manifest from the
    * corpus AS ON DISK and diff it against the stored manifest. Returns the
    * mismatching rows `(shard, manifest, actual)` — empty means every
    * shard's doc count, token mass, key range, and order fingerprint still
    * match what the run wrote (the q142 reconciliation idea applied to the
    * corpus layout; lost or corrupted shard files surface as a non-null
    * `manifest` with a null or differing `actual`). The shard count comes
    * from the run's own `meta` artifact, so the audit can never silently
    * re-bucket with the wrong parameter.
    */
  def validateCorpus(spark: SparkSession, outDir: String): org.apache.spark.sql.DataFrame = {
    val numShards = spark.read.parquet(s"$outDir/meta")
      .head().getAs[Int]("num_shards")
    val fields = Seq("n_docs", "n_tokens", "first_key", "last_key", "order_fp")
    val stored = spark.read.parquet(s"$outDir/manifest").as("m")
    // an all-dropped run writes NO partition files (curate's own manifest
    // special case) — schema inference on the bare dir would throw, so the
    // 'actual' side folds from an empty frame instead. Decided by what's ON
    // DISK, not by the stored manifest: a nonempty manifest over a fileless
    // corpus must still surface as mismatches (stored vs null), never
    // rubber-stamp as empty≡empty.
    val corpusOnDisk = hasDataFiles(spark, s"$outDir/corpus")
    val corpusView =
      if (corpusOnDisk)
        spark.read.parquet(s"$outDir/corpus").select(col("doc_id"), col("text"))
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
    val actual = Layout.shardManifest(corpusView, numShards).as("a")
    val mSide = struct(fields.map(f => col(s"m.$f").as(f)): _*)
    val aSide = struct(fields.map(f => col(s"a.$f").as(f)): _*)
    stored.join(actual, Seq("shard"), "full_outer")
      .select(col("shard"), mSide.as("manifest"), aSide.as("actual"))
      .filter(!(col("manifest") <=> col("actual")))
      .orderBy(col("shard"))
  }

  /** True iff `dir` holds at least one data file Spark's reader would see
    * — the "did this write land any parquet" probe behind
    * [[validateCorpus]] and [[curateEpoch]]'s crash-recovery reads. Every
    * path SEGMENT below `dir` must be non-hidden: a part file under a
    * crash-stranded `_temporary/` subtree is invisible to the file index
    * (so counting it would send a read straight into the schema-inference
    * throw this probe exists to prevent).
    */
  private[graft] def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    if (!fs.exists(root)) return false
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      var cur = it.next().getPath
      var hidden = false
      while (cur != null && cur.depth() > root.depth()) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) hidden = true
        cur = cur.getParent
      }
      if (!hidden) return true
    }
    false
  }
}
