package graft

import graft.operators.{Curation, Layout}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  * Optional DECONTAMINATION gate: pass `benchmark` (a small `(doc_id,
  * text)` eval-set frame) and any corpus doc sharing at least one
  * width-[[graft.operators.Curation.DecontamWidth]] token window with it
  * is dropped (q104's oracle-verified window formula reduced to the
  * binary `n_hit >= 1` gate), and the report gains a `docs_contaminated`
  * column. The flag is doc-local given a fixed benchmark, so the
  * incremental epochs fold it with the same monotonicity argument as the
  * other gates; the benchmark must stay FIXED for the life of an
  * incremental outDir (pinned by a fingerprint in the meta artifact,
  * like `numShards`).
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
      numShards: Int = 16, benchmark: Option[DataFrame] = None): CurationRun = {
    val gate = benchmark.isDefined
    // the benchmark's window fps, derived ONCE (checkpointed — both the
    // contamination probe and the meta signature consume them, and each
    // is its own action)
    val benchFps = benchmark.map(b => Curation.benchmarkFps(b).localCheckpoint())
    val vBase = benchFps match {
      case None => Curation.funnelVerdicts(spark, sfDir)
        .withColumn("contam", lit(false))
      case Some(fps) =>
        // contamination is corpus-scale on the left (every doc can carry
        // the flag), so the flag joins by a plain left join — only the
        // benchmark side is broadcast (inside contaminatedOf)
        Curation.funnelVerdicts(spark, sfDir)
          .join(Curation.contaminatedOf(
              Curation.winFpsOver(graft.operators.SignalStore.tokens(spark, sfDir),
                Curation.DecontamWidth), fps)
            .withColumn("contam", lit(true)), Seq("doc_id"), "left")
          .withColumn("contam", coalesce(col("contam"), lit(false)))
    }
    val verdicts = vBase
      .withColumn("kept", Curation.contamKept(col("kept"), col("contam")))
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
    // be called with the wrong shard count (or a drifted benchmark)
    val sig = benchFps.map(benchSig).getOrElse((0L, 0L))
    writeMeta(spark, outDir, numShards, sig, gate)
    // keep the in-JVM parameter cache coherent with the meta just
    // written: without this, a same-JVM wipe-and-refound through curate()
    // would leave a later curateEpoch validating against the PREVIOUS
    // deployment's cached parameters instead of the disk's
    metaCache.put(outDir, (numShards, gate, sig._1, sig._2))
    val reportPath = s"$outDir/report"
    Curation.funnelRollupEx(verdicts, withContam = gate)
      .write.mode(SaveMode.Overwrite).parquet(reportPath)
    verdicts.unpersist()
    CurationRun(totals.getLong(0), totals.getLong(1), totals.getLong(2),
      corpusPath, manifestPath, reportPath)
  }

  /** Per-epoch result of [[curateEpoch]] — the observability surface of an
    * incremental run: how the corpus-global verdicts MOVED this epoch
    * (retroactive drops are first-class, not silent). A replay of an
    * epoch committed by the PRE-staging layout (which never persisted its
    * deltas) reports correct totals but ZEROED `added`/`removed`/
    * `changedShards` — see [[readEpochResult]].
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

  /** Test-only fault injection: throw right after the corpus overwrite,
    * BEFORE the commit marker — the window where the corpus is already
    * mutated but the epoch is uncommitted. PipelineIncrSpec uses it to
    * pin that a stream restart replays the batch under the SAME epoch id
    * (the self-stabilizing offset), reusing the committed staging
    * instead of re-deriving it from the mutated corpus.
    */
  @volatile private[graft] var failAfterApply: Boolean = false

  /** Test seam: when set, epochs await this barrier right after entering
    * the AQE scope, so a spec can force two concurrent epochs to overlap
    * deterministically (the interleaving the scope's depth counter
    * exists for would otherwise depend on scheduling luck).
    */
  @volatile private[graft] var testEpochBarrier
      : Option[java.util.concurrent.CyclicBarrier] = None

  /** Hash-bucket count of the per-fp count state
    * (`state/fpcnt/epoch=<e>/bucket=pmod(fp, FpBuckets)`). A layout
    * constant: changing it is safe — the stored count rides the commit
    * artifact's pointer rows, and a mismatch triggers a compacting
    * re-bucket — but pick it for the deployment (more buckets = finer
    * epoch pruning; at 100 TB thousands, here 64 so fixture batches
    * exercise real pruning).
    */
  private[graft] val FpBuckets = 64

  /** Hash-bucket count of the doc-scale verdict state
    * (`state/vbkt/epoch=<e>/bucket=pmod(xxhash64(doc_id), VBuckets)`).
    * Same contract as [[FpBuckets]]: a layout constant with a compacting
    * migration on change; an epoch reads and rewrites only the buckets
    * holding its batch's docs plus the docs its deltas flip, so verdict
    * I/O is batch-bound, not corpus-bound.
    */
  private[graft] val VBuckets = 64

  /** Per-BUCKET layer fan-out bound of the bucketed state families:
    * the rolling fold ([[rollSet]]) keeps every bucket's pointer list at
    * ≤ this many layers by folding a bucket slice each epoch (no
    * all-at-once compaction cliff), which also bounds the dead
    * superseded rows old layers accumulate. Doubles as the window-log
    * chunk-fold trigger (fold the flat tails once this many accumulate).
    */
  private[graft] val FpCompactAt = 8

  /** Broadcast gate for the fp-scale epoch probes (`contrib` and frames
    * derived from it: `updated`, `fresh`, `crossed`, `dupFpsB`). These
    * are one row per DISTINCT WINDOW FP in the batch — batch-bound but
    * token-scale, so a founding/backfill epoch can push GBs through a
    * forced broadcast (driver OOM / 8 GB cap). Above this row count the
    * epoch falls back to plain shuffle joins for those probes: an
    * oversized batch pays an O(batch + touched-bucket) exchange instead
    * of an OOM. Doc-scale probes (seen ids, displaced keepers, crossing
    * docs) stay broadcast — they are bounded by the micro-batch's doc
    * count, which the epoch contract caps (a stream trigger sizes its
    * batches; a backfill that cannot should call [[curate]] instead).
    * `var` so specs can force the fallback path.
    *
    * Deployment knob: the 4 Mi default assumes executors comfortably hold
    * a few-hundred-MB broadcast (right for this box's 128 GiB / 32
    * threads). Override per process with `SPARK_GRAFT_FP_BCAST_MAX_ROWS`
    * — smaller on memory-tight clusters (forcing the shuffle fallback
    * earlier), larger where driver/executor memory allows.
    */
  @volatile private[graft] var FpBroadcastMaxRows: Long =
    sys.env.get("SPARK_GRAFT_FP_BCAST_MAX_ROWS").map { v =>
      // parsed here in the object initializer: a bare .toLong would
      // surface as ExceptionInInitializerError with no hint of the cause
      require(v.nonEmpty && v.length <= 18 && v.forall(_.isDigit),
        s"SPARK_GRAFT_FP_BCAST_MAX_ROWS must be a plain row count " +
          s"(≤ 18 digits), got '$v'")
      v.toLong
    }.getOrElse(4L << 20)

  private def fpBucket(fp: Column): Column =
    pmod(fp, lit(FpBuckets.toLong)).cast("int")

  /** Verdict-state bucket of a doc id — hashed (not `pmod(doc_id, …)`)
    * so sequential or skewed id schemes still spread evenly.
    */
  private def vBucket(id: Column): Column =
    pmod(xxhash64(id), lit(VBuckets.toLong)).cast("int")

  /** Hash-bucket count of the bag-keyed keeper side-state
    * (`state/kbkt`, rows `(bag, keeper)`): the current bag-dedup keeper
    * per distinct bag, maintained so the displacement probe reads only
    * the buckets of the batch's bags instead of scanning every verdict
    * layer (the last O(corpus-docs) read a steady epoch used to pay).
    * Same layout contract as [[VBuckets]].
    */
  private[graft] val KBuckets = 64

  private def kBucket(bag: Column): Column =
    pmod(xxhash64(bag), lit(KBuckets.toLong)).cast("int")

  /** Append `epochId` to each touched bucket's layer list — the ONE copy
    * of the pointer-forward rule shared by the bucketed state families.
    */
  private def appendPtr(base: Map[Int, Seq[Long]], touched: Iterable[Int],
      epochId: Long): Map[Int, Seq[Long]] =
    base ++ touched.map(b =>
      b -> (base.getOrElse(b, Seq.empty) :+ epochId))

  /** The three bucketed families take rolling-fold turns — ONE fold
    * write per epoch instead of three, because a fold's cost at tail
    * scale is mostly fixed (a partitioned write's file fan-out + job
    * round-trips), not bandwidth. A family also folds OUT of turn when
    * any of its buckets hits the hard fan-out bound (a starvation
    * backstop for heartbeat-aligned streams whose real epochs land on a
    * fixed residue).
    */
  private[graft] val RollFamilies = Seq("fpcnt", "vbkt", "kbkt")
  private def rollTurn(fam: String, epochId: Long,
      ptr: Map[Int, Seq[Long]]): Boolean =
    RollFamilies(((epochId % 3) + 3).toInt % 3) == fam ||
      ptr.values.exists(_.size >= FpCompactAt)

  /** ROLLING-compaction bucket selection: the k longest layer lists
    * (k = half the buckets — each family folds every third epoch, see
    * [[rollTurn]], so covering all buckets within the FpCompactAt - 2
    * epoch budget takes two turns; only lists of ≥ 3 layers are worth
    * folding), plus every bucket at the hard bound. Called on the
    * pointer map AFTER this epoch's delta append; a pure function of it,
    * so a crash replay folds the same set. With uniform touching the
    * selection rotates through all buckets in ~6 epochs, keeping every
    * bucket's fan-out ≤ FpCompactAt while amortized fold bandwidth stays
    * the same ~state/(FpCompactAt - 2) per epoch the old
    * all-buckets-at-once compaction cliff paid in one periodic 2× spike.
    * Skewed streams self-target: lists only grow for touched buckets, so
    * the longest-list rule folds exactly the hot ones.
    */
  private[graft] def rollSet(ptr: Map[Int, Seq[Long]], nBuckets: Int)
      : Set[Int] = {
    val k = math.max(1, (nBuckets + 1) / 2)
    val cands = ptr.toSeq.filter(_._2.size >= 3)
      .sortBy { case (b, es) => (-es.size, b) }
    (cands.take(k) ++ cands.filter(_._2.size >= FpCompactAt))
      .map(_._1).toSet
  }

  /** Write the rolling fold of `fam`: `merged(rolled)` (the family's
    * merged view of the rolled buckets, INCLUDING this epoch's
    * just-written delta, with its `bucket` column) lands bucket=-
    * partitioned under `fold=<epochId>`, and the rolled buckets' pointer
    * lists reset to the fold alone (encoded as the NEGATIVE id; see
    * [[layerPath]]). Write parallelism is sized from the driver-listed
    * byte size of the layers the rolled buckets reference (an
    * overestimate — layers hold other buckets too — but the right order
    * of magnitude, and free FS metadata).
    */
  private def rollFamily(spark: SparkSession, outDir: String, fam: String,
      ptr: Map[Int, Seq[Long]], nBuckets: Int, epochId: Long,
      merged: Set[Int] => DataFrame): Map[Int, Seq[Long]] = {
    val rolled = rollSet(ptr, nBuckets)
    if (rolled.isEmpty) ptr
    else {
      val refBytes = ptr.view.filterKeys(rolled).values.flatten.toSet
        .iterator.map((id: Long) =>
          dirBytes(spark, layerPath(outDir, fam, id))).sum
      val parts = math.min(8L, 1L + refBytes / (256L << 20)).toInt
      val foldDir = s"$outDir/state/$fam/fold=$epochId"
      merged(rolled).coalesce(parts)
        .write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(foldDir)
      // only buckets the fold actually wrote re-point (a rolled bucket
      // whose merged rows emptied — possible for keepers only in theory —
      // keeps no pointer at all); the rest of the rolled set drops to
      // empty lists rather than dangling at a fold without rows
      val written = listPartitionInts(spark, foldDir, "bucket=")
      ptr ++ rolled.map(b =>
        b -> (if (written(b)) Seq(-epochId) else Seq.empty[Long]))
    }
  }

  // numShards + benchmark (gate flag, fp signature) validated once per
  // (JVM, outDir) against the meta artifact; the DISK stays the
  // authority (see the re-validation note in curateEpoch)
  private val metaCache =
    scala.collection.concurrent.TrieMap[String, (Int, Boolean, Long, Long)]()

  // the benchmark's checkpointed window-fp frame + signature, cached per
  // (JVM, outDir) for the SAME frame object only (identity, not
  // semantics — a different frame must recompute so benchmark drift
  // still reaches the meta check): (frame passed in, its fps, its sig).
  // Bounded: entries pin checkpointed executor blocks (freed by the
  // ContextCleaner once unreferenced), so a long-lived driver cycling
  // many outDirs must not accumulate one forever-live frame per dir.
  private[graft] val benchCache =
    scala.collection.concurrent.TrieMap[String, (DataFrame, DataFrame, (Long, Long))]()
  private val BenchCacheMax = 16
  private def benchCachePut(outDir: String,
      v: (DataFrame, DataFrame, (Long, Long))): Unit = {
    while (benchCache.size >= BenchCacheMax)
      benchCache.keys.find(_ != outDir) match {
        case Some(k) => benchCache.remove(k)
        case None => return
      }
    benchCache.put(outDir, v)
    ()
  }

  /** One row of the per-epoch commit artifact `state/commit/epoch=<e>` —
    * ALL of an epoch's driver-scale state in one parquet write, which is
    * also the epoch's COMMIT MARKER (written last):
    * `kind='fp'|'v'`: pointer rows of the fp-count / verdict DELTA LOGS
    * (one row per (bucket, contributing epoch) — a bucket's current value
    * is the MERGE of every pointed epoch's rows for it: counts sum for
    * 'fp', newest row wins for 'v');
    * `kind='roll'`: the cumulative per-(lang, source) report rollup;
    * `kind='shard'`: per-shard kept-doc counts (manifest validation);
    * `kind='res'`: the epoch's [[EpochResult]] row.
    * Folding the report and shard counts forward here is what removes
    * the last O(corpus) per-epoch aggregation: deltas come from the
    * touched rows only, and the cumulative values ride this artifact.
    */
  private[graft] final case class CommitRow(kind: String,
      bucket: Option[Int] = None, epoch: Option[Long] = None,
      n_buckets: Option[Int] = None,
      lang: Option[String] = None, source: Option[String] = None,
      docs_in: Option[Long] = None, docs_kept: Option[Long] = None,
      tokens_kept: Option[Long] = None, docs_contam: Option[Long] = None,
      shard: Option[Int] = None, n_kept: Option[Long] = None,
      docs_seen: Option[Long] = None, added: Option[Long] = None,
      removed: Option[Long] = None, changed_shards: Option[Seq[Int]] = None,
      // 'rg' rows only: the regate's benchmark fingerprint, so a replay
      // can verify it carries the SAME benchmark the committed regate
      // flagged state against before re-pinning the meta (absent on
      // every other kind; reads of commits written before these columns
      // existed resolve them as None)
      bench_n: Option[Long] = None, bench_x: Option[Long] = None)

  private[graft] final case class RollRow(lang: String, source: String,
      docsIn: Long, docsKept: Long, tokensKept: Long, docsContam: Long)

  /** In-memory image of a committed epoch's commit artifact. The pointer
    * maps are DELTA LOGS: `bucket -> every layer holding live rows for
    * it` (layer id: positive e = the `epoch=e` dir — a tail delta, or the
    * founding/migration full copy; negative -e = the `fold=e` dir — a
    * rolling-compaction full copy of a bucket subset written at epoch e).
    * `kPtr` is the bag-keyed keeper side-state's map (empty on states
    * committed before the family existed — the next epoch migrates).
    * `wvFolded`: window-log batches ≤ this id are folded into bucketed
    * chunk dirs (-1 = none; pre-chunk artifacts read back as -1).
    * `wvChunks`: the LIVE chunk dirs — explicit liveness, so a chunk
    * written by a crashed epoch whose batch later re-processed under a
    * different id (replaced checkpoint) is an orphan cleanup deletes,
    * never a silent duplicate in every crossing read.
    */
  private[graft] final case class EpochState(
      fpPtr: Map[Int, Seq[Long]], fpNB: Int,
      vPtr: Map[Int, Seq[Long]], vNB: Int,
      rollup: Map[(String, String), RollRow],
      shardKept: Map[Int, Long],
      kPtr: Map[Int, Seq[Long]] = Map.empty, kNB: Int = KBuckets,
      wvFolded: Long = -1L, wvChunks: Seq[Long] = Nil,
      // gate-revision logs (gate-on dirs only), same fold/liveness shape
      // as the window log: `wcFolded`/`qFolded` = winc / quar flat
      // batches ≤ this id are folded into a chunk; `wcChunks`/`qChunks`
      // = the LIVE `state/wincc|quarc/chunk=` dirs
      wcFolded: Long = -1L, wcChunks: Seq[Long] = Nil,
      qFolded: Long = -1L, qChunks: Seq[Long] = Nil,
      // fpcnt buckets whose head fold holds UNMERGED rows (≤ 2 per fp:
      // the previous head's row + one summed delta row) — written by a
      // UNION fold, which skips the state-scale sum-merge exchange; such
      // a bucket's next fold MUST merge, so rows-per-fp stays ≤ 2 and
      // roughly half of every fold's slice pays the exchange
      fpUnion: Set[Int] = Set.empty) {
    def docsSeen: Long = rollup.values.map(_.docsIn).sum
    def docsKept: Long = rollup.values.map(_.docsKept).sum
  }

  // steady-state epochs skip the commit-artifact read: the previous
  // epoch's state is cached per (JVM, outDir), keyed by the epoch id it
  // describes — a cache entry is only trusted when the DISK's newest
  // committed epoch matches it
  private val stateCache =
    scala.collection.concurrent.TrieMap[String, (Long, EpochState)]()

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
    * per-fp distinct-doc counts only grow; the doc-local gates — including
    * the optional benchmark-contamination gate — are fixed at first
    * sight), which is what makes the epoch INCREMENTAL: verdicts are
    * maintained as updatable per-doc state
    * (`(doc_id, lang, source, n_tok, h, bag, bag_keep, n_win, n_dup,
    * contam, kept)`) plus one per-fp aggregate `(fp, nd)`, and each epoch
    * delta-joins the batch against them instead of re-aggregating every
    * doc ever seen:
    *
    *  - batch-only heavy lifting: tokenize, signals, window fps — O(batch)
    *    shuffles, nothing corpus-keyed;
    *  - re-delivered docs are detected by a broadcast probe of the batch's
    *    ids against the verdict state (bucket-PRUNED scan, no shuffle) and
    *    contribute nothing; a batch with NO new docs short-circuits to the
    *    commit write (the steady-state heartbeat epoch costs a handful of
    *    batch-local jobs);
    *  - per-fp counts merge by a (size-gated, see [[FpBroadcastMaxRows]])
    *    broadcast join of the batch's fp tallies against the previous
    *    epoch's `fpcnt` buckets (scan + map-side rewrite); fps CROSSING
    *    the duplicate threshold (nd 1→≥2) come out of that merge, and the
    *    docs they touch come from a broadcast probe of the batch-keyed
    *    window-fp log — shuffle O(touched), not O(corpus);
    *  - keeper displacement comes from a broadcast join of the batch's
    *    per-bag minima against the bag-keyed keeper side-state
    *    (`state/kbkt`, `bag -> keeper`, bucketed by `pmod(xxhash64(bag),
    *    KBuckets)`) — read pruned to the batch's bag buckets, maintained
    *    by a ≤ batch-bag-scale delta per epoch, so no epoch scans the
    *    verdict layers for keepers;
    *  - the new verdict rows are ONLY the touched buckets' rows re-emitted
    *    with the flips applied (map-side scan + broadcast joins) plus the
    *    batch's fresh rows — added/removed fall out of the SAME pass
    *    (added ⊆ the batch by monotonicity; removed = previously-kept docs
    *    whose flip landed this epoch), and the per-(lang, source) report
    *    rollup and per-shard kept counts fold FORWARD from those deltas
    *    (two tiny aggregations over the touched rows; the cumulative
    *    values ride the commit artifact) — no corpus-scale aggregation,
    *    write, or exceptAll ever runs.
    *
    * Crash safety follows the commit-marker design: every write is
    * batch/epoch-keyed and deterministic from (base state, batch); the
    * epoch's COMMIT ARTIFACT (`state/commit/epoch=<e>` — both pointer
    * maps, the cumulative rollup, shard counts, and the result row in one
    * tiny parquet) is written LAST and its `_SUCCESS` is the commit
    * marker; a completed epoch short-circuits its own replay via that
    * marker. The one genuinely destructive window — dynamic partition
    * overwrite of the corpus deletes changed shards' old bytes at job
    * commit — is closed by STAGING: the changed shards' full new content
    * lands under `state/staging/epoch=<e>/base=<b>` (keyed by the delta
    * base so a stale attempt's staging can never be replayed against the
    * wrong base) before the corpus overwrite starts, so a crash
    * mid-overwrite replays from staging without re-reading the
    * half-rewritten shards. Text state is TRANSIENT and bounded by the
    * changed shards: by the monotonicity argument every doc a rewrite can
    * need is either in a live shard (carried over) or in the current
    * batch (newly added).
    *
    * Scale shape: per epoch the shuffled rows are O(batch + touched keys)
    * (PipelineIncrSpec pins this with a task-metrics listener) and the
    * state WRITE volume is O(batch + flipped docs), not O(corpus) —
    * even when the batch's keys saturate every hash bucket. Both
    * token-scale (`state/fpcnt`) and doc-scale (`state/vbkt`) state are
    * DELTA LOGS over hash buckets: an epoch APPENDS only its own rows
    * (the batch's fp tallies; the fresh + flipped verdict rows) as a new
    * epoch layer, the commit artifact's pointer rows record which epochs
    * hold live rows per bucket, and readers MERGE the pointed layers
    * (counts sum for fps; the newest row wins per doc, resolved by
    * broadcast anti-joins of the batch-scale newer layers against the
    * one full base copy — shuffle-free). A ROLLING compaction
    * ([[rollSet]]) folds a rotating bucket slice each epoch into a
    * `fold=` layer, keeping every bucket's fan-out ≤ [[FpCompactAt]] —
    * the same amortized O(state / interval) bandwidth an all-at-once
    * compaction would pay, but smooth: no periodic 2× epoch (full
    * compactions remain only for layout migrations). This is the LSM
    * shape: without it, a
    * micro-batch whose fps touch every bucket (any realistic batch does
    * — B distinct fps saturate K << B buckets) would force an O(state)
    * rewrite per epoch no matter how fine the bucketing. EVERY state
    * read is bucket-pruned (seen-ids, flip rows, the keeper probe, the
    * per-fp prior-count probe) — O(touched-bucket bytes) columnar, the
    * parquet-state analogue of the point lookups a KV state store (the
    * streaming twin's RocksDB) would serve. The
    * window-fp log (`state/winv`, append-only, batch-keyed) is read only
    * under a broadcast of crossing fps, and not at all in the
    * no-crossing steady state. Driver-side collects stay ≤ max(numShards,
    * FpBuckets, VBuckets, |lang×source| — the report's own reviewable
    * cardinality) rows. Re-delivered docs (same doc_id in several
    * batches, same text — the at-least-once contract) collapse via the
    * seen-id probe.
    *
    * With `benchmark` set, fresh docs additionally carry the q104
    * contamination flag (window-fp intersection with the benchmark,
    * evaluated ONCE at first sight — doc-local and fixed, so the
    * monotonicity argument is unchanged) and the report gains
    * `docs_contaminated`. The benchmark is pinned by a fingerprint in
    * the meta artifact: an epoch called with a different benchmark (or
    * with the gate toggled) fails loudly instead of silently mixing two
    * gate regimes in one corpus.
    */
  def curateEpoch(batch: DataFrame, outDir: String, numShards: Int,
      epochId: Long, benchmark: Option[DataFrame] = None): EpochResult = {
    // AQE off for the epoch's scope: every epoch plan is already
    // explicitly shaped — size-gated broadcast probes, coalesce'd layer
    // writes, batch-scale shuffles — so AQE's only observable effect
    // here is materializing each query stage as its own job, which at
    // tail-batch scale was ~30 extra driver round-trips (~1.5 s) of
    // pure fixed overhead per epoch. Skew/coalescing never kick in on
    // these shapes (measured: plans and shuffle-record counts identical
    // either way), and the founding epoch's heavy lifting is bounded by
    // the same explicit shapes. Scope boundary: startIncremental's
    // foreachBatch hands each batch a CLONED session with isolated conf,
    // so production streams never see this toggle; only ad-hoc queries
    // sharing a session with DIRECT curateEpoch calls plan inside the
    // epoch's AQE-off window.
    // Reentrancy-safe per SESSION (concurrent epochs of different
    // outDirs may share one session): only the first epoch in saves
    // the prior value and sets false, only the last one out restores —
    // a naive save/restore pair could interleave as save(true),
    // save(false), restore(true), restore(false) and leave AQE off for
    // the session permanently.
    val spark = batch.sparkSession
    aqeScope.synchronized {
      val (depth, saved) = aqeScope.getOrElse(spark, (0,
        spark.conf.getOption("spark.sql.adaptive.enabled")))
      aqeScope.put(spark, (depth + 1, saved))
      if (depth == 0) spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
    try {
      testEpochBarrier.foreach(
        _.await(60, java.util.concurrent.TimeUnit.SECONDS))
      curateEpochBody(batch, outDir, numShards, epochId, benchmark)
    } finally aqeScope.synchronized {
      val (depth, saved) = aqeScope(spark)
      if (depth > 1) aqeScope.put(spark, (depth - 1, saved))
      else {
        aqeScope.remove(spark)
        saved match {
          case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
          case None => spark.conf.unset("spark.sql.adaptive.enabled")
        }
      }
    }
  }

  // session -> (active curateEpoch count, AQE value to restore at 0)
  private val aqeScope =
    scala.collection.mutable.Map[SparkSession, (Int, Option[String])]()

  private def curateEpochBody(batch: DataFrame, outDir: String,
      numShards: Int, epochId: Long, benchmark: Option[DataFrame])
      : EpochResult = {
    val spark = batch.sparkSession
    val commitDir = s"$outDir/state/commit"
    val legacyVerdicts = s"$outDir/state/verdicts"

    // a COMPLETED epoch short-circuits its own replay (the commit marker
    // landed, so every artifact is already applied — only the post-marker
    // cleanup may be outstanding): redo the idempotent cleanup and return
    // the persisted result. Without this, a replay that arrives after the
    // prune (no earlier base left) would treat the whole corpus as one
    // batch-sized delta and lose every non-batch doc from the state.
    if (isCommitted(spark, s"$commitDir/epoch=$epochId") ||
        isCommitted(spark, s"$legacyVerdicts/epoch=$epochId")) {
      cleanupAfterCommit(spark, outDir, epochId, None)
      return readEpochResult(spark, outDir, epochId)
    }

    // the benchmark's window-fp set: used for the meta fingerprint AND
    // the fresh-doc contamination probe (gate-on epochs only). The
    // benchmark is pinned immutable for the life of the outDir, so its
    // fps + signature are cached per (JVM, outDir) — but ONLY for the
    // same frame OBJECT (the startIncremental loop passes one reference
    // per run): a different frame recomputes, so in-JVM benchmark drift
    // still reaches the meta check below instead of hiding behind the
    // cache. Steady-state epochs thus pay zero benchmark-scale jobs.
    val gateOn = benchmark.isDefined
    // fps and sig resolve from ONE cache tuple: re-indexing the shared map
    // after the put was a TOCTOU race — with many concurrent gate-on
    // outDirs, a sibling epoch's put can evict THIS outDir's entry (the
    // cache holds 16) between the put and a second lookup
    val (benchFps: Option[DataFrame], sig: (Long, Long)) = benchmark match {
      case None => (None, (0L, 0L))
      case Some(b) =>
        val entry = benchCache.get(outDir) match {
          case Some(e) if e._1 eq b => e
          case _ =>
            val fps = Curation.benchmarkFps(b).localCheckpoint()
            val e = (b, fps, benchSig(fps))
            benchCachePut(outDir, e)
            e
        }
        (Some(entry._2), entry._3)
    }

    // the shard count and benchmark are immutable per outDir — PIN both
    // before any write: an epoch called with a different shard count
    // would silently mix two layouts in one corpus while the audit keeps
    // the founding count, and a drifted benchmark would break the
    // fixed-at-first-sight monotonicity of the contamination flag.
    // The gate FLAG is pinned separately from the fp fingerprint: a
    // benchmark with zero window fps signs (0, 0) — identical to
    // gate-off — so the flag alone is what keeps a fp-less benchmark
    // from silently toggling the report shape between epochs.
    // Validated once per (JVM, outDir), so the check costs a 1-row read
    // only on the first epoch after a restart; the meta artifact itself
    // writes once (a crash mid-write leaves a fileless dir, which
    // rewrites). The JVM-lifetime cache yields to the DISK whenever the
    // meta artifact has no data files: an outDir wiped and re-founded in
    // the same JVM must found cleanly with its new parameters, not fail
    // against the stale cached ones (the per-epoch listing of the 1-file
    // meta dir is the price of that correctness).
    val metaLive = hasDataFiles(spark, s"$outDir/meta")
    def requireMeta(stored: (Int, Boolean, Long, Long)): Unit = {
      require(stored._1 == numShards,
        s"outDir $outDir was founded with numShards=${stored._1}; " +
          s"epoch called with $numShards")
      require(stored._2 == gateOn && (stored._3, stored._4) == sig,
        s"outDir $outDir was founded with benchmark " +
          s"(gate=${stored._2}, fingerprint (${stored._3}, ${stored._4})); " +
          s"epoch called with (gate=$gateOn, $sig) — the decontamination " +
          "benchmark must stay fixed for the life of an incremental " +
          "outDir (gate toggles included)")
    }
    metaCache.get(outDir) match {
      case Some(st) if metaLive => requireMeta(st)
      case _ =>
        if (metaLive) {
          val r = spark.read.parquet(s"$outDir/meta").head()
          val storedN =
            if (r.schema.fieldNames.contains("bench_n"))
              r.getAs[Long]("bench_n") else 0L
          val storedX =
            if (r.schema.fieldNames.contains("bench_x"))
              r.getAs[Long]("bench_x") else 0L
          // metas written before the explicit flag: gate-on iff the
          // fingerprint is nonzero (a fp-less benchmark was
          // indistinguishable from gate-off under that layout anyway)
          val storedOn =
            if (r.schema.fieldNames.contains("bench_on"))
              r.getAs[Boolean]("bench_on")
            else (storedN, storedX) != (0L, 0L)
          requireMeta((r.getAs[Int]("num_shards"), storedOn, storedN, storedX))
        } else writeMeta(spark, outDir, numShards, sig, gateOn)
        metaCache.put(outDir, (numShards, gateOn, sig._1, sig._2))
    }

    val docs = batch.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .dropDuplicates("doc_id")
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
      .localCheckpoint() // feeds the signal + window derivations below

    // delta base: the newest COMMITTED earlier epoch (marker = the commit
    // artifact's _SUCCESS, or the legacy verdict-state _SUCCESS for bases
    // written by earlier layouts; a crashed attempt of THIS epoch is
    // handled by the short-circuit above). Driver FS listing.
    val committed = committedEpochs(spark, outDir)
    // defense in depth (mirrors the winv `batch <= epochId` filter): an
    // epoch OLDER than the newest committed one whose own commit artifact
    // was already pruned would find no base, re-found from empty state,
    // and its cleanup would then prune layer dirs the newest commit still
    // references — silent state corruption. Unreachable under the
    // sequential foreachBatch contract; a manual / out-of-order replay
    // must fail loudly instead.
    require(committed.forall(_ <= epochId),
      s"epoch $epochId arrived after newer committed epoch(s) " +
        s"${committed.filter(_ > epochId).sorted.mkString(", ")} in $outDir — " +
        "an out-of-order replay would re-found from empty state and prune " +
        "layers the newest commit references; only uncommitted or the " +
        "newest epoch may replay")
    // an UNCOMMITTED regate may be in flight (fingerprint recorded, and
    // possibly its quarantine consolidation, staged shards, or even the
    // corpus apply already landed). NO epoch may proceed over that: a
    // stream restart re-bases to the regate's own natural id and would
    // OVERWRITE the consolidated quarantine — the only stored text of
    // docs the apply already removed — and any epoch would carry the
    // half-revised shards' v2 content forward under v1 verdict state
    // (silent corpus/state divergence). Finishing the regate (same id,
    // its original benchmark) repairs everything in one call; its
    // commit-time cleanup then releases this guard. Cost here: one FS
    // listing of a dir that exists only while a regate is unfinished.
    val inflightRegates = listPartitionLongs(spark, s"$outDir/state/staging",
        "regate=")
      .filter(r => isCommitted(spark, s"$outDir/state/staging/regate=$r/bsig"))
      .filterNot(committed.contains)
    require(inflightRegates.isEmpty,
      s"a regate at epoch ${inflightRegates.toSeq.sorted.mkString(", ")} in " +
        s"$outDir crashed before committing — its quarantine/staging/corpus " +
        "writes may be half-applied, so no epoch may run over them; finish " +
        "the regate with its original benchmark first")
    val lastCommitted: Option[Long] =
      committed.filter(_ < epochId).maxOption
    // gen3 base (commit artifact); None for legacy bases AND for epoch 0
    val prevState: Option[EpochState] =
      lastCommitted.flatMap(e => loadEpochState(spark, outDir, e, useCache = true))
    val legacyBase = lastCommitted.isDefined && prevState.isEmpty

    // full previous verdict state, by layout generation: (gen3) bucketed
    // union of pointed epochs; (gen2) a full verdict dir with the
    // extended columns; (gen1) 5-column verdicts → rebuild the extended
    // state from the batch-keyed sigs + winv primitives, exactly once.
    // Legacy rows predate the contamination gate → contam = false (the
    // meta fingerprint pin above guarantees the gate was off for them).
    lazy val vPrevAll: DataFrame = (lastCommitted, prevState) match {
      case (_, Some(st)) => readVBuckets(spark, outDir, st.vPtr, None)
      case (Some(e), None)
          if spark.read.parquet(s"$legacyVerdicts/epoch=$e").columns.contains("bag") =>
        spark.read.parquet(s"$legacyVerdicts/epoch=$e")
          .withColumn("contam", lit(false)).select(StateCols.map(col): _*)
      case (Some(e), None) =>
        val sigs = spark.read.parquet(s"$outDir/state/sigs")
          .filter(col("batch") <= e)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_tok"), col("h"), col("bag")).distinct()
        val winv = spark.read.parquet(s"$outDir/state/winv")
          .filter(col("batch") <= e)
          .select(col("doc_id"), col("fp")).distinct()
        Curation.verdictsFullFrom(sigs, winv)
          .withColumn("contam", lit(false)).select(StateCols.map(col): _*)
      case (None, _) => emptyVerdictState(spark)
    }
    // layered (rank-tagged) view for the per-epoch probes: precedence is
    // resolved AFTER each probe shrinks the candidate set (bag join, flip
    // semi-join), so a steady-state epoch never materializes a full
    // merged view — gen3 only; legacy bases fall back to the merged full
    // frame, which the compacting migration consumes exactly once anyway.
    // Bucket pruning is only sound when the state was written under the
    // CURRENT VBuckets constant — probe bucket sets are computed with the
    // current hash, so pruning old-constant partitions with them would
    // silently drop state rows (missed re-deliveries ⇒ duplicate corpus
    // rows) one epoch BEFORE the compacting re-bucket runs; a mismatch
    // epoch compacts anyway, so the unpruned read costs nothing extra.
    def vLayersFor(buckets: Option[Seq[Int]]): DataFrame = prevState match {
      case Some(st) =>
        val prunable = if (st.vNB == VBuckets) buckets else None
        vLayersRanked(spark, outDir, st.vPtr, prunable.map(_.toSet))
      case None => vPrevAll.withColumn("_layer", lit(0))
    }

    // fp-count base, by layout generation: (gen3) pointer rows from the
    // commit artifact; (r11 legacy) a bucketed fpcnt dir + fpmap; (older)
    // an un-bucketed fpcnt dir or none at all (rebuild from winv) — the
    // last two force a compacting full fold into the bucketed layout.
    val emptyFp = spark.range(0).select(col("id").as("fp"), col("id").as("nd"))
    val (fpPtrBase: Map[Int, Seq[Long]], fpNBBase: Int,
        fullFpBase: Option[DataFrame]) =
      (prevState, lastCommitted) match {
        case (Some(st), _) => (st.fpPtr, st.fpNB, None)
        case (None, Some(e)) if hasDataFiles(spark, s"$outDir/state/fpmap/epoch=$e") =>
          // r11 legacy: single full-copy pointers — a one-element layer list
          val rows = spark.read.parquet(s"$outDir/state/fpmap/epoch=$e")
            .select(col("bucket"), col("epoch"), col("n_buckets")).collect()
          (rows.map(r => r.getInt(0) -> Seq(r.getLong(1))).toMap,
            rows.headOption.map(_.getInt(2)).getOrElse(FpBuckets), None)
        case (None, Some(e)) if hasDataFiles(spark, s"$outDir/state/fpcnt/epoch=$e") =>
          (Map.empty[Int, Seq[Long]], FpBuckets,
            Some(spark.read.parquet(s"$outDir/state/fpcnt/epoch=$e")
              .select(col("fp"), col("nd"))))
        case (None, Some(e)) =>
          (Map.empty[Int, Seq[Long]], FpBuckets,
            Some(spark.read.parquet(s"$outDir/state/winv")
              .filter(col("batch") <= e)
              .select(col("doc_id"), col("fp")).distinct()
              .groupBy(col("fp")).agg(count(lit(1)).as("nd"))))
        case (None, None) => (Map.empty[Int, Seq[Long]], FpBuckets, None)
      }

    // re-delivery: batch ids already in the state contribute nothing new
    // (same doc_id ⇒ same text under the at-least-once contract). The
    // probe broadcasts the BATCH side against a bucket-PRUNED scan of the
    // state (only the buckets the batch's ids can live in are read);
    // `seenIds` is ≤ batch-sized.
    val batchIds = docs.select(col("doc_id"))
    val batchBuckets: Seq[Int] = base.select(vBucket(col("doc_id")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val seenIds = vLayersFor(Some(batchBuckets)).select(col("doc_id"))
      .join(broadcast(batchIds), Seq("doc_id")).distinct().localCheckpoint()
    val batchSigs = Curation.docSignals(base)
    val newSigs = batchSigs.join(broadcast(seenIds), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val newIds = newSigs.select(col("doc_id"))
    // NEW docs only — every probe and state write below derives from the
    // seen-filtered batch, so re-delivered docs contribute nothing twice
    val newBase = base.join(broadcast(seenIds), Seq("doc_id"), "left_anti")

    // FAST PATH: a batch with no new docs cannot move any verdict (flips
    // only arise from new docs' bags and window fps), so the epoch is a
    // heartbeat — carry every pointer and cumulative value forward and
    // write only the commit marker (no winv dir either — a re-delivered
    // doc's windows already sit in the batch dir that first landed it).
    // Gen3 bases only: a legacy base must run the full path so the
    // compacting migration happens.
    if (prevState.isDefined && newSigs.isEmpty) {
      val st = prevState.get
      // the stored-manifest shard-set validation (and the report-existence
      // bootstrap) run on heartbeat epochs too — external corruption must
      // be repaired on the NEXT epoch of any kind, not persist for as long
      // as only re-delivered batches arrive. Costs one ≤ numShards collect
      // when consistent; rewrites nothing (artifact bytes untouched — the
      // heartbeat pin holds).
      syncManifest(spark, outDir, numShards, st.shardKept.keySet, Nil)
      if (!hasDataFiles(spark, s"$outDir/report"))
        writeReport(spark, s"$outDir/report", st.rollup.values.toSeq,
          withContam = gateOn)
      val result = EpochResult(epochId, st.docsSeen, st.docsKept, 0L, 0L, Nil)
      writeCommit(spark, outDir, epochId, st, result)
      cleanupAfterCommit(spark, outDir, epochId, Some(st))
      return result
    }

    // the epoch's window-fp log, appended batch-keyed, holding the NEW
    // docs' windows only (filtered BEFORE the write: a re-delivered doc's
    // windows are already in its first batch's dir, so appending them
    // again would grow the one unbounded token-scale state by pure
    // duplicates on every re-delivery — and the seen filter is
    // deterministic on a same-epoch replay, so overwrite rewrites the
    // same bytes). Probed only under a broadcast of crossing fps.
    //
    // Layout by batch role, mirroring the other families: the FOUNDING
    // batch — the log's token-scale bulk — is written fp-bucketed at
    // birth (`state/winvc/chunk=<e>/bucket=pmod(fp, FpBuckets)`), so a
    // later crossing epoch's probe partition-prunes it to the crossed
    // buckets; tail batches stay FLAT under `state/winv/batch=<e>`
    // (batch-scale — reading them whole is cheap, and partitionBy on a
    // batch-scale write is the measured 2 s/epoch file fan-out) until
    // the chunk fold below re-buckets them in bulk.
    // "founding" = the first batch to see any doc: an empty batch 0 (a
    // stream that triggered before data arrived) must not rob the real
    // founding mass of its bucketed-at-birth write
    val winvIsChunk = lastCommitted.isEmpty || prevState.exists(_.docsSeen == 0L)
    val newWins =
      if (winvIsChunk) {
        Curation.winFpsOver(newBase.select(col("doc_id"), col("toks")),
            Curation.SubWidth)
          .withColumn("bucket", fpBucket(col("fp")))
          .coalesce(8)
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$outDir/state/winvc/chunk=$epochId")
        spark.read.schema(winvcSchema(spark))
          .parquet(s"$outDir/state/winvc/chunk=$epochId")
          .select(col("doc_id"), col("fp"))
      } else {
        Curation.winFpsOver(newBase.select(col("doc_id"), col("toks")),
            Curation.SubWidth)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/state/winv/batch=$epochId")
        spark.read.schema(winvSchema(spark, withBatch = false))
          .parquet(s"$outDir/state/winv/batch=$epochId")
      }

    // per-fp distinct-doc counts: merge the batch's tallies into the
    // BUCKETED fp state. The state is hash-partitioned on pmod(fp,
    // FpBuckets) and an epoch only reads + rewrites the buckets its batch
    // touches (pointer-pruned; untouched buckets keep their bytes and
    // their pointer) — per-epoch fp I/O is O(touched buckets), not
    // O(all fps). `updated` (batch fps that already existed) and `fresh`
    // (fps first seen this batch) are both ≤ batch-sized.
    val contrib = newWins.groupBy(col("fp")).agg(count(lit(1)).as("add"))
      .withColumn("bucket", fpBucket(col("fp")))
      .localCheckpoint()
    // one local pass over the checkpointed tallies yields both the
    // touched-bucket list and the fp count that gates the broadcasts
    val tallies = contrib.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .collect()
    val touched: Seq[Int] = tallies.map(_.getInt(0)).toSeq.sorted
    val nContribFps: Long = tallies.map(_.getLong(1)).sum
    // fp-scale broadcast gate (see FpBroadcastMaxRows): oversized batches
    // fall back to shuffle joins for the fp-keyed probes
    val bcastFp: DataFrame => DataFrame =
      if (nContribFps <= FpBroadcastMaxRows) df => broadcast(df)
      else df => df
    // delta-layer write parallelism: one write task (one file per touched
    // bucket dir) is right for a tail batch, but a founding/backfill
    // epoch's delta IS the state — a coalesce(1) there would funnel the
    // whole founding write (and the final stage feeding it) through a
    // single task. Sized from the driver-known fp tally, capped at the
    // compaction write parallelism so file fan-out stays bounded.
    val layerParts: Int =
      math.min(8L, 1L + nContribFps / 4000000L).toInt
    // a FULL compaction (every layer folded into one fresh copy) runs
    // only on layout MIGRATIONS: an un-bucketed or winv-rebuilt base, or
    // a changed FpBuckets constant. Steady-state fan-out is bounded by
    // the ROLLING fold below instead (a per-epoch bucket slice — no
    // all-at-once compaction cliff); between folds an epoch WRITES only
    // its own tallies (O(batch)) and the merged view is (re)constructed
    // on read by summing the pointed layers.
    val mustCompactFp = fullFpBase.isDefined ||
      (fpPtrBase.nonEmpty && fpNBBase != FpBuckets)
    def fpLayers(buckets: Option[Seq[Int]]): DataFrame = {
      // bucket pruning only when the state was written under the CURRENT
      // FpBuckets constant — `touched` is computed with the current hash,
      // so pruning old-constant partitions with it would drop live counts
      // (missed priors ⇒ doubled fps in the compaction fold, missed
      // crossings) one epoch before the re-bucket; the mismatch epoch
      // compacts anyway, so the unpruned read is the same O(state) cost.
      // (The per-layer POINTED filter inside pointedLayers is sound
      // either way: the pointer map's bucket keys were computed under the
      // layer's own constant, consistent with the layer's data.)
      // Sum-merge: a bucket's count is the sum of its rows across layers
      // (the oldest layer is the last full copy, newer ones per-epoch
      // tallies).
      val prunable = if (fpNBBase == FpBuckets) buckets else None
      pointedLayers(spark, outDir, "fpcnt", fpcntSchema(spark), fpPtrBase,
        prunable.map(_.toSet))
        .map(_.select(col("fp"), col("nd")))
        .reduceOption(_ unionByName _).getOrElse(emptyFp)
    }
    def sumFp(layers: DataFrame): DataFrame =
      layers.groupBy(col("fp")).agg(sum(col("nd")).as("nd"))
    // prior merged counts of exactly the BATCH's fps: filter the layered
    // scan to the batch's fp set (broadcast semi) BEFORE the sum-merge,
    // so the aggregation's exchange moves O(batch × layers) rows — a
    // groupBy over the raw layers would re-shuffle every fp in the
    // touched buckets each epoch, breaking the pinned shuffle budget
    val fPrevFold: DataFrame = fullFpBase match {
      case Some(full) => full
      case None => sumFp(fpLayers(Some(touched))
        .join(bcastFp(contrib.select(col("fp"))), Seq("fp"), "left_semi"))
    }
    val updated = fPrevFold.join(bcastFp(contrib.select(col("fp"), col("add"))),
      Seq("fp")).localCheckpoint()
    val fresh = contrib.join(bcastFp(updated.select(col("fp"))),
      Seq("fp"), "left_anti").select(col("fp"), col("add").as("nd"))
    val fpPtrApp: Map[Int, Seq[Long]] =
      if (touched.isEmpty && !mustCompactFp) fpPtrBase
      else {
        // the epoch's fp layer: on the normal path just the batch's own
        // tallies (value column named nd so layers sum uniformly; a
        // layer row IS the delta it contributes) — O(batch) write; a
        // compaction instead writes the full merged counts with write
        // parallelism 8. Coalesce (not repartition) keeps both
        // shuffle-free — a state-keyed exchange here would violate the
        // O(batch + touched) shuffle budget the spec pins.
        //
        // Layout by layer role: FULL-copy layers (founding + compaction
        // — the state-scale layers reads must prune) are bucket=
        // PARTITIONED dirs; a tail DELTA layer is written FLAT (bucket
        // as a data column, layerParts files total). partitionBy on a
        // batch-scale delta would fan each write task into up to
        // FpBuckets tiny files — ≈1 s of per-file commit overhead every
        // epoch for a layer whose reads are batch-scale row filters
        // anyway (the pointer map already confines which epochs a
        // bucket's read opens).
        val fpDir = s"$outDir/state/fpcnt/epoch=$epochId"
        // ONE copy of the delta frame: both layouts below write exactly
        // this (the flat path verbatim, the founding path partitioned),
        // so the written layer and its pointer bookkeeping cannot drift
        val delta = contrib.select(col("fp"), col("add").as("nd"), col("bucket"))
          .coalesce(layerParts)
        if (mustCompactFp || fpPtrBase.isEmpty) {
          val layer =
            if (mustCompactFp)
              // the one O(state) fold, amortized over the compaction
              // interval: full merged counts + the batch's tallies
              fullFpBase.getOrElse(sumFp(fpLayers(None)))
                .join(bcastFp(contrib.select(col("fp"), col("add"))), Seq("fp"), "left")
                .select(col("fp"), (col("nd") + coalesce(col("add"), lit(0L))).as("nd"))
                .unionByName(fresh)
                .withColumn("bucket", fpBucket(col("fp")))
                .coalesce(8)
            else delta
          layer.write.mode(SaveMode.Overwrite).partitionBy("bucket")
            .parquet(fpDir)
          // pointer rows forward from the FREE directory listing: a
          // compaction points every written bucket at this epoch alone
          val written = listPartitionInts(spark, fpDir, "bucket=")
          if (mustCompactFp) written.map(_ -> Seq(epochId)).toMap
          else appendPtr(fpPtrBase, written, epochId)
        } else {
          delta.write.mode(SaveMode.Overwrite).parquet(fpDir)
          // `touched` IS the flat layer's exact bucket set (the layer is
          // contrib verbatim), so the pointer append needs no listing
          appendPtr(fpPtrBase, touched, epochId)
        }
      }
    // rolling compaction (no-op right after a full compaction or at
    // founding — every list is length 1 then). The fp merge is the one
    // fold that pays a state-scale exchange (counts must co-locate per
    // fp to sum), and the fp state is TOKEN-scale — the largest periodic
    // cost an epoch sees. So each fold's slice splits in two: a MERGE
    // half pays the sum exchange and lands 1 row/fp; a UNION half skips
    // it entirely — the bucket's head rows pass through untouched (no
    // exchange) plus ONE summed row over its tail deltas (a delta-scale
    // exchange). Union-written buckets are recorded in the commit
    // (`fpUnion`) and MUST merge on their next fold, so rows-per-fp in
    // any head layer stays ≤ 2 (readers sum rows per fp anyway) while
    // the per-fold exchange roughly halves — the fpcnt-turn residue
    // spike smoothing. Hard-bound (out-of-turn) folds always merge.
    // All of it is a pure function of (committed fpUnion, fpPtrApp,
    // epochId), so a crash replay folds the same split.
    val fpUnionBase: Set[Int] =
      if (mustCompactFp || fpPtrBase.isEmpty) Set.empty
      else prevState.map(_.fpUnion).getOrElse(Set.empty)
    val (fpPtrNew: Map[Int, Seq[Long]], fpUnionNew: Set[Int]) =
      if (!rollTurn("fpcnt", epochId, fpPtrApp)) (fpPtrApp, fpUnionBase)
      else {
        val rolledFp = rollSet(fpPtrApp, FpBuckets)
        def mustMerge(b: Int): Boolean = fpUnionBase(b) ||
          fpPtrApp.get(b).exists(_.size >= FpCompactAt)
        val unionFp: Set[Int] = rolledFp
          .filter(b => !mustMerge(b) && (((b + epochId) % 2) + 2) % 2 == 1)
        val mergeFp: Set[Int] = rolledFp -- unionFp
        def layersOf(ptr: Map[Int, Seq[Long]], only: Option[Set[Int]]) =
          pointedLayers(spark, outDir, "fpcnt", fpcntSchema(spark), ptr, only)
            .map(_.select(col("fp"), col("nd")))
            .reduceOption(_ unionByName _).getOrElse(emptyFp)
        val ptr2 = rollFamily(spark, outDir, "fpcnt", fpPtrApp, FpBuckets,
          epochId, _ => {
            val mergePart = sumFp(layersOf(fpPtrApp, Some(mergeFp)))
            // head rows pass through (≤ 1 row/fp — a union bucket's head
            // is never itself union-written, by the mustMerge rule);
            // tail deltas sum into one row per fp
            val unionBase = layersOf(fpPtrApp.view.filterKeys(unionFp)
              .mapValues(_.take(1)).toMap, None)
            val unionDelta = sumFp(layersOf(fpPtrApp.view.filterKeys(unionFp)
              .mapValues(_.drop(1)).toMap, None))
            mergePart.unionByName(unionBase).unionByName(unionDelta)
              .withColumn("bucket", fpBucket(col("fp")))
          })
        (ptr2, (fpUnionBase ++ unionFp) -- mergeFp)
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
    val prevWvFolded: Long = prevState.map(_.wvFolded).getOrElse(-1L)
    val dDup =
      if (crossed.isEmpty)
        spark.range(0).select(col("id").as("doc_id"), col("id").as("d_dup"))
      else {
        // the log's CHUNKED mass (the founding batch + every fold) is
        // read pruned to the crossed fps' buckets — O(crossed-bucket
        // bytes), not O(log); only the flat tails (≤ FpCompactAt recent
        // batch-scale dirs) are read whole. Live chunks are the COMMITTED
        // ones ≤ the delta base (this epoch's own crash-replayed fold, if
        // any, would double-count the flats it covers — those are only
        // deleted after the commit marker); live flats are the batches in
        // (wvFolded, epochId] — the upper bound is defense in depth
        // against a manually restored out-of-order dir, the lower bound
        // skips folded flats cleanup has not yet pruned.
        val crossedBuckets: Seq[Int] = crossed
          .select(fpBucket(col("fp")).as("b")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        val flats = spark.read.schema(winvSchema(spark, withBatch = true))
          .parquet(s"$outDir/state/winv")
          .filter(col("batch") <= epochId && col("batch") > prevWvFolded)
          .select(col("doc_id"), col("fp"))
        val chunks = liveChunks(spark, outDir, prevState, lastCommitted)
          .map(c => spark.read.schema(winvcSchema(spark))
            .parquet(s"$outDir/state/winvc/chunk=$c")
            .filter(col("bucket").isInCollection(crossedBuckets))
            .select(col("doc_id"), col("fp")))
          .reduceOption(_ unionByName _)
        chunks.map(_.unionByName(flats)).getOrElse(flats)
          .join(bcastFp(crossed), Seq("fp"))
          .distinct()
          .join(broadcast(newIds), Seq("doc_id"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("d_dup"))
          .localCheckpoint()
      }

    // keeper displacement: batch minima vs the CURRENT keepers, read
    // from the bag-keyed side-state (`state/kbkt`, rows (bag, keeper),
    // bucketed by pmod(xxhash64(bag), KBuckets)) pruned to the batch's
    // bag buckets — a steady epoch reads O(batch-bag buckets), never a
    // full verdict scan. Newest row wins per bag, resolved AFTER the
    // broadcast bag join shrinks the candidates. A base committed before
    // the family existed (or a legacy base) migrates ONCE by folding the
    // keepers out of the merged verdict state — the last full verdict
    // read a displacement probe ever pays.
    val kPtrBase: Map[Int, Seq[Long]] =
      prevState.map(_.kPtr).getOrElse(Map.empty)
    val kNBBase: Int = prevState.map(_.kNB).getOrElse(KBuckets)
    val kMigrating = lastCommitted.isDefined && kPtrBase.isEmpty
    lazy val keeperBaseFull: DataFrame =
      if (kMigrating) vPrevAll.filter(col("bag_keep"))
        .select(col("bag"), col("doc_id").as("keeper"))
      else readKBuckets(spark, outDir, kPtrBase, None)
    def keeperLayers(buckets: Seq[Int]): DataFrame =
      if (kMigrating) keeperBaseFull.withColumn("_layer", lit(0))
      else {
        // pruning gated on the stored bucket constant, like the other
        // families (probe buckets use the current hash)
        val prunable = if (kNBBase == KBuckets) Some(buckets.toSet) else None
        kLayersRanked(spark, outDir, kPtrBase, prunable)
      }
    // NOT checkpointed: a deterministic single aggregation over the
    // checkpointed newSigs — each consumer (the bucket collect below,
    // the bagMatch broadcast build, freshRows, the kbkt delta) re-runs
    // the cheap batch-scale hash agg inside its own existing job instead
    // of paying a dedicated materialization job per epoch
    val batchMin = newSigs.groupBy(col("bag")).agg(min(col("doc_id")).as("b_min"))
    val bagBuckets: Seq[Int] = batchMin.select(kBucket(col("bag")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val bagMatch = keeperLayers(bagBuckets)
      .join(broadcast(batchMin), Seq("bag"))
      .groupBy(col("bag"), col("b_min"))
      .agg(max_by(col("keeper"), col("_layer")).as("k_id"))
      .select(col("bag"), col("k_id"), col("b_min"))
      .localCheckpoint()
    val displaced = bagMatch.filter(col("b_min") < col("k_id"))
      .select(col("k_id").as("doc_id"), lit(true).as("_disp"))

    // contamination flags for fresh docs (gate-on only): q104's window
    // formula vs the benchmark, evaluated once at first sight. The
    // decontam-width fps are PERSISTED (`state/winc/batch=<e>`, flat,
    // batch-keyed — same shape as the winv log) before the probe
    // consumes them: they are what makes a later [[regate]] possible
    // (contamination vs a REVISED benchmark is recomputable from this
    // log for every doc ever seen, without the dropped docs' text).
    // One extra batch-scale write per gate-on epoch — the declared price
    // of benchmark revisability.
    val contamIds: Option[DataFrame] = benchFps.map { bf =>
      val wincDir = s"$outDir/state/winc/batch=$epochId"
      Curation.winFpsOver(newBase.select(col("doc_id"), col("toks")),
          Curation.DecontamWidth)
        .write.mode(SaveMode.Overwrite).parquet(wincDir)
      Curation.contaminatedOf(
        spark.read.schema(winvSchema(spark, withBatch = false))
          .parquet(wincDir), bf)
        .withColumn("_cont", lit(true))
    }

    // the existing docs this epoch's deltas FLIP (displaced keepers +
    // crossing-fp holders) — the only old rows the epoch re-emits. ONE
    // tiny collect yields their buckets for the pruned state read.
    val flipIds = displaced.select(col("doc_id"))
      .unionByName(dDup.select(col("doc_id"))).distinct().localCheckpoint()
    val flipBuckets: Seq[Int] = flipIds
      .select(vBucket(col("doc_id")).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

    // verdict-state compaction mirrors the fp-state rule; a legacy base
    // always compacts (that IS the migration into the bucketed layout);
    // steady-state fan-out is the rolling fold's job
    val vPtrBase: Map[Int, Seq[Long]] =
      prevState.map(_.vPtr).getOrElse(Map.empty)
    val mustCompactV = legacyBase ||
      (vPtrBase.nonEmpty && prevState.exists(_.vNB != VBuckets))

    // assemble the epoch's CHANGED verdict rows only: the flipped docs'
    // old rows re-emitted with the flips applied (bucket-pruned merged
    // read + broadcast joins, map-side) plus the batch's fresh rows —
    // batch-scale, never corpus-scale. kept_prev/is_new ride along so
    // added/removed and the report deltas fall out of the same pass.
    val flipOld =
      // candidates = every layer's rows for the flip docs (bucket-pruned
      // read + broadcast semi-join), then newest row wins per doc — the
      // precedence aggregation shuffles only flip-scale rows
      mergeRankedVerdicts(vLayersFor(Some(flipBuckets))
        .join(broadcast(flipIds), Seq("doc_id")))
    val exist = flipOld
      .withColumnRenamed("kept", "kept_prev")
      .join(broadcast(displaced), Seq("doc_id"), "left")
      .join(broadcast(dDup), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("h"), col("bag"),
        (col("bag_keep") && col("_disp").isNull).as("bag_keep"),
        col("n_win"),
        (col("n_dup") + coalesce(col("d_dup"), lit(0L))).as("n_dup"),
        col("contam"),
        col("kept_prev"), lit(false).as("is_new"))
    val nWinNew = newWins.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
    val dupFpsB = updated
      .select(col("fp"), (col("nd") + col("add")).as("nd2"))
      .unionByName(fresh.select(col("fp"), col("nd").as("nd2")))
      .filter(col("nd2") >= 2).select(col("fp"))
    val nDupNew = newWins.join(bcastFp(dupFpsB), Seq("fp"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("ndp"))
    val freshWithContam = contamIds match {
      case Some(ci) => newSigs.join(broadcast(ci), Seq("doc_id"), "left")
        .withColumn("contam", coalesce(col("_cont"), lit(false))).drop("_cont")
      case None => newSigs.withColumn("contam", lit(false))
    }
    val freshRows = freshWithContam
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
        col("contam"),
        lit(false).as("kept_prev"), lit(true).as("is_new"))
    val assembled = exist.unionByName(freshRows)
      .withColumn("kept", Curation.contamKept(
        Curation.keptExpr(col("n_tok"), col("h"), col("bag_keep"),
          Curation.spanDropExpr(col("n_win"), col("n_dup"))), col("contam")))
      .localCheckpoint() // consumed by deltas, corpus, verdict write

    // added ⊆ the batch (an existing doc can never flip TO kept under
    // append-only monotonicity); removed = previously-kept docs whose
    // displacement or span flip landed this epoch. Both are filters over
    // the assembled pass; the report rollup and per-shard kept counts
    // FOLD FORWARD from two tiny delta aggregations over the same blocks
    // (cardinality ≤ |lang×source| and ≤ numShards — collected, merged
    // with the previous cumulative values on the driver, and persisted in
    // the commit artifact), so no corpus-scale aggregation runs even on a
    // compaction epoch.
    val isNewKept = col("is_new") && col("kept")
    val isRemovedNow = !col("is_new") && col("kept_prev") && !col("kept")
    val added = assembled.filter(isNewKept)
    val removed = assembled.filter(isRemovedNow).select(col("doc_id"))
    val shardOf = Layout.shardKey(col("doc_id"), numShards)
    // ONE aggregation over the (batch-scale) changed rows yields the
    // report deltas, the shard deltas, AND the changed rows' verdict
    // buckets: cardinality ≤ |lang×source×numShards|, folded on the
    // driver
    val dAgg = assembled.groupBy(col("lang"), col("source"),
        shardOf.as("shard")).agg(
      sum(when(col("is_new"), 1L).otherwise(0L)).as("d_in"),
      sum(when(isNewKept, 1L).otherwise(0L)).as("d_add"),
      sum(when(isRemovedNow, 1L).otherwise(0L)).as("d_rem"),
      sum(when(isNewKept, col("n_tok")).otherwise(0L)).as("d_tok_add"),
      sum(when(isRemovedNow, col("n_tok")).otherwise(0L)).as("d_tok_rem"),
      sum(when(col("is_new") && col("contam"), 1L).otherwise(0L)).as("d_cont"),
      collect_set(vBucket(col("doc_id"))).as("bks"),
      count(lit(1)).as("d_rows"),
      // keeper-delta bookkeeping rides the same pass: a fresh row with
      // bag_keep is EXACTLY a bag whose keeper changed this epoch (fresh
      // bag elected its minimum, or a displaced keeper handed off to it),
      // so the count gates the kbkt delta write and the bucket set
      // replaces its read-back job
      sum(when(col("is_new") && col("bag_keep"), 1L).otherwise(0L)).as("d_keep"),
      collect_set(when(col("is_new") && col("bag_keep"),
        kBucket(col("bag")))).as("kbks"))
      .collect()

    // the epoch's verdict layer: normally just the changed rows
    // (O(batch + flips) write — newest row wins on read); a compaction
    // writes the full merged state (carried rows + changes) and resets
    // every bucket's layer list to this epoch. Layout mirrors the fp
    // state: full-copy layers (founding + compaction) bucket=
    // partitioned for pruned reads, tail DELTA layers flat (see the fp
    // layer's rationale — the exact changed-row bucket set rides the
    // dAgg collect, so the flat path needs no listing job either).
    val vPtrApp: Map[Int, Seq[Long]] = {
      val changed = assembled.drop("kept_prev", "is_new")
      val vDir = s"$outDir/state/vbkt/epoch=$epochId"
      // write parallelism from the driver-known CHANGED-ROW count (the
      // fp tally is the wrong proxy here: a founding batch of short or
      // heavily-duplicated docs has ~0 distinct fps but corpus-scale
      // verdict rows, and would funnel through one task)
      val nChanged = dAgg.iterator.map(_.getLong(10)).sum
      val vParts = math.min(8L, 1L + nChanged / 1000000L).toInt
      // ONE copy of the delta frame for both layouts (see the fp layer)
      val delta = changed.withColumn("bucket", vBucket(col("doc_id")))
        .coalesce(vParts)
      if (dAgg.isEmpty && !mustCompactV) vPtrBase
      else if (mustCompactV || vPtrBase.isEmpty) {
        val layer =
          if (mustCompactV)
            vPrevAll.join(broadcast(changed.select(col("doc_id"))),
                Seq("doc_id"), "left_anti")
              .unionByName(changed)
              .withColumn("bucket", vBucket(col("doc_id")))
              .coalesce(8)
          else delta
        layer.write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(vDir)
        val written = listPartitionInts(spark, vDir, "bucket=")
        if (mustCompactV) written.map(_ -> Seq(epochId)).toMap
        else appendPtr(vPtrBase, written, epochId)
      } else {
        delta.write.mode(SaveMode.Overwrite).parquet(vDir)
        val changedBuckets = dAgg.iterator.flatMap(_.getSeq[Int](9)).toSet
        appendPtr(vPtrBase, changedBuckets.toSeq.sorted, epochId)
      }
    }
    // rolling fold — newest-wins resolved by one max_by aggregation over
    // the rolled slice (a bounded exchange, constant job count)
    val vPtrNew: Map[Int, Seq[Long]] =
      if (!rollTurn("vbkt", epochId, vPtrApp)) vPtrApp
      else rollFamily(spark, outDir, "vbkt", vPtrApp, VBuckets, epochId,
        rolled => readVBuckets(spark, outDir, vPtrApp, Some(rolled))
          .withColumn("bucket", vBucket(col("doc_id"))))
    // keeper side-state layer: one row per bag whose keeper CHANGED this
    // epoch (fresh bags elect their batch minimum; displaced keepers hand
    // off to it) — ≤ batch-bag-scale, derived from the checkpointed
    // batchMin/bagMatch probes, no state re-read. A migration (pre-keeper
    // or legacy base, or a changed KBuckets constant) instead writes the
    // full merged keeper copy, bucket-partitioned.
    val kDelta = batchMin
      .join(broadcast(bagMatch.select(col("bag"), col("k_id"))), Seq("bag"), "left")
      .filter(col("k_id").isNull || col("b_min") < col("k_id"))
      .select(col("bag"), col("b_min").as("keeper"))
    val mustCompactK = kMigrating ||
      (kPtrBase.nonEmpty && kNBBase != KBuckets)
    val kPtrApp: Map[Int, Seq[Long]] = {
      val kDir = s"$outDir/state/kbkt/epoch=$epochId"
      if (mustCompactK || kPtrBase.isEmpty) {
        // founding / migration: the full keeper copy (base newest-wins
        // merged, this epoch's changes applied), partitioned for pruned
        // reads. The founding base is empty, so its layer IS the delta.
        val layer = keeperBaseFull
          .join(broadcast(kDelta.select(col("bag"))), Seq("bag"), "left_anti")
          .unionByName(kDelta)
          .withColumn("bucket", kBucket(col("bag")))
          .coalesce(8)
        layer.write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(kDir)
        listPartitionInts(spark, kDir, "bucket=")
          .map(_ -> Seq(epochId)).toMap
      } else if (dAgg.iterator.map(_.getLong(11)).sum == 0L) {
        // the steady common case — no fresh bag elected and no keeper
        // displaced (driver-known from the delta agg's d_keep) — writes
        // NO kbkt layer at all: kDelta is provably empty, so the write
        // and its read-back were two wasted jobs per such epoch
        kPtrBase
      } else {
        // tail delta: flat, bucket as a data column (see the fp layer's
        // layout rationale); the touched-bucket set rides the delta agg
        // (kbks — same rows as kDelta by the d_keep argument above), so
        // the write needs neither a listing nor a read-back job
        kDelta.withColumn("bucket", kBucket(col("bag"))).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(kDir)
        val kBk = dAgg.iterator.flatMap(_.getSeq[Int](12)).toSet
        appendPtr(kPtrBase, kBk.toSeq.sorted, epochId)
      }
    }
    val kPtrNew: Map[Int, Seq[Long]] =
      if (!rollTurn("kbkt", epochId, kPtrApp)) kPtrApp
      else rollFamily(spark, outDir, "kbkt", kPtrApp, KBuckets, epochId,
        rolled => readKBuckets(spark, outDir, kPtrApp, Some(rolled))
          .withColumn("bucket", kBucket(col("bag"))))

    // window-log fold: once FpCompactAt flat tail batches accumulate,
    // re-bucket the batches OLDER than this epoch into one immutable
    // fp-bucketed chunk (`state/winvc/chunk=<e>`); the folded flats are
    // pruned after the commit marker. Cost is O(folded batches) once per
    // FpCompactAt epochs — batch-scale amortized, never O(log), because
    // the founding mass was bucketed at birth and chunks are never
    // merged or rewritten (the log is append-only: no row is ever
    // superseded, so pruning works per chunk and no compaction of chunks
    // into chunks is needed — each winv row is written at most twice).
    val foldable: Seq[Long] = listPartitionLongs(spark,
        s"$outDir/state/winv", "batch=")
      .filter(b => b > prevWvFolded && b < epochId).toSeq.sorted
    val prevWvChunks: Seq[Long] =
      liveChunks(spark, outDir, prevState, lastCommitted)
    val wvFoldedNew: Long =
      if (foldable.size < FpCompactAt) prevWvFolded
      else {
        val chunkDir = s"$outDir/state/winvc/chunk=$epochId"
        val bytes = foldable.map(b =>
          dirBytes(spark, s"$outDir/state/winv/batch=$b")).sum
        val parts = math.min(8L, 1L + bytes / (256L << 20)).toInt
        spark.read.schema(winvSchema(spark, withBatch = true))
          .parquet(s"$outDir/state/winv")
          .filter(col("batch").isInCollection(foldable))
          .select(col("doc_id"), col("fp"))
          .withColumn("bucket", fpBucket(col("fp")))
          .coalesce(parts)
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(chunkDir)
        foldable.max
      }

    // QUARANTINE (gate-on only): contaminated fresh docs that would
    // otherwise be kept park their text in `state/quar/batch=<e>` — the
    // store [[regate]] resurrects from when a revised benchmark clears
    // them (the corpus holds kept docs only, so without this their text
    // would be unrecoverable; docs failing the doc-local gates can never
    // flip kept under ANY benchmark, so only this would-be-kept slice
    // needs parking). Skipped entirely when the batch contaminated
    // nothing — driver-known from the delta agg.
    if (gateOn && dAgg.iterator.map(_.getLong(8)).sum > 0L) {
      val keptBase = Curation.keptExpr(col("n_tok"), col("h"),
        col("bag_keep"), Curation.spanDropExpr(col("n_win"), col("n_dup")))
      assembled.filter(col("is_new") && col("contam") && keptBase)
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/state/quar/batch=$epochId")
    }

    // gate-revision log folds: winc (one flat dir per gate-on epoch) and
    // quar (one per contaminating epoch) are append-only like the window
    // log — a doc's decontam fps and quarantined text are written exactly
    // once, at first sight — so the same chunk-fold machinery bounds
    // their dir counts: once FpCompactAt flats below this epoch pile up
    // they merge into one immutable chunk, the commit artifact records
    // watermark + chunk liveness, cleanup prunes folded flats and orphan
    // chunks, and [[regate]]'s reads list O(chunks + FpCompactAt flats)
    // instead of O(gate-on epochs). Gate-off dirs have neither log; the
    // two driver FS listings cost no job.
    val prevWcFolded: Long = prevState.map(_.wcFolded).getOrElse(-1L)
    val prevWcChunks: Seq[Long] = prevState.map(_.wcChunks).getOrElse(Nil)
    val prevQFolded: Long = prevState.map(_.qFolded).getOrElse(-1L)
    val prevQChunks: Seq[Long] = prevState.map(_.qChunks).getOrElse(Nil)
    val wcFoldedNew: Long =
      if (!gateOn) prevWcFolded
      else foldBatchLog(spark, s"$outDir/state/winc", s"$outDir/state/wincc",
        winvSchema(spark, withBatch = true), epochId, prevWcFolded)
    val qFoldedNew: Long =
      if (!gateOn) prevQFolded
      else foldBatchLog(spark, s"$outDir/state/quar", s"$outDir/state/quarc",
        quarSchema(spark), epochId, prevQFolded)
    val wcChunksNew: Seq[Long] =
      (prevWcChunks ++
        (if (wcFoldedNew != prevWcFolded) Seq(epochId) else Nil)).distinct.sorted
    val qChunksNew: Seq[Long] =
      (prevQChunks ++
        (if (qFoldedNew != prevQFolded) Seq(epochId) else Nil)).distinct.sorted

    // (lang, source) -> (d_in, d_add, d_rem, d_tok_add, d_tok_rem, d_cont)
    val dRoll = dAgg.groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(rs => (rs.map(_.getLong(3)).sum, rs.map(_.getLong(4)).sum,
        rs.map(_.getLong(5)).sum, rs.map(_.getLong(6)).sum,
        rs.map(_.getLong(7)).sum, rs.map(_.getLong(8)).sum))
      .filter { case (_, d) =>
        d._1 != 0L || d._2 != 0L || d._3 != 0L || d._6 != 0L }
      .toMap
    // shard -> (d_add, d_rem)
    val dShard = dAgg.groupBy(_.getInt(2))
      .view.mapValues(rs => (rs.map(_.getLong(4)).sum, rs.map(_.getLong(5)).sum))
      .filter { case (_, d) => d._1 != 0L || d._2 != 0L }
      .toMap

    // previous cumulative values: from the gen3 commit artifact, or —
    // legacy-migration only, exactly once — rebuilt by aggregating the
    // previous verdict state (the last O(corpus) aggregations an upgraded
    // deployment ever runs)
    val (prevRoll: Map[(String, String), RollRow], prevShardKept: Map[Int, Long]) =
      prevState match {
        case Some(st) => (st.rollup, st.shardKept)
        case None if lastCommitted.isDefined =>
          val r = vPrevAll.groupBy(col("lang"), col("source")).agg(
            count(lit(1)).as("di"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("dk"),
            sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tk"),
            sum(when(col("contam"), 1L).otherwise(0L)).as("dc")).collect()
            .map(x => (x.getString(0), x.getString(1)) -> RollRow(
              x.getString(0), x.getString(1), x.getLong(2), x.getLong(3),
              x.getLong(4), x.getLong(5))).toMap
          val s = vPrevAll.filter(col("kept")).groupBy(shardOf.as("shard"))
            .agg(count(lit(1)).as("n")).collect()
            .map(x => x.getInt(0) -> x.getLong(1)).toMap
          (r, s)
        case None => (Map.empty[(String, String), RollRow], Map.empty[Int, Long])
      }
    val rollupNew: Map[(String, String), RollRow] =
      dRoll.foldLeft(prevRoll) { case (acc, (key, d)) =>
        val p = acc.getOrElse(key, RollRow(key._1, key._2, 0L, 0L, 0L, 0L))
        acc + (key -> RollRow(key._1, key._2,
          p.docsIn + d._1,
          p.docsKept + d._2 - d._3,
          p.tokensKept + d._4 - d._5,
          p.docsContam + d._6))
      }
    val shardKeptNew: Map[Int, Long] =
      dShard.foldLeft(prevShardKept) { case (acc, (sh, d)) =>
        val n = acc.getOrElse(sh, 0L) + d._1 - d._2
        if (n == 0L) acc - sh else acc + (sh -> n)
      }
    val deltas: Seq[Int] = dShard.keys.toSeq.sorted
    val nAdded = dRoll.values.map(_._2).sum
    val nRemoved = dRoll.values.map(_._3).sum

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
      // a committed staging is reusable only when it could be OURS: its
      // staged shard set must sit inside this epoch's freshly computed
      // deltas (strictly inside only when a delta shard emptied — those
      // stage no dir). Anything else is foreign content at our path —
      // regates stage under their own `regate=` root, so this guards
      // manual restores and corruption — and replaying it would apply
      // shards this epoch never computed, then delete `deltas ∖ staged`
      // as "emptied". Rebuild instead. An empty shard= listing over a
      // committed dir is the pre-partitioned legacy staging layout,
      // which applyStagedShards resolves from the data itself.
      val stagedShards = listPartitionInts(spark, stagingPath, "shard=")
      val stagingReusable = isCommitted(spark, stagingPath) &&
        (stagedShards.isEmpty || stagedShards.subsetOf(deltas.toSet))
      if (!stagingReusable) {
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
          // numPartitions = changed-shard count: the staged content is
          // exactly those shards, so the default 32 would leave empty
          // tasks at tail scale (hash collisions just co-locate two
          // shards in one task; partitionBy still splits the files)
          .repartition(deltas.size, col("shard"))
          .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(stagingPath)
      }
      if (failAfterStaging)
        throw new IllegalStateException(
          "graft test failpoint: crash after staging commit")
      applyStagedShards(spark, corpusPath, stagingPath, deltas)
      if (failAfterApply)
        throw new IllegalStateException(
          "graft test failpoint: crash after corpus apply")
    }

    syncManifest(spark, outDir, numShards, prevShardKept.keySet, deltas)

    // the user-facing report is the cumulative rollup as folded — written
    // from the driver-held rows (tiny), skipped when nothing moved
    if (dRoll.nonEmpty || !hasDataFiles(spark, s"$outDir/report"))
      writeReport(spark, s"$outDir/report", rollupNew.values.toSeq,
        withContam = benchmark.isDefined)

    // commit artifact LAST — the marker: pointer maps, cumulative rollup,
    // shard counts, and the result row land in ONE tiny write; epoch e's
    // _SUCCESS here ⇒ e fully applied
    val wvChunksNew: Seq[Long] =
      (prevWvChunks ++
        (if (winvIsChunk) Seq(epochId) else Nil) ++
        (if (wvFoldedNew != prevWvFolded) Seq(epochId) else Nil)).distinct.sorted
    val stNew = EpochState(fpPtrNew, FpBuckets, vPtrNew, VBuckets,
      rollupNew, shardKeptNew, kPtrNew, KBuckets, wvFoldedNew, wvChunksNew,
      wcFoldedNew, wcChunksNew, qFoldedNew, qChunksNew, fpUnionNew)
    val result = EpochResult(epochId, stNew.docsSeen, stNew.docsKept,
      nAdded, nRemoved, deltas)
    writeCommit(spark, outDir, epochId, stNew, result)

    // prune superseded epochs AFTER the marker lands — only the newest
    // committed state is ever a delta base, so state stays O(docs) /
    // O(distinct fps), not × epochs — and drop this epoch's staging (its
    // content is live in the corpus now)
    cleanupAfterCommit(spark, outDir, epochId, Some(stNew))
    result
  }

  /** Apply a COMMITTED staging dir to the corpus — shared by the epoch
    * path and [[regate]]: dynamic-overwrite the staged shards, then
    * explicitly drop changed shards whose kept set emptied (dynamic
    * overwrite never touches a partition the output frame doesn't
    * mention). Uses the per-WRITE overwrite option, never a session-conf
    * save/restore — two concurrent callers sharing a session could
    * interleave the latter and strand the session in dynamic mode,
    * silently flipping every later static Overwrite from delete-the-dir
    * to merge-into-it.
    */
  private def applyStagedShards(spark: SparkSession, corpusPath: String,
      stagingPath: String, deltas: Seq[Int]): Unit = {
    val writtenShards: Set[Int] = {
      val fromDirs = listPartitionInts(spark, stagingPath, "shard=")
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
      newContent.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard").parquet(corpusPath)
    }
    deltas.filterNot(writtenShards).foreach { sh =>
      deleteDir(spark, s"$corpusPath/shard=$sh")
    }
  }

  /** Manifest maintenance, shared by the main path and the heartbeat fast
    * path: carry-over for untouched shards, recompute changed shards from
    * the corpus as re-read (partition-pruned); localCheckpoint decouples
    * the self-overwrite (the manifest is both read and rewritten). The
    * carry-over base is validated against the last COMMITTED shard set
    * (`prevShards` — folded state in the commit artifact; the manifest
    * overwrite is the one non-partitioned artifact a crash can leave
    * partial): the stored shard set is checked on EVERY epoch — heartbeat
    * epochs included — with one ≤ numShards collect, and any mismatch
    * (external corruption: partial restore, manual copy) repairs by
    * recomputing the FULL manifest from the corpus on disk rather than
    * persisting behind the no-delta skip.
    */
  private def syncManifest(spark: SparkSession, outDir: String,
      numShards: Int, prevShards: Set[Int], deltas: Seq[Int]): Unit = {
    val corpusPath = s"$outDir/corpus"
    val manifestPath = s"$outDir/manifest"
    // the all-dropped / epoch-0 empty input for the manifest fold (the
    // corpus then has no partition files to infer a schema from)
    def emptyDocs: DataFrame = spark.range(0)
      .select(col("id").as("doc_id"), lit("").cast("string").as("text"))
    val storedManifest: Option[DataFrame] =
      // hasDataFiles, not fs.exists: a crash mid-overwrite leaves the dir
      // existing but fileless, and a parquet read on it would throw forever
      if (hasDataFiles(spark, manifestPath))
        Some(spark.read.parquet(manifestPath))
      else None
    val manifestShardsOk: Boolean = storedManifest.exists { m =>
      m.select(col("shard")).collect().map(_.getInt(0)).toSet == prevShards
    }
    if (deltas.isEmpty && manifestShardsOk) ()
    else {
      val carryOver: Option[DataFrame] =
        storedManifest.filter(_ => manifestShardsOk)
      val fullCorpusView =
        if (!hasDataFiles(spark, corpusPath)) emptyDocs
        else spark.read.parquet(corpusPath).select(col("doc_id"), col("text"))
      val manifest = carryOver match {
        case Some(prev) =>
          val changedManifest =
            if (deltas.isEmpty || !hasDataFiles(spark, corpusPath))
              Layout.shardManifest(emptyDocs, numShards)
            else Layout.shardManifest(
              spark.read.parquet(corpusPath)
                .filter(col("shard").isInCollection(deltas))
                .select(col("doc_id"), col("text")), numShards)
          prev.filter(!col("shard").isInCollection(deltas))
            .unionByName(changedManifest)
        case None => // epoch 0, or a crash-corrupted manifest: full recompute
          Layout.shardManifest(fullCorpusView, numShards)
      }
      // coalesce(1) + sortWithinPartitions: a total shard sort of
      // ≤ numShards rows on one task (the upstream aggregation's map
      // side keeps its scan parallelism — coalesce only collapses the
      // post-exchange reduce side), skipping orderBy's range-sample job
      manifest.coalesce(1).sortWithinPartitions(col("shard"))
        .localCheckpoint()
        .write.mode(SaveMode.Overwrite).parquet(manifestPath)
    }
  }

  /** Column order of a verdict-state row (gen3). */
  private val StateCols = Seq("doc_id", "lang", "source", "n_tok", "h",
    "bag", "bag_keep", "n_win", "n_dup", "contam", "kept")

  /** Newest-row-wins per doc over a ranked candidate frame (StateCols +
    * `_layer`) — one max_by aggregation, shuffling only the candidates.
    */
  private def mergeRankedVerdicts(cand: DataFrame): DataFrame =
    cand.groupBy(col("doc_id")).agg(
      max_by(struct(StateCols.filterNot(_ == "doc_id").map(col): _*),
        col("_layer")).as("_s"))
      .select(col("doc_id") +:
        StateCols.filterNot(_ == "doc_id").map(c => col("_s." + c)): _*)

  /** Path of layer `id` under family dir `fam` ("fpcnt" | "vbkt" |
    * "kbkt"): positive id = `epoch=<id>` (a tail delta, or the founding /
    * migration full copy), negative id = `fold=<-id>` (a rolling-
    * compaction full copy of a bucket subset written at epoch -id).
    */
  private def layerPath(outDir: String, fam: String, id: Long): String =
    if (id >= 0L) s"$outDir/state/$fam/epoch=$id"
    else s"$outDir/state/$fam/fold=${-id}"

  /** The pointed layers of a bucketed family, oldest first, each filtered
    * to the buckets whose pointer list actually CONTAINS that layer
    * (intersected with `only` when given). The per-layer pointed-bucket
    * filter is the liveness rule that makes rolling folds sound: after
    * bucket b folds at epoch e (pointer reset to [-e]), older layers
    * still physically hold b's superseded rows for as long as OTHER
    * buckets reference them — a read filtered only by the requested set
    * would double-count b. A row in layer L for bucket b is live iff
    * L ∈ ptr(b), and that is exactly what each layer's filter applies
    * (partition-pruned on bucketed full copies, a row filter on flat
    * deltas). Rank order is by (|id|, sign) — consistent across buckets;
    * no bucket's list ever holds both the fold and the delta of one
    * epoch, so the sign tiebreak never decides precedence.
    */
  private def pointedLayers(spark: SparkSession, outDir: String, fam: String,
      schema: org.apache.spark.sql.types.StructType,
      ptr: Map[Int, Seq[Long]], only: Option[Set[Int]]): Seq[DataFrame] = {
    val wanted = only.map(b => ptr.view.filterKeys(b).toMap).getOrElse(ptr)
    val ids = wanted.values.flatten.toSet.toSeq
      .sortBy((id: Long) => (math.abs(id), id))
    ids.map { id =>
      val live = ptr.iterator
        .collect { case (b, es) if es.contains(id) => b }.toSet
      val sel = only.map(_ & live).getOrElse(live)
      spark.read.schema(schema).parquet(layerPath(outDir, fam, id))
        .filter(col("bucket").isInCollection(sel.toSeq.sorted))
    }
  }

  /** Pointed verdict layers (optionally bucket-pruned), each row tagged
    * with a `_layer` rank (higher = newer). Callers shrink the row set
    * FIRST (flip semi-join, presence probe), then resolve
    * newest-row-wins per doc via `max_by(_layer)` over the small
    * candidate set — the steady-state read path. Materializing the full
    * merged view ([[readVBuckets]]) is reserved for compaction,
    * migration, and regate passes: its one max_by aggregation exchanges
    * the whole read set, which a steady-state epoch must not pay.
    */
  private def vLayersRanked(spark: SparkSession, outDir: String,
      ptr: Map[Int, Seq[Long]], only: Option[Set[Int]]): DataFrame =
    pointedLayers(spark, outDir, "vbkt", vbktSchema(spark), ptr, only)
      .zipWithIndex.map { case (df, rank) =>
        df.select(StateCols.map(col): _*).withColumn("_layer", lit(rank)) }
      .reduceOption(_ unionByName _)
      .getOrElse(emptyVerdictState(spark).withColumn("_layer", lit(0)))

  /** Merged view of the pointed verdict LAYERS, optionally restricted to
    * a bucket subset (partition-pruned reads). Newest row wins per doc,
    * resolved by ONE max_by aggregation over all pointed rows — an
    * O(read-set) exchange, which is the right trade for this path's
    * callers (migrations, compactions, [[regate]] — all declared
    * O(state) passes). A broadcast-shadow anti-join chain would be
    * exchange-free but assumes every non-oldest layer is batch-scale; a
    * rolling FOLD layer holds up to half the state's rows, so that
    * shape would broadcast corpus-scale key sets at deployment scale
    * (driver OOM / the 8 GB broadcast cap). A row's bucket is a pure
    * hash of its key, so bucket pruning never splits a key across
    * layers.
    */
  private def readVBuckets(spark: SparkSession, outDir: String,
      ptr: Map[Int, Seq[Long]], only: Option[Set[Int]]): DataFrame =
    mergeRankedVerdicts(vLayersRanked(spark, outDir, ptr, only))

  /** Ranked layers of the bag-keyed keeper side-state (`(bag, keeper)`
    * rows; see [[KBuckets]]) — the displacement probe's read path.
    */
  private def kLayersRanked(spark: SparkSession, outDir: String,
      ptr: Map[Int, Seq[Long]], only: Option[Set[Int]]): DataFrame =
    pointedLayers(spark, outDir, "kbkt", kbktSchema(spark), ptr, only)
      .zipWithIndex.map { case (df, rank) =>
        df.select(col("bag"), col("keeper")).withColumn("_layer", lit(rank)) }
      .reduceOption(_ unionByName _)
      .getOrElse(emptyKeeperState(spark).withColumn("_layer", lit(0)))

  /** Merged (newest-wins) view of the keeper side-state — compaction and
    * fold epochs only; same merge trade as [[readVBuckets]].
    */
  private def readKBuckets(spark: SparkSession, outDir: String,
      ptr: Map[Int, Seq[Long]], only: Option[Set[Int]]): DataFrame =
    kLayersRanked(spark, outDir, ptr, only)
      .groupBy(col("bag"))
      .agg(max_by(col("keeper"), col("_layer")).as("keeper"))

  /** Benchmark fingerprint: (distinct window-fp count, their bit-XOR) —
    * cheap, order-free, and collision-safe enough to catch a swapped or
    * toggled benchmark loudly. `(0, 0)` means "gate off".
    */
  private def benchSig(benchFps: DataFrame): (Long, Long) = {
    val r = benchFps.agg(count(lit(1)), expr("bit_xor(fp)")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def writeMeta(spark: SparkSession, outDir: String, numShards: Int,
      sig: (Long, Long), gateOn: Boolean): Unit =
    // `winc` marks a gate-on dir founded by winc-logging code — the
    // [[regate]] precondition (an upgraded dir founded before the log
    // existed has docs with no recorded decontam fps, so a regate over it
    // would silently under-flag; it must refuse instead)
    spark.range(1).select(lit(numShards).as("num_shards"),
        lit(sig._1).as("bench_n"), lit(sig._2).as("bench_x"),
        lit(gateOn).as("bench_on"), lit(gateOn).as("winc"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")

  private def writeReport(spark: SparkSession, path: String,
      rows: Seq[RollRow], withContam: Boolean): Unit = {
    val sq = spark
    import sq.implicits._
    val full = rows.map(r =>
        (r.lang, r.source, r.docsIn, r.docsKept, r.tokensKept, r.docsContam))
      .toDF("lang", "source", "docs_in", "docs_kept", "tokens_kept",
        "docs_contaminated")
    val shaped = if (withContam) full else full.drop("docs_contaminated")
    // coalesce(1) + sortWithinPartitions ≡ a total sort by Spark's own
    // string ordering (one partition), matching the one-shot
    // funnelRollup artifact's row order — without the range-sampling
    // job + 32-task exchange an orderBy would run for ≤|lang×source|
    // driver-held rows
    shaped.coalesce(1).sortWithinPartitions(col("lang"), col("source"))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def writeCommit(spark: SparkSession, outDir: String, epochId: Long,
      st: EpochState, res: EpochResult,
      regateSig: Option[(Long, Long)] = None): Unit = {
    val rows: Seq[CommitRow] =
      // 'rg' marks a REGATE's commit, so a regate replay can tell itself
      // apart from an ordinary committed epoch (see the regate guard); it
      // carries the benchmark fingerprint so the replay can also verify
      // it was handed the SAME benchmark before re-pinning the meta
      regateSig.map(s => CommitRow("rg", epoch = Some(epochId),
        bench_n = Some(s._1), bench_x = Some(s._2))).toSeq ++
      st.fpPtr.toSeq.sortBy(_._1).flatMap { case (b, es) =>
        es.map(e => CommitRow("fp", bucket = Some(b), epoch = Some(e),
          n_buckets = Some(st.fpNB))) } ++
      st.vPtr.toSeq.sortBy(_._1).flatMap { case (b, es) =>
        es.map(e => CommitRow("v", bucket = Some(b), epoch = Some(e),
          n_buckets = Some(st.vNB))) } ++
      st.kPtr.toSeq.sortBy(_._1).flatMap { case (b, es) =>
        es.map(e => CommitRow("k", bucket = Some(b), epoch = Some(e),
          n_buckets = Some(st.kNB))) } ++
      (if (st.wvFolded >= 0L)
        Seq(CommitRow("wv", epoch = Some(st.wvFolded))) else Nil) ++
      st.wvChunks.sorted.map(c => CommitRow("wvc", epoch = Some(c))) ++
      (if (st.wcFolded >= 0L)
        Seq(CommitRow("wc", epoch = Some(st.wcFolded))) else Nil) ++
      st.wcChunks.sorted.map(c => CommitRow("wcc", epoch = Some(c))) ++
      (if (st.qFolded >= 0L)
        Seq(CommitRow("qf", epoch = Some(st.qFolded))) else Nil) ++
      st.qChunks.sorted.map(c => CommitRow("qfc", epoch = Some(c))) ++
      st.fpUnion.toSeq.sorted.map(b => CommitRow("fpu", bucket = Some(b))) ++
      st.rollup.values.toSeq.sortBy(r => (r.lang, r.source)).map(r =>
        CommitRow("roll", lang = Some(r.lang), source = Some(r.source),
          docs_in = Some(r.docsIn), docs_kept = Some(r.docsKept),
          tokens_kept = Some(r.tokensKept), docs_contam = Some(r.docsContam))) ++
      st.shardKept.toSeq.sortBy(_._1).map { case (s, n) =>
        CommitRow("shard", shard = Some(s), n_kept = Some(n)) } ++
      Seq(CommitRow("res", docs_seen = Some(res.docsSeen),
        docs_kept = Some(res.docsKept), added = Some(res.added),
        removed = Some(res.removed),
        changed_shards = Some(res.changedShards)))
    val sq = spark
    import sq.implicits._
    rows.toDS().toDF().coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/state/commit/epoch=$epochId")
    stateCache.put(outDir, (epochId, st))
  }

  /** The committed [[EpochState]] of epoch `e`, or None when `e` was
    * committed by a pre-commit-artifact layout (the caller then runs the
    * compacting migration). `useCache = false` forces the parquet read —
    * cleanup paths use it so a replay can never prune against a stale
    * in-JVM image.
    */
  private def loadEpochState(spark: SparkSession, outDir: String, e: Long,
      useCache: Boolean): Option[EpochState] = {
    val cached = if (useCache) stateCache.get(outDir).filter(_._1 == e) else None
    cached match {
      case Some((_, st)) => Some(st)
      case None =>
        val path = s"$outDir/state/commit/epoch=$e"
        if (!isCommitted(spark, path)) None
        else {
          val sq = spark
          import sq.implicits._
          val rows = spark.read
            .schema(org.apache.spark.sql.Encoders.product[CommitRow].schema)
            .parquet(path).as[CommitRow].collect()
          val fp = rows.filter(_.kind == "fp")
          val v = rows.filter(_.kind == "v")
          val k = rows.filter(_.kind == "k")
          def ptrOf(rs: Array[CommitRow]): Map[Int, Seq[Long]] =
            rs.groupBy(_.bucket.get)
              .view.mapValues(_.map(_.epoch.get).toSeq.sorted).toMap
          val st = EpochState(
            ptrOf(fp),
            fp.headOption.flatMap(_.n_buckets).getOrElse(FpBuckets),
            ptrOf(v),
            v.headOption.flatMap(_.n_buckets).getOrElse(VBuckets),
            rows.filter(_.kind == "roll").map(r =>
              (r.lang.get, r.source.get) -> RollRow(r.lang.get, r.source.get,
                r.docs_in.get, r.docs_kept.get, r.tokens_kept.get,
                r.docs_contam.getOrElse(0L))).toMap,
            rows.filter(_.kind == "shard")
              .map(r => r.shard.get -> r.n_kept.get).toMap,
            ptrOf(k),
            k.headOption.flatMap(_.n_buckets).getOrElse(KBuckets),
            rows.find(_.kind == "wv").flatMap(_.epoch).getOrElse(-1L),
            rows.filter(_.kind == "wvc").flatMap(_.epoch).toSeq.sorted,
            rows.find(_.kind == "wc").flatMap(_.epoch).getOrElse(-1L),
            rows.filter(_.kind == "wcc").flatMap(_.epoch).toSeq.sorted,
            rows.find(_.kind == "qf").flatMap(_.epoch).getOrElse(-1L),
            rows.filter(_.kind == "qfc").flatMap(_.epoch).toSeq.sorted,
            rows.filter(_.kind == "fpu").flatMap(_.bucket).toSet)
          if (useCache) stateCache.put(outDir, (e, st))
          Some(st)
        }
    }
  }

  /** Post-marker cleanup for a committed epoch — idempotent, re-runnable
    * by a replay that arrives after the marker: drop superseded commit /
    * verdict / fpcnt state (bucket epochs stay alive exactly as long as
    * the CURRENT pointer maps reference them), the epoch's transient
    * staging, and — once the epoch committed under the gen3 layout — the
    * legacy `state/sigs` / `state/texts` / `state/fpmap` /
    * `state/epochres` / `state/verdicts` dirs a migrated deployment left
    * behind (the migration consumed them exactly once; without this an
    * upgraded outDir would keep a permanent full-text mirror on disk).
    * `stIn` carries the referenced sets on the normal commit path; the
    * replay short-circuit re-reads them from the commit artifact (never
    * the JVM cache — a wiped-and-recreated outDir must not prune against
    * a stale image).
    */
  private def cleanupAfterCommit(spark: SparkSession, outDir: String,
      epochId: Long, stIn: Option[EpochState]): Unit = {
    val gen3 = isCommitted(spark, s"$outDir/state/commit/epoch=$epochId")
    val st: Option[EpochState] =
      stIn.orElse(if (gen3) loadEpochState(spark, outDir, epochId,
        useCache = false) else None)
    def pruneEpochs(dir: String, keep: Long => Boolean): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("epoch="))
          .filter(d => !keep(d.getName.stripPrefix("epoch=").toLong))
          .foreach(old => fs.delete(old, true))
    }
    pruneEpochs(s"$outDir/state/commit", _ >= epochId)
    // bucket state lives as long as the CURRENT pointer maps reference it
    // (a bucket an epoch didn't touch keeps pointing at its older copy)
    val fpRef: Set[Long] = st.map(_.fpPtr.values.flatten.toSet).getOrElse {
      // legacy-committed epoch: referenced set from its fpmap artifact
      if (!hasDataFiles(spark, s"$outDir/state/fpmap/epoch=$epochId")) Set.empty
      else spark.read.parquet(s"$outDir/state/fpmap/epoch=$epochId")
        .select(col("epoch")).distinct().collect().map(_.getLong(0)).toSet
    }
    val vRef: Set[Long] = st.map(_.vPtr.values.flatten.toSet).getOrElse(Set.empty)
    val kRef: Set[Long] = st.map(_.kPtr.values.flatten.toSet).getOrElse(Set.empty)
    // family layer dirs: epoch=e live iff not yet superseded or referenced;
    // fold=f dirs are referenced as the NEGATIVE id -f
    def pruneFamily(dir: String, refs: Set[Long]): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        fs.listStatus(p).toSeq.map(_.getPath).foreach { d =>
          val n = d.getName
          val dead =
            if (n.startsWith("epoch=")) {
              val e = n.stripPrefix("epoch=").toLong
              e < epochId && !refs.contains(e)
            } else if (n.startsWith("fold=")) {
              val f = n.stripPrefix("fold=").toLong
              f < epochId && !refs.contains(-f)
            } else false
          if (dead) { fs.delete(d, true); () }
        }
    }
    pruneFamily(s"$outDir/state/fpcnt", fpRef)
    pruneFamily(s"$outDir/state/vbkt", vRef)
    pruneFamily(s"$outDir/state/kbkt", kRef)
    // batch-keyed append-only logs (window log + the gate-revision
    // logs), one shared rule: flats folded into a chunk are superseded
    // once the fold's commit landed; chunks themselves are immutable and
    // permanent EXCEPT orphans — a chunk written by a crashed attempt
    // whose batch later re-processed under a different id (replaced
    // checkpoint) is referenced by no commit's live set and is deleted
    // rather than duplicating the log's rows in every later read. Only a
    // liveness-aware commit (nonempty chunk rows) may prune chunks: a
    // state committed by chunk-writing code that predates explicit
    // liveness reads back an empty list, and pruning against that would
    // delete every LIVE chunk of an upgraded dir.
    def pruneBatchLog(flatRoot: String, chunkRoot: String,
        folded: Option[Long], liveIn: Option[Seq[Long]]): Unit = {
      folded.filter(_ >= 0L).foreach { ft =>
        val p = new org.apache.hadoop.fs.Path(flatRoot)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p))
          fs.listStatus(p).toSeq.map(_.getPath)
            .filter(_.getName.startsWith("batch="))
            .filter(_.getName.stripPrefix("batch=").toLong <= ft)
            .foreach(d => fs.delete(d, true))
      }
      liveIn.filter(_.nonEmpty).foreach { chunks =>
        val live = chunks.toSet
        listPartitionLongs(spark, chunkRoot, "chunk=")
          .filter(c => c < epochId && !live.contains(c))
          .foreach(c => deleteDir(spark, s"$chunkRoot/chunk=$c"))
      }
    }
    pruneBatchLog(s"$outDir/state/winv", s"$outDir/state/winvc",
      st.map(_.wvFolded), st.map(_.wvChunks))
    pruneBatchLog(s"$outDir/state/winc", s"$outDir/state/wincc",
      st.map(_.wcFolded), st.map(_.wcChunks))
    pruneBatchLog(s"$outDir/state/quar", s"$outDir/state/quarc",
      st.map(_.qFolded), st.map(_.qChunks))
    if (gen3) {
      // the gen3 commit supersedes every legacy artifact wholesale
      Seq("sigs", "texts", "fpmap", "epochres", "verdicts")
        .foreach(d => deleteDir(spark, s"$outDir/state/$d"))
    } else {
      // epoch committed by a legacy layout (replay short-circuit only):
      // the legacy pruning rules, and NEVER sigs/texts — the next real
      // epoch's migration still needs them
      Seq(s"$outDir/state/verdicts", s"$outDir/state/fpmap",
        s"$outDir/state/epochres")
        .foreach(dir => pruneEpochs(dir, _ >= epochId))
    }
    // drop this epoch's own staging and every superseded attempt — but
    // SPARE a newer in-flight regate's root: its `bsig` fingerprint is
    // both the guard that keeps epochs from running over the
    // half-revised corpus and the key that lets the regate resume with
    // its original benchmark (belt to the guard's braces — the guard
    // refuses such epochs outright, so this path should never see one)
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/state/staging")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        fs.listStatus(p).toSeq.map(_.getPath).foreach { d =>
          val n = d.getName
          val spare = n.startsWith("regate=") &&
            n.stripPrefix("regate=").toLong > epochId
          if (!spare) { fs.delete(d, true); () }
        }
    }
  }

  /** The persisted result row of a committed epoch (written inside its
    * commit marker), for the replay short-circuit. Falls back to the
    * legacy `epochres` artifact, then to counts re-derived from the
    * legacy verdict state — that last fallback reports `added = 0`,
    * `removed = 0`, `changedShards = Nil` because the pre-staging layout
    * never persisted its deltas: callers replaying such an epoch get
    * correct totals but ZEROED delta fields (the state on disk is
    * complete; only this epoch's movement report is unrecoverable).
    */
  private def readEpochResult(spark: SparkSession, outDir: String,
      epochId: Long): EpochResult = {
    val commitPath = s"$outDir/state/commit/epoch=$epochId"
    val legacyRes = s"$outDir/state/epochres/epoch=$epochId"
    if (hasDataFiles(spark, commitPath)) {
      val r = spark.read.parquet(commitPath).filter(col("kind") === "res").head()
      EpochResult(epochId, r.getAs[Long]("docs_seen"), r.getAs[Long]("docs_kept"),
        r.getAs[Long]("added"), r.getAs[Long]("removed"),
        r.getAs[scala.collection.Seq[Int]]("changed_shards").toSeq)
    } else if (hasDataFiles(spark, legacyRes)) {
      val r = spark.read.parquet(legacyRes).head()
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

  /** Epoch ids under `outDir` whose write fully committed — the gen3
    * commit artifact's `_SUCCESS`, or (legacy bases) the verdict-state
    * `_SUCCESS` (a crash mid-job-commit can leave a partial file set that
    * `hasDataFiles` alone would mistake for a complete state).
    */
  private def committedEpochs(spark: SparkSession, outDir: String): Seq[Long] = {
    def ids(path: String): Seq[Long] = {
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
    (ids(s"$outDir/state/commit") ++ ids(s"$outDir/state/verdicts")).distinct
  }

  /** Integer suffixes of `<prefix>N` child dirs under `dir` — the free
    * (listing-only) way to learn which partitions a write landed.
    */
  private def listPartitionInts(spark: SparkSession, dir: String,
      prefix: String): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toInt).toSet
  }

  private def listPartitionLongs(spark: SparkSession, dir: String,
      prefix: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong).toSet
  }

  /** The LIVE window-log chunks of a committed base: the commit
    * artifact's `wvc` rows, or — for a state committed by chunk-writing
    * code that predates explicit liveness — every `_SUCCESS`-committed
    * chunk dir at or below the base epoch (the pre-`wvc` read rule, so
    * an upgraded dir neither skips its chunks nor has them deleted as
    * orphans).
    */
  private def liveChunks(spark: SparkSession, outDir: String,
      prevState: Option[EpochState], lastCommitted: Option[Long])
      : Seq[Long] = prevState match {
    case Some(st) if st.wvChunks.nonEmpty => st.wvChunks
    case _ =>
      listPartitionLongs(spark, s"$outDir/state/winvc", "chunk=")
        .filter(c => lastCommitted.exists(c <= _) &&
          isCommitted(spark, s"$outDir/state/winvc/chunk=$c"))
        .toSeq.sorted
  }

  /** Fold the accumulated flat `batch=` dirs of an append-only batch-
    * keyed log into ONE immutable chunk dir (`<chunkRoot>/chunk=<epoch>`,
    * `batch` carried as a data column) once [[FpCompactAt]] of them pile
    * up below `epochId` — the same dir-count bound the window-log fold
    * gives `state/winv`, applied to the gate-revision logs (`state/winc`
    * decontam fps, `state/quar` quarantine texts), whose flat dirs
    * otherwise grow one per gate-on epoch for the stream's lifetime.
    * Returns the new folded-through watermark (or `prevFolded` when no
    * fold ran). Deterministic per epoch, so a crash replay rewrites the
    * same chunk; the caller records liveness in the commit artifact and
    * cleanup prunes folded flats and orphan chunks after the marker.
    */
  private def foldBatchLog(spark: SparkSession, flatRoot: String,
      chunkRoot: String, schema: org.apache.spark.sql.types.StructType,
      epochId: Long, prevFolded: Long): Long = {
    val foldable = listPartitionLongs(spark, flatRoot, "batch=")
      .filter(b => b > prevFolded && b < epochId).toSeq.sorted
    if (foldable.size < FpCompactAt) prevFolded
    else {
      val bytes = foldable.map(b => dirBytes(spark, s"$flatRoot/batch=$b")).sum
      val parts = math.min(8L, 1L + bytes / (256L << 20)).toInt
      spark.read.schema(schema).parquet(flatRoot)
        .filter(col("batch").isInCollection(foldable))
        .coalesce(parts)
        .write.mode(SaveMode.Overwrite).parquet(s"$chunkRoot/chunk=$epochId")
      foldable.max
    }
  }

  /** Recursive byte size of `dir` (driver FS metadata — free on local
    * disk/HDFS), used to size fold write parallelism.
    */
  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
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

  /** Empty frame with the gen3 verdict-state schema — the epoch-0 delta
    * base. Derived THROUGH the producer over empty inputs (only the
    * narrow sigs/winv input contracts are spelled out here), so a schema
    * change in the one-copy formula can never leave this branch emitting
    * a stale shape.
    */
  private def emptyVerdictState(spark: SparkSession): DataFrame =
    Curation.verdictsFullFrom(
      spark.range(0).select(col("id").as("doc_id"), lit("").as("lang"),
        lit("").as("source"), col("id").as("n_tok"), lit(0.0).as("h"),
        lit("").as("bag")),
      spark.range(0).select(col("id").as("doc_id"), col("id").as("fp")))
      .withColumn("contam", lit(false)).select(StateCols.map(col): _*)

  /** Empty keeper side-state frame — the epoch-0 base and the schema
    * anchor for [[kbktSchema]].
    */
  private def emptyKeeperState(spark: SparkSession): DataFrame =
    spark.range(0).select(lit("").cast("string").as("bag"),
      col("id").as("keeper"))

  /** Explicit read schemas for the hot state dirs. A schema-inferring
    * `spark.read.parquet` runs a footer-read job per call, and one
    * steady-state epoch opens these dirs a dozen-plus times (three
    * layered verdict probes × pointed layers, the fp layers, the winv
    * log) — at ~20–50 ms of job+scheduling latency each, inference was
    * a visible slice of the fixed per-epoch overhead. Derived THROUGH
    * the producer formulas (one-copy rule) so a formula change can
    * never strand a stale shape here; `bucket`/`batch` resolve as
    * partition columns on partitioned layers and as data columns on
    * flat delta layers — the same schema satisfies both layouts.
    */
  // memoized per JVM (a StructType is session-independent, and the
  // derivation analyzes a multi-join plan — not something to re-run on
  // every one of an epoch's dozen-plus layer opens)
  private val stateSchemas =
    scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.types.StructType]()
  private def vbktSchema(spark: SparkSession) =
    stateSchemas.getOrElseUpdate("vbkt",
      emptyVerdictState(spark).withColumn("bucket", vBucket(col("doc_id")))
        .schema)
  private def fpcntSchema(spark: SparkSession) =
    stateSchemas.getOrElseUpdate("fpcnt",
      spark.range(0).select(col("id").as("fp"), col("id").as("nd"),
        fpBucket(col("id")).as("bucket")).schema)
  private def kbktSchema(spark: SparkSession) =
    stateSchemas.getOrElseUpdate("kbkt",
      emptyKeeperState(spark).withColumn("bucket", kBucket(col("bag")))
        .schema)
  private def winvSchema(spark: SparkSession, withBatch: Boolean) =
    stateSchemas.getOrElseUpdate(s"winv:$withBatch", {
      val base = Curation.winFpsOver(
        spark.range(0).select(col("id").as("doc_id"),
          array(lit("")).as("toks")), 1)
      (if (withBatch) base.withColumn("batch", col("doc_id")) else base).schema
    })
  private def winvcSchema(spark: SparkSession) =
    stateSchemas.getOrElseUpdate("winvc",
      Curation.winFpsOver(
        spark.range(0).select(col("id").as("doc_id"),
          array(lit("")).as("toks")), 1)
        .withColumn("bucket", fpBucket(col("fp"))).schema)
  // quarantine rows: the verdict-state identity columns + the parked
  // text; `batch` resolves as a partition column on the flat batch= dirs
  // and as a data column on folded chunks (same rule as winvSchema)
  private def quarSchema(spark: SparkSession) =
    stateSchemas.getOrElseUpdate("quar",
      emptyVerdictState(spark)
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
        .withColumn("text", lit("").cast("string"))
        .withColumn("batch", col("doc_id"))
        .schema)

  /** Attach the incremental pipeline to a document stream with `doc_id`,
    * `lang`, `source`, `text`. `benchmark` enables the decontamination
    * gate for every epoch (fixed for the life of the outDir until a
    * [[regate]] — see [[curateEpoch]]).
    *
    * Epoch ids are `batchId + offset`, where the offset is captured ONCE
    * per stream run on its FIRST batch B — empty or not (emptiness is
    * irrelevant to the formula: the dense batch→epoch mapping below
    * commits an epoch for every batch, so `newestCommitted` advances in
    * lockstep with the batch counter either way) — as
    * `newestCommitted + 1 - B`. This rule is SELF-STABILIZING across
    * restarts: when the previous run crashed inside batch B (epochs
    * before it committed under offset O, so newestCommitted = O + B - 1),
    * the resumed run recomputes O + B - 1 + 1 - B = O — the replayed
    * batch keeps its EXACT epoch id, which is what the staging crash
    * protocol requires (a replay under a different id would rebuild
    * staging from a possibly half-overwritten corpus instead of reusing
    * the committed one). At the same time a REPLACED checkpoint (batch
    * ids restarting at 0) or a [[regate]] committed between runs (whose
    * epoch id a continuing checkpoint's counter knows nothing about)
    * re-bases past everything committed instead of colliding or
    * tripping the out-of-order guard. The one benign wrinkle: a batch
    * re-delivered AFTER its epoch committed (crash between the commit
    * marker and the checkpoint ack) resumes as newestCommitted + 1 — a
    * pure re-delivery, which the seen-filter reduces to a heartbeat.
    * The formula requires a DENSE batch→epoch mapping, which is why the
    * foreachBatch below commits an epoch for every batch, empty ones
    * included (they take the heartbeat fast path).
    */
  def startIncremental(docs: org.apache.spark.sql.DataFrame, outDir: String,
      checkpoint: String, numShards: Int = 16,
      benchmark: Option[DataFrame] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // one offset per stream RUN, resolved on the run's FIRST batch of
    // any kind — empty included (the compareAndSet below runs before the
    // emptiness branch inside curateEpoch; it is only deferred to here,
    // rather than computed at start(), because it needs the batch's
    // session for the FS listing)
    val offset = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // EVERY batch commits an epoch — an empty one degenerates to the
        // heartbeat fast path. Skipping empty batches would leave a gap
        // in the batch→epoch mapping, and the self-stabilizing offset
        // derivation (newestCommitted + 1 - firstBatch) is only correct
        // when every batch id below the first one maps to a committed
        // epoch: with a gap, a post-apply crash would replay its batch
        // under a SHIFTED id and rebuild staging from the mutated corpus.
        offset.compareAndSet(Long.MinValue,
          committedEpochs(b.sparkSession, outDir).maxOption
            .map(_ + 1L).getOrElse(0L) - id)
        curateEpoch(b, outDir, numShards, offset.get + id, benchmark)
        ()
      }
      .start()
  }

  /** BENCHMARK REVISION for a gate-on incremental outDir: re-evaluate
    * the contamination flag of EVERY doc ever seen against
    * `newBenchmark`, rewrite the verdict state via the compaction path,
    * adjust the corpus BOTH ways (docs contaminated only under the old
    * benchmark RESURRECT from the quarantine; newly-contaminated kept
    * docs are removed and quarantined), recompute report + manifest, and
    * re-pin the meta fingerprint — after which epochs must carry
    * `newBenchmark` (a non-regated drifted benchmark still fails loudly).
    *
    * One declared O(corpus) pass: contamination is doc-local given a
    * benchmark, recomputed from the persisted decontam-fp log
    * (`state/winc`) — no dropped doc's text is needed; resurrection text
    * comes from `state/quar`. Preconditions (all fail loudly): the dir
    * is gate-on AND was founded by winc-logging code (meta `winc` flag),
    * at least one commit-artifact epoch exists, and `epochId` exceeds
    * every committed epoch (it joins the epoch sequence; a stream
    * resumed via [[startIncremental]] re-bases past it automatically).
    *
    * Crash protocol (the epoch commit-marker design): every write is
    * deterministic from (base state, winc log, quarantine, benchmark);
    * the consolidated new quarantine and the changed shards' staging
    * land atomically BEFORE the corpus overwrite; the commit artifact is
    * the marker; the META re-pin lands LAST, after the marker — a crash
    * between the two leaves committed v2 state under a v1 meta, which
    * the next epoch rejects loudly and a re-run of regate (same id)
    * repairs by short-circuiting to the meta rewrite.
    */
  def regate(spark: SparkSession, outDir: String, newBenchmark: DataFrame,
      epochId: Long): EpochResult = {
    require(hasDataFiles(spark, s"$outDir/meta"),
      s"$outDir has no meta artifact — nothing to regate")
    val m = spark.read.parquet(s"$outDir/meta").head()
    val numShards = m.getAs[Int]("num_shards")
    require(m.schema.fieldNames.contains("bench_on") &&
        m.getAs[Boolean]("bench_on"),
      s"regate requires a decontamination-gated outDir; $outDir is gate-off")
    require(m.schema.fieldNames.contains("winc") && m.getAs[Boolean]("winc"),
      s"$outDir was founded before the decontam-fp log existed — its docs " +
        "have no recorded fps, so a regate would silently under-flag; " +
        "re-found the corpus instead")
    val fps2 = Curation.benchmarkFps(newBenchmark).localCheckpoint()
    val sig2 = benchSig(fps2)
    def repinMeta(): Unit = {
      writeMeta(spark, outDir, numShards, sig2, gateOn = true)
      metaCache.put(outDir, (numShards, true, sig2._1, sig2._2))
      benchCachePut(outDir, (newBenchmark, fps2, sig2))
    }
    val committed = committedEpochs(spark, outDir)
    if (committed.contains(epochId)) {
      // only a COMPLETED REGATE may short-circuit (finishing its
      // post-marker steps) — the commit artifact carries an 'rg' marker
      // row for exactly this check. Handing an ORDINARY committed
      // epoch's id to regate must fail loudly instead: silently
      // re-pinning the meta to v2 over v1-flagged state (and pruning the
      // quarantine — the only stored text of resurrectable docs) would
      // be irreversible corruption.
      // hasDataFiles guard: an epoch committed under the LEGACY verdict
      // layout has no commit artifact at all — it is certainly not a
      // regate, and the read would otherwise throw path-not-found
      // instead of the message below
      val commitPath = s"$outDir/state/commit/epoch=$epochId"
      val rgRow: Option[CommitRow] =
        if (!hasDataFiles(spark, commitPath)) None
        else {
          val sq = spark
          import sq.implicits._
          spark.read
            .schema(org.apache.spark.sql.Encoders.product[CommitRow].schema)
            .parquet(commitPath).filter(col("kind") === "rg")
            .as[CommitRow].collect().headOption
        }
      require(rgRow.isDefined,
        s"epoch $epochId in $outDir is an ordinary committed epoch, not " +
          "a regate — refusing to re-pin the benchmark over unflagged state")
      // ...and it must be a regate against THIS benchmark: the replay
      // short-circuit only finishes the post-marker steps (meta re-pin +
      // quarantine prune), so re-pinning to a benchmark the committed
      // verdict state was never flagged under — and then pruning the
      // quarantine, the only stored text of resurrectable docs — would
      // be irreversible silent corruption. The 'rg' row records the
      // fingerprint at commit for exactly this check; a pre-recording
      // commit (bench_n absent) fails the same way rather than guessing.
      val storedSig: Option[(Long, Long)] =
        for { r <- rgRow; n <- r.bench_n; x <- r.bench_x } yield (n, x)
      require(storedSig.contains(sig2),
        s"epoch $epochId in $outDir is a committed regate against a " +
          s"DIFFERENT benchmark (recorded fingerprint " +
          s"${storedSig.map(_.toString).getOrElse(
            "unrecorded — the commit predates fingerprint recording")}, " +
          s"caller's $sig2) — re-pinning the meta would put the corpus " +
          "under a benchmark its verdict state was never evaluated " +
          "against; replay a regate only with its original benchmark")
      repinMeta()
      cleanupAfterCommit(spark, outDir, epochId, None)
      pruneQuarBefore(spark, outDir, epochId)
      return readEpochResult(spark, outDir, epochId)
    }
    require(committed.forall(_ < epochId),
      s"regate epoch $epochId must exceed every committed epoch " +
        s"(${committed.sorted.mkString(", ")}) — it joins the epoch sequence")
    val last = committed.maxOption.getOrElse(throw new IllegalArgumentException(
      s"$outDir has no committed epoch to regate"))
    val st = loadEpochState(spark, outDir, last, useCache = false)
      .getOrElse(throw new IllegalArgumentException(
        s"$outDir's newest epoch $last predates the commit-artifact " +
          "layout; run one epoch to migrate before regating"))

    // IN-FLIGHT fingerprint, recorded BEFORE the regate's first durable
    // write: the quarantine consolidation and staging are keyed only by
    // (epochId, base) on disk, so a crashed (uncommitted) regate re-run
    // with a DIFFERENT benchmark would silently reuse the previous
    // benchmark's committed quarantine/staging — and after a post-apply
    // crash the old quarantine may hold the ONLY text of docs that
    // benchmark's apply already removed from the corpus, so deleting and
    // rebuilding under the new gate is just as destructive as reusing.
    // Refusing is the only loss-free move: finish the in-flight regate
    // with its original benchmark first, then revise at the next id.
    val bsigDir = s"$outDir/state/staging/regate=$epochId/bsig"
    if (isCommitted(spark, bsigDir)) {
      val r = spark.read.parquet(bsigDir).head()
      require((r.getLong(0), r.getLong(1)) == sig2,
        s"an in-flight (uncommitted) regate at epoch $epochId in $outDir " +
          s"ran with a DIFFERENT benchmark (recorded fingerprint " +
          s"(${r.getLong(0)}, ${r.getLong(1)}), caller's $sig2) — its " +
          "quarantine and staging are keyed by id alone, and its corpus " +
          "apply may already have landed; finish it with its original " +
          "benchmark, then revise at the next epoch id")
    } else {
      require(!isCommitted(spark, s"$outDir/state/quar/batch=$epochId"),
        s"epoch $epochId in $outDir already has a quarantine flat but no " +
          "in-flight regate fingerprint — either an ORDINARY epoch " +
          "crashed at this id (replay that epoch / resume the stream, " +
          "then regate at a fresh id: adopting its partial batch " +
          "quarantine as a consolidation would lose resurrectable text) " +
          "or a regate crashed under a pre-fingerprint binary (finish it " +
          "with its original benchmark on that binary); refusing either way")
      spark.range(1).select(lit(sig2._1).as("bench_n"),
          lit(sig2._2).as("bench_x"))
        .write.mode(SaveMode.Overwrite).parquet(bsigDir)
    }

    // contamination vs the NEW benchmark for every doc ever seen, from
    // the fp log (docs shorter than the decontam width have no rows and
    // are clean by the same rule the epochs apply). The matched set is
    // contamination-sized, joined plain (it can be corpus-scale under an
    // adversarial revision — this is the declared O(corpus) pass).
    val wincPath = s"$outDir/state/winc"
    // the watermark filter matches the crossing read's rule: a crash
    // between a fold's commit and its cleanup leaves the folded flats on
    // disk, and without the bound they would be read twice (once flat,
    // once from the live chunk) — harmless for correctness (distinct /
    // dropDuplicates downstream) but wasted I/O on the O(corpus) pass
    val wincFlat =
      if (hasDataFiles(spark, wincPath))
        spark.read.schema(winvSchema(spark, withBatch = true))
          .parquet(wincPath).filter(col("batch") > st.wcFolded)
      else spark.range(0).select(col("id").as("doc_id"), col("id").as("fp"),
        col("id").as("batch"))
    // folded chunks carry `batch` as a data column; the liveness list is
    // authoritative (orphans from crashed fold attempts are never read)
    val winc = st.wcChunks
      .map(c => spark.read.schema(winvSchema(spark, withBatch = true))
        .parquet(s"$outDir/state/wincc/chunk=$c"))
      .foldLeft(wincFlat)(_ unionByName _)
      .filter(col("batch") <= last)
      .select(col("doc_id"), col("fp"))
    val contam2 = Curation.contaminatedOf(winc, fps2)
      .withColumn("_c2", lit(true))
    val keptBase = Curation.keptExpr(col("n_tok"), col("h"),
      col("bag_keep"), Curation.spanDropExpr(col("n_win"), col("n_dup")))
    val v2 = readVBuckets(spark, outDir, st.vPtr, None)
      .withColumnRenamed("contam", "_c1").withColumnRenamed("kept", "_k1")
      .join(contam2, Seq("doc_id"), "left")
      .withColumn("contam", coalesce(col("_c2"), lit(false)))
      .withColumn("kept", Curation.contamKept(keptBase, col("contam")))
      .drop("_c2")
      .localCheckpoint() // consumed by state write, counts, quar, staging

    // ONE aggregation yields the new rollup; a second (changed rows only)
    // the shard deltas; kept-shard counts from a third over the kept set
    val shardOf = Layout.shardKey(col("doc_id"), numShards)
    val rollup2: Map[(String, String), RollRow] =
      v2.groupBy(col("lang"), col("source")).agg(
        count(lit(1)).as("di"),
        coalesce(sum(when(col("kept"), 1L).otherwise(0L)), lit(0L)).as("dk"),
        coalesce(sum(when(col("kept"), col("n_tok")).otherwise(0L)), lit(0L)).as("tk"),
        coalesce(sum(when(col("contam"), 1L).otherwise(0L)), lit(0L)).as("dc"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> RollRow(
          r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toMap
    val chAgg = v2.filter(col("_k1") =!= col("kept"))
      .groupBy(shardOf.as("shard")).agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("adds"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("rems"))
      .collect()
    val deltas: Seq[Int] = chAgg.map(_.getInt(0)).toSeq.sorted
    val nAdded = chAgg.map(_.getLong(1)).sum
    val nRemoved = chAgg.map(_.getLong(2)).sum
    val shardKept2: Map[Int, Long] = v2.filter(col("kept"))
      .groupBy(shardOf.as("shard")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    // text sources: the corpus (docs kept under v1) and the old
    // quarantine (contaminated-but-otherwise-kept under v1) — between
    // them every doc that can be kept or quarantined under v2
    val corpusPath = s"$outDir/corpus"
    val emptyText = spark.range(0)
      .select(col("id").as("doc_id"), lit("").cast("string").as("text"))
    val corpusText =
      if (hasDataFiles(spark, corpusPath))
        spark.read.parquet(corpusPath).select(col("doc_id"), col("text"))
      else emptyText
    val quarPath = s"$outDir/state/quar"
    val quarFlat =
      if (hasDataFiles(spark, quarPath))
        spark.read.schema(quarSchema(spark)).parquet(quarPath)
          .filter(col("batch") > st.qFolded) // same crash-window bound
          .select(col("doc_id"), col("text"))
      else emptyText
    val oldQuar = st.qChunks
      .map(c => spark.read.schema(quarSchema(spark))
        .parquet(s"$outDir/state/quarc/chunk=$c")
        .select(col("doc_id"), col("text")))
      .foldLeft(quarFlat)(_ unionByName _)
    val textAll = corpusText.unionByName(oldQuar).dropDuplicates("doc_id")

    // new quarantine, consolidated and committed BEFORE the corpus
    // overwrite (a crash replay re-derives it from the still-intact
    // corpus; once its _SUCCESS exists the content is final)
    val quarDir = s"$outDir/state/quar/batch=$epochId"
    if (!isCommitted(spark, quarDir)) {
      val quarJoined = v2.filter(col("contam") && keptBase)
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
        .join(textAll, Seq("doc_id"), "left")
        .localCheckpoint()
      val missing = quarJoined.filter(col("text").isNull).count()
      require(missing == 0L,
        s"quarantine coverage hole: $missing contaminated-but-keepable " +
          "docs have no stored text — state corruption, refusing to regate")
      quarJoined.coalesce(1).write.mode(SaveMode.Overwrite).parquet(quarDir)
    }

    // changed shards rewrite via the epoch staging protocol — under a
    // DISTINCT `regate=` root, never the stream's `epoch=` namespace: a
    // regate at the natural id last+1 that crashes between its staging
    // commit and its marker is abandoned when the stream restarts (the
    // resumed run re-bases to the same id), and a shared path would let
    // curateEpoch reuse the regate's staged v2 shards as its own —
    // applying content the epoch never computed and deleting shards it
    // never staged. A crash replay of regate itself (same id) still
    // finds its staging here deterministically.
    if (deltas.nonEmpty) {
      val stagingRoot = s"$outDir/state/staging/regate=$epochId"
      val stagingPath = s"$stagingRoot/base=$last"
      if (!isCommitted(spark, stagingPath)) {
        // only the half-written attempt at THIS base — never the root,
        // which also holds the in-flight fingerprint (`bsig`). A
        // different-base stale attempt cannot exist: once bsig lands, the
        // in-flight guard keeps every epoch from committing until this
        // regate finishes, so `last` is stable across its attempts
        deleteDir(spark, stagingPath)
        v2.filter(col("kept")).withColumn("shard", shardOf)
          .filter(col("shard").isInCollection(deltas))
          .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
            col("shard"))
          .join(textAll, Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
            col("text"), col("shard"))
          .repartition(deltas.size, col("shard"))
          .write.mode(SaveMode.Overwrite).partitionBy("shard")
          .parquet(stagingPath)
      }
      if (failAfterStaging)
        throw new IllegalStateException(
          "graft test failpoint: crash after regate staging commit")
      applyStagedShards(spark, corpusPath, stagingPath, deltas)
      if (failAfterApply)
        throw new IllegalStateException(
          "graft test failpoint: crash after regate corpus apply")
    }

    syncManifest(spark, outDir, numShards, st.shardKept.keySet, deltas)
    writeReport(spark, s"$outDir/report", rollup2.values.toSeq,
      withContam = true)

    // the v2 verdict state is a fresh full copy — every bucket points at
    // this epoch; fp counts, keepers, and the window logs are untouched
    // (contamination affects neither window counts nor keeper elections)
    val vDir = s"$outDir/state/vbkt/epoch=$epochId"
    v2.select(StateCols.map(col): _*)
      .withColumn("bucket", vBucket(col("doc_id")))
      .coalesce(8)
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(vDir)
    val vPtr2 = listPartitionInts(spark, vDir, "bucket=")
      .map(_ -> Seq(epochId)).toMap
    // quarantine liveness resets: the regate's consolidated batch=<id>
    // flat subsumes every earlier quar flat AND chunk (pruneQuarBefore
    // drops them after the marker), so the new state starts the quar
    // fold cycle over; the winc log is untouched and carries forward
    val stNew = EpochState(st.fpPtr, st.fpNB, vPtr2, VBuckets,
      rollup2, shardKept2, st.kPtr, st.kNB, st.wvFolded, st.wvChunks,
      st.wcFolded, st.wcChunks, -1L, Nil, st.fpUnion)
    val result = EpochResult(epochId, stNew.docsSeen, stNew.docsKept,
      nAdded, nRemoved, deltas)
    writeCommit(spark, outDir, epochId, stNew, result,
      regateSig = Some(sig2))
    cleanupAfterCommit(spark, outDir, epochId, Some(stNew))
    pruneQuarBefore(spark, outDir, epochId)
    repinMeta() // LAST: meta never points at an uncommitted gate regime
    result
  }

  /** Drop quarantine batches superseded by a regate's consolidated
    * rewrite (every pre-regate row either moved into the new batch or
    * became permanently unresurrectable).
    */
  private def pruneQuarBefore(spark: SparkSession, outDir: String,
      epochId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/state/quar")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("batch="))
        .filter(_.getName.stripPrefix("batch=").toLong < epochId)
        .foreach(d => fs.delete(d, true))
    // folded quar chunks are superseded the same way (the regate's state
    // records qChunks = Nil, so cleanup's liveness rule would never
    // touch them — this explicit prune is their retirement path)
    listPartitionLongs(spark, s"$outDir/state/quarc", "chunk=")
      .filter(_ < epochId)
      .foreach(c => deleteDir(spark, s"$outDir/state/quarc/chunk=$c"))
  }

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
    val metaRow = spark.read.parquet(s"$outDir/meta").head()
    val numShards = metaRow.getAs[Int]("num_shards")
    // gated deployments: the report's docs_contaminated column must agree
    // with the committed rollup (driver-side, ≤ |lang×source| rows) — a
    // report tampered with or restored from the wrong run fails LOUDLY
    // here, so the audit covers the gate column, not just the shard layout
    val gateOn = metaRow.schema.fieldNames.contains("bench_on") &&
      metaRow.getAs[Boolean]("bench_on")
    if (gateOn) {
      val report = spark.read.parquet(s"$outDir/report")
      if (!report.columns.contains("docs_contaminated"))
        throw new IllegalStateException(
          s"$outDir was founded gate-on but its report lacks docs_contaminated")
      val fromReport = report
        .select(col("lang"), col("source"), col("docs_contaminated"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      for {
        e <- committedEpochs(spark, outDir).maxOption
        st <- loadEpochState(spark, outDir, e, useCache = false)
      } {
        val fromRollup = st.rollup.map { case (k, v) => k -> v.docsContam }
        if (fromReport != fromRollup)
          throw new IllegalStateException(
            s"report docs_contaminated disagrees with the committed rollup " +
              s"in $outDir: report=$fromReport rollup=$fromRollup")
      }
    }
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
