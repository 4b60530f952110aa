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
    * dropped. The epoch therefore (a) persists each batch's COMPACT
    * per-doc state once — signals `(doc_id, lang, source, n_tok, h, bag)`,
    * window fps, and text — so earlier batches' text is never re-tokenized;
    * (b) recomputes verdicts over all seen docs from that compact state
    * with the same [[graft.operators.Curation.verdictsFrom]] the batch
    * funnel uses; (c) diffs against the last COMMITTED epoch's verdicts and
    * rewrites ONLY the shards whose membership changed (dynamic partition
    * overwrite; shards a pure-append epoch doesn't touch keep their bytes);
    * (d) carries unchanged shards' manifest rows forward and recomputes
    * changed shards' rows from the corpus as re-read; (e) writes the
    * epoch's verdict set LAST as the commit marker — `state/verdicts`
    * existing for epoch e means e's artifacts are complete, and a crash
    * anywhere in between replays idempotently (all writes are
    * batch/epoch-keyed overwrites, all derivations deterministic, and the
    * delta base is always the last fully-applied verdict set).
    *
    * Scale shape: per epoch the new work is O(batch) (tokenize + signals)
    * plus the verdict recompute over compact state (bag election + fp
    * counts — token-scale aggregates, no text); the corpus write is
    * O(changed shards). The two driver-side collects are ≤ numShards ints
    * each. Re-delivered docs (same doc_id in several batches, same text —
    * the at-least-once contract) collapse via state distinct.
    */
  def curateEpoch(batch: DataFrame, outDir: String, numShards: Int,
      epochId: Long): EpochResult = {
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .dropDuplicates("doc_id")
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
      .localCheckpoint() // feeds both state writes below

    // (a) compact per-batch state, each in its own batch=<id> partition
    // (overwrite → an at-least-once retry rewrites the same bytes)
    Curation.docSignals(base)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/state/sigs/batch=$epochId")
    Curation.winFpsOver(base.select(col("doc_id"), col("toks")), Curation.SubWidth)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/state/winv/batch=$epochId")
    docs.select(col("doc_id"), col("text"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/state/texts/batch=$epochId")

    // (b) verdicts over every doc seen so far, from compact state only
    val sigs = spark.read.parquet(s"$outDir/state/sigs")
      .filter(col("batch") <= epochId)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tok"), col("h"), col("bag")).distinct()
    val winv = spark.read.parquet(s"$outDir/state/winv")
      .filter(col("batch") <= epochId)
      .select(col("doc_id"), col("fp")).distinct()
    val vNow = Curation.verdictsFrom(sigs, winv)
      .localCheckpoint() // consumed by delta, corpus, report, commit marker

    // (c) delta vs the last COMMITTED epoch (strictly earlier: a crashed
    // attempt of THIS epoch may have left its marker, which must not
    // become its own delta base). The base is found by a driver FS listing
    // of epoch dirs — O(#epochs) names, no whole-history scan — and a dir
    // counts only if it actually holds data files (a crash mid-write can
    // leave an epoch dir with only _temporary inside, which a parquet read
    // would throw on).
    val verdictsPath = s"$outDir/state/verdicts"
    val lastCommitted: Option[Long] = {
      val p = new org.apache.hadoop.fs.Path(verdictsPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith("epoch="))
        .map(_.stripPrefix("epoch=").toLong)
        .filter(_ < epochId)
        .filter(e => hasDataFiles(spark, s"$verdictsPath/epoch=$e"))
        .sorted.lastOption
    }
    val prevKept: DataFrame = lastCommitted match {
      case Some(e) => spark.read.parquet(s"$verdictsPath/epoch=$e")
        .filter(col("kept")).select(col("doc_id"))
      case None => vNow.filter(lit(false)).select(col("doc_id"))
    }
    val nowKept = vNow.filter(col("kept")).select(col("doc_id"))
    val added = nowKept.exceptAll(prevKept).localCheckpoint()
    val removed = prevKept.exceptAll(nowKept).localCheckpoint()
    val deltas = added.unionByName(removed)
      .select(Layout.shardKey(col("doc_id"), numShards).as("shard"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val nAdded = added.count()
    val nRemoved = removed.count()

    // (d) rewrite only the changed shards; explicitly drop shards whose
    // kept set emptied (dynamic overwrite never touches a partition the
    // output frame doesn't mention)
    val corpusPath = s"$outDir/corpus"
    if (deltas.nonEmpty) {
      val texts = spark.read.parquet(s"$outDir/state/texts")
        .select(col("doc_id"), col("text")).dropDuplicates("doc_id")
      val newContent = vNow.filter(col("kept"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
        .withColumn("shard", Layout.shardKey(col("doc_id"), numShards))
        .filter(col("shard").isInCollection(deltas))
        .join(texts, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
          col("text"), col("shard"))
        .localCheckpoint() // written + shard-listed below
      val writtenShards = newContent.select(col("shard")).distinct()
        .collect().map(_.getInt(0)).toSet
      val mode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try newContent.write.mode(SaveMode.Overwrite)
        .partitionBy("shard").parquet(corpusPath)
      finally mode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      val fs = new org.apache.hadoop.fs.Path(corpusPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      deltas.filterNot(writtenShards).foreach { sh =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$corpusPath/shard=$sh"), true)
      }
    }

    // (e) manifest: carry-over for untouched shards, recompute changed
    // shards from the corpus as re-read (partition-pruned); localCheckpoint
    // decouples the self-overwrite (manifest is both read and rewritten).
    // The carry-over base is validated against the last COMMITTED verdicts
    // (the manifest overwrite is the one non-partitioned artifact a crash
    // can leave partial): its shard set must equal the shards prevKept
    // implies — on any mismatch the epoch repairs by recomputing the FULL
    // manifest from the corpus on disk.
    val manifestPath = s"$outDir/manifest"
    val prevShards: Set[Int] = prevKept
      .select(Layout.shardKey(col("doc_id"), numShards).as("shard"))
      .distinct().collect().map(_.getInt(0)).toSet
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
    spark.range(1).select(lit(numShards).as("num_shards"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
    Curation.funnelRollup(vNow)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/report")

    // commit marker LAST: epoch e's verdicts existing ⇒ e fully applied
    // (`epoch` stays a directory-only partition key — a data column of the
    // same name would collide with partition discovery on read)
    vNow.write.mode(SaveMode.Overwrite).parquet(s"$verdictsPath/epoch=$epochId")

    // prune superseded epochs AFTER the marker lands — only the newest
    // committed verdict set is ever a delta base, so verdict state stays
    // O(docs), not O(docs × epochs). A crash between marker and prune
    // leaves both (the next epoch picks the max); a replay arriving AFTER
    // the prune finds no earlier base and degrades to a full changed-shard
    // rewrite of identical content — convergent either way.
    {
      val p = new org.apache.hadoop.fs.Path(verdictsPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("epoch="))
        .filter(_.getName.stripPrefix("epoch=").toLong < epochId)
        .foreach(old => fs.delete(old, true))
    }

    val totals = vNow.agg(count(lit(1)),
      coalesce(sum(when(col("kept"), 1L).otherwise(0L)), lit(0L))).head()
    EpochResult(epochId, totals.getLong(0), totals.getLong(1),
      nAdded, nRemoved, deltas)
  }

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
  private def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
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
