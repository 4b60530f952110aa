package graft

import graft.operators.{Curation, Layout}
import org.apache.spark.sql.{SaveMode, SparkSession}
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

  /** True iff `dir` holds at least one data file (recursively, skipping
    * `_SUCCESS`/hidden markers) — the "did this write land any parquet"
    * probe behind [[validateCorpus]]'s empty-corpus handling.
    */
  private def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) return true
    }
    false
  }
}
