package graft

import java.nio.file.Files
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The append-mode curation pipeline must CONVERGE: after any sequence of
  * epochs delivering the corpus in chunks — including chunk overlap
  * (at-least-once re-delivery) and a mid-run restart — the corpus,
  * manifest, report, and meta artifacts must equal a one-shot
  * `Pipeline.curate` over the union, and `validateCorpus` must pass.
  *
  * The hard part this pins is RETROACTIVE verdict flips: funnel gates 3–4
  * are corpus-global, so a later chunk can displace a bag-dedup keeper
  * (smaller doc_id arriving later) or push an accepted doc over the
  * span-dup threshold. Chunks are delivered in DESCENDING id ranges so
  * keeper displacement genuinely occurs, and the spec asserts it did
  * (`removed > 0` in some epoch) — convergence is then evidence the
  * changed-shard rewrite handles flips, not just appends.
  */
class PipelineIncrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
  private val Shards = 16

  private def chunk(lo: Long, hi: Long) =
    Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def corpusRowsAt(corpusPath: String): Seq[String] =
    spark.read.parquet(corpusPath)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("text"), col("shard"))
      .collect().map(_.toString).toSeq.sorted

  private def corpusRows(out: String): Seq[String] = corpusRowsAt(s"$out/corpus")

  private def rows(path: String, order: String*): Seq[String] =
    spark.read.parquet(path).orderBy(order.map(col): _*)
      .collect().map(_.toString).toSeq

  /** Pointer rows (`bucket -> layer epochs`) of `kind` ('fp' | 'v') from
    * an epoch's commit artifact.
    */
  private def ptrOf(out: String, e: Long, kind: String): Map[Int, Set[Long]] =
    spark.read.parquet(s"$out/state/commit/epoch=$e")
      .filter(col("kind") === kind)
      .select(col("bucket"), col("epoch")).collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def epochDirsOf(path: String): Set[Long] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) Set.empty
    else java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .toArray.map(_.toString).filter(_.contains("epoch="))
      .map(_.split("epoch=").last.toLong).toSet

  /** Layer ids on disk under a bucketed family dir: `epoch=e` dirs as
    * +e, `fold=e` (rolling-compaction) dirs as -e — the pointer map's
    * encoding.
    */
  private def layerDirsOf(path: String): Set[Long] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) Set.empty
    else java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .toArray.map(_.toString.split("/").last).flatMap { n =>
        if (n.startsWith("epoch=")) Some(n.stripPrefix("epoch=").toLong)
        else if (n.startsWith("fold=")) Some(-n.stripPrefix("fold=").toLong)
        else None
      }.toSet

  private def assertEqualsOneShot(out: String, oneShot: Pipeline.CurationRun): Unit = {
    assert(corpusRows(out) === corpusRowsAt(oneShot.corpusPath))
    assert(rows(s"$out/manifest", "shard") === rows(oneShot.manifestPath, "shard"))
    assert(rows(s"$out/report", "lang", "source") === rows(oneShot.reportPath, "lang", "source"))
    assert(Pipeline.validateCorpus(spark, out).isEmpty,
      "incremental artifacts must self-validate")
  }

  test("descending-chunk epochs with overlap converge to the one-shot artifacts (retro flips exercised)") {
    val out = Files.createTempDirectory("graft-incr").toString
    // descending ranges: later epochs deliver SMALLER ids, so bag keepers
    // elected in earlier epochs get displaced; overlaps re-deliver docs
    val r1 = Pipeline.curateEpoch(chunk(300, Long.MaxValue), out, Shards, 0L)
    val r2 = Pipeline.curateEpoch(chunk(100, 320), out, Shards, 1L)
    val r3 = Pipeline.curateEpoch(chunk(0, 120), out, Shards, 2L)
    assert(r1.docsKept > 0)
    assert(r3.docsSeen === Fixtures.documents(spark, dir).count())
    assert(r2.removed + r3.removed > 0,
      "fixture + descending delivery must exercise a retroactive flip; " +
        s"got removed=(${r2.removed}, ${r3.removed})")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
    // superseded commit artifacts are pruned once the newer marker lands,
    // and verdict/fp bucket epochs survive exactly as long as the CURRENT
    // pointer maps reference them — state stays O(docs), not O(docs × epochs)
    assert(epochDirsOf(s"$out/state/commit") === Set(2L),
      "only the newest committed epoch's commit artifact may remain")
    assert(layerDirsOf(s"$out/state/vbkt") === ptrOf(out, 2L, "v").values.flatten.toSet,
      "every retained verdict layer (epoch or fold) must still be referenced")
    assert(layerDirsOf(s"$out/state/fpcnt") === ptrOf(out, 2L, "fp").values.flatten.toSet,
      "every retained fp layer (epoch or fold) must still be referenced")
  }

  test("a crash-stranded fileless manifest (only _temporary inside) is repaired, not fatal") {
    val out = Files.createTempDirectory("graft-incr-crash").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L)
    // simulate a crash mid-overwrite: data files deleted, a stranded task
    // attempt left under _temporary (its part file must NOT count as data)
    val mdir = java.nio.file.Paths.get(s"$out/manifest")
    Files.walk(mdir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p != mdir).sortBy(-_.getNameCount).foreach(Files.delete)
    val stranded = mdir.resolve("_temporary/0")
    Files.createDirectories(stranded)
    Files.write(stranded.resolve("part-00000-attempt.parquet"), Array[Byte](1, 2, 3))
    // the replayed/next epoch must repair via full manifest recompute
    Pipeline.curateEpoch(chunk(0, 210), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-crash-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("streaming epochs with a mid-run restart converge and self-validate") {
    val replayDir = Files.createTempDirectory("graft-incr-replay").toString
    val out = Files.createTempDirectory("graft-incr-sout").toString
    val ckpt = Files.createTempDirectory("graft-incr-ckpt").toString
    def writeChunk(lo: Long, hi: Long): Unit =
      chunk(lo, hi).coalesce(1).write.mode("append").parquet(replayDir)
    def run(): Unit = {
      val schema = spark.read.parquet(replayDir).schema
      val q = Pipeline.startIncremental(
        Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1),
        out, ckpt, Shards)
      q.processAllAvailable()
      q.stop()
    }
    writeChunk(250, Long.MaxValue)
    writeChunk(120, 260) // overlaps [250,260)
    run() // two epochs, then "crash"
    writeChunk(0, 130) // overlaps [120,130), smaller ids: retro flips
    run() // restart from the checkpoint
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-sref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a crash during the corpus overwrite replays from staging without data loss") {
    // the ONE destructive window: dynamic overwrite deletes a changed
    // shard's old bytes at job commit before (or without) landing the new
    // ones. The epoch's staging (committed BEFORE the overwrite starts,
    // keyed by the delta base) must make the replay whole without
    // re-reading the destroyed shard.
    val out = Files.createTempDirectory("graft-incr-stage").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    Pipeline.failAfterStaging = true
    try intercept[IllegalStateException] {
      Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L)
    } finally Pipeline.failAfterStaging = false
    // simulate the mid-overwrite crash: one staged shard's old corpus
    // bytes are gone and its new bytes never landed
    val stagingPath = s"$out/state/staging/epoch=1/base=0"
    val stagedShards = spark.read.parquet(stagingPath)
      .select(col("shard")).distinct().collect().map(_.getInt(0)).sorted
    assert(stagedShards.nonEmpty, "the fixture epoch must stage changed shards")
    val victim = java.nio.file.Paths.get(s"$out/corpus/shard=${stagedShards.head}")
    if (Files.exists(victim))
      Files.walk(victim).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .sortBy(-_.getNameCount).foreach(Files.delete)
    // replay converges — the staged content, not the corpus, is the source
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-stage-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("epoch shuffle cost scales with the batch, not the accumulated corpus") {
    // the incremental contract, pinned at the task-metrics level: a SMALL
    // epoch folding into a LARGE accumulated state must shuffle a small
    // fraction of what the large founding epoch shuffled. (The full
    // recompute this replaced shuffled every seen doc's tokens each epoch,
    // so small epochs cost what epoch 0 cost.) Corpus-scale state is only
    // scanned against broadcast deltas and rewritten map-side — those
    // paths write no shuffle records.
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffled.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measured(fn: => Unit): Long = drained(shuffled)(fn)
    val out = Files.createTempDirectory("graft-incr-shuf").toString
    spark.sparkContext.addSparkListener(listener)
    try {
      val big = measured {
        Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L) }
      val small1 = measured {
        Pipeline.curateEpoch(chunk(50, 100), out, Shards, 1L) }
      val small2 = measured {
        Pipeline.curateEpoch(chunk(0, 50), out, Shards, 2L) }
      assert(big > 0L)
      assert(small1 < big / 2,
        s"a small epoch must not re-shuffle the accumulated corpus ($small1 vs founding $big)")
      assert(small2 < big / 2,
        s"shuffle cost must stay batch-bound as state accumulates ($small2 vs founding $big)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the cheap epochs still converge to the one-shot artifacts
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-shuf-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  /** Run `fn`, then return `counter`'s value after the async listener
    * bus has gone quiet (capped poll, so a pathological event trickle
    * fails the assertion instead of hanging the suite). Shared by the
    * shuffle-budget and job-count pins; callers reset-and-drain each
    * measured block, so a preceding UNmeasured block's stragglers
    * cannot inflate the next reading.
    */
  private def drained(counter: java.util.concurrent.atomic.AtomicLong)(
      fn: => Unit): Long = {
    counter.set(0L)
    fn
    var prev = -1L
    var spins = 0
    while (prev != counter.get && spins < 100) {
      prev = counter.get; Thread.sleep(300); spins += 1
    }
    counter.get
  }

  test("steady-state job count stays constant as delta layers accumulate") {
    // the round-12 fixed-overhead pin: reading a pointed layer must not
    // cost a driver job (schema inference, listings), so an epoch's job
    // count is a function of its batch SHAPE, not of how many layers the
    // log has accumulated — pre-fix each accumulated layer added ~5 jobs
    // per epoch (schema-inferring footer reads at three probe sites).
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val out = Files.createTempDirectory("graft-incr-jobs").toString
    spark.sparkContext.addSparkListener(listener)
    try {
      // founding measured too: the drain inside keeps its trailing
      // async job events out of tail 1's count
      drained(jobs) {
        Pipeline.curateEpoch(chunk(150, Long.MaxValue), out, Shards, 0L) }
      val tails = (1 to 3).map { i =>
        drained(jobs) { Pipeline.curateEpoch(
          chunk(150 - 50 * i, 200 - 50 * i), out, Shards, i.toLong) }
      }
      // tail 3 reads one more accumulated layer than tail 2 and a rotated
      // rolling-fold slice; equal-shaped batches must cost the same jobs
      // modulo small branch variation (a batch with crossing fps runs one
      // extra probe) — the pre-fix schema-inference reads added ~5 jobs
      // per layer, far above the +3 slack. Tail 1 is excluded from the
      // comparison: rolling folds only engage once a bucket's list
      // reaches 3 layers, so tail 1 legitimately runs fewer (fold) jobs
      // than every later tail — the claim pinned here is that job count
      // does not CREEP with accumulated layers, not that fold-free and
      // folding epochs cost the same.
      assert(tails.last <= tails(1) + 3,
        s"job count must not creep with accumulated layers (${tails.mkString(", ")})")
      // absolute pin on the round-14 trimmed constant (IncrBench gate-off
      // steady epochs measure 55–56; fixture epochs run a few more branch
      // jobs — crossing probes, folds): regressions that re-add per-epoch
      // jobs (read-backs, extra materializations, schema inference) trip
      // this before they reach the bench
      assert(tails.max <= 62,
        s"steady-epoch job count crept past the round-14 constant " +
          s"(${tails.mkString(", ")})")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("curateEpoch restores the session's AQE setting, including concurrent epochs") {
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(key)
    try {
      for (v <- Seq("true", "false")) {
        spark.conf.set(key, v)
        val out = Files.createTempDirectory("graft-incr-aqe").toString
        Pipeline.curateEpoch(chunk(200, 260), out, Shards, 0L)
        assert(spark.conf.get(key) === v,
          s"a single epoch must restore $key=$v")
      }
      // two epochs FORCED to overlap (both await the barrier inside the
      // AQE scope before either exits): the naive save/restore pair
      // would interleave as save(true), save(false), restore(true),
      // restore(false) and leave the session stuck at false — without
      // the barrier the epochs could serialize and hide the regression
      spark.conf.set(key, "true")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      Pipeline.testEpochBarrier =
        Some(new java.util.concurrent.CyclicBarrier(2))
      try {
        val fs = (1 to 2).map { i =>
          Future {
            val out = Files.createTempDirectory(s"graft-incr-aqe-c$i").toString
            Pipeline.curateEpoch(chunk(200, 260), out, Shards, 0L)
          }
        }
        fs.foreach(Await.result(_, 5.minutes))
      } finally Pipeline.testEpochBarrier = None
      assert(spark.conf.get(key) === "true",
        "concurrent epochs must leave the session's AQE value restored")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("a state dir written by the pre-delta layout migrates and continues, not crashes") {
    import graft.operators.{Curation, Layout}
    // fabricate the round-10 layout exactly: batch-keyed sigs + winv
    // state, a committed 5-column verdict set, and the artifacts a
    // completed epoch leaves behind — no fpcnt, no extended columns
    val out = Files.createTempDirectory("graft-incr-legacy").toString
    val c0 = chunk(150, Long.MaxValue)
    val base = c0.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
    Curation.docSignals(base)
      .write.parquet(s"$out/state/sigs/batch=0")
    Curation.winFpsOver(base.select(col("doc_id"), col("toks")), Curation.SubWidth)
      .write.parquet(s"$out/state/winv/batch=0")
    val sigs0 = spark.read.parquet(s"$out/state/sigs")
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tok"), col("h"), col("bag")).distinct()
    val winv0 = spark.read.parquet(s"$out/state/winv")
      .select(col("doc_id"), col("fp")).distinct()
    val v5 = Curation.verdictsFrom(sigs0, winv0).localCheckpoint()
    assert(v5.columns.toSeq ===
      Seq("doc_id", "lang", "source", "n_tok", "kept"), "legacy schema")
    val kept0 = v5.filter(col("kept"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
      .join(c0.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("shard", Layout.shardKey(col("doc_id"), Shards))
    kept0.write.partitionBy("shard").parquet(s"$out/corpus")
    Layout.shardManifest(spark.read.parquet(s"$out/corpus")
        .select(col("doc_id"), col("text")), Shards)
      .write.parquet(s"$out/manifest")
    spark.range(1).select(lit(Shards).as("num_shards"))
      .write.parquet(s"$out/meta")
    Curation.funnelRollup(v5).write.parquet(s"$out/report")
    v5.write.parquet(s"$out/state/verdicts/epoch=0")
    // a legacy full-text mirror rides along: once consumed by the
    // migration it must be DELETED, not kept on disk forever
    c0.select(col("doc_id"), col("text")).write.parquet(s"$out/state/texts")
    // the NEW code must rebuild its delta state from sigs+winv and fold
    // the next (overlapping, keeper-displacing) chunk to convergence
    val r1 = Pipeline.curateEpoch(chunk(0, 160), out, Shards, 1L)
    assert(r1.docsSeen === Fixtures.documents(spark, dir).count())
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-legacy-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
    // the migration consumed the legacy dirs exactly once — after the gen3
    // commit none of them (incl. the full-text mirror) may survive
    Seq("sigs", "texts", "verdicts", "fpmap", "epochres").foreach { d =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/state/$d")),
        s"legacy state/$d must be deleted once the gen3 commit lands")
    }
  }

  test("fp-count state is bucket-incremental: a small epoch rewrites only its touched buckets") {
    val out = Files.createTempDirectory("graft-incr-bkt").toString
    // the tail doc: the SHORTEST doc that still has windows (>= 20 tokens)
    // — its handful of fps can only touch a handful of buckets; a fixture
    // batch of any size saturates all of them (64 buckets is the
    // test-scale dial; a 100 TB deployment runs thousands)
    val all = Fixtures.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val tailDoc = all.filter(col("n") >= 20).orderBy(col("n"), col("doc_id"))
      .head().getLong(0)
    def docsExcept(id: Long) =
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") =!= id)
    def docOnly(id: Long) =
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") === id)
    Pipeline.curateEpoch(docsExcept(tailDoc), out, Shards, 0L)
    // distinct bucket VALUES read from the layer, not bucket= dir counts:
    // a tail delta layer is FLAT (zero dirs — a dir count would make the
    // 'fewer buckets' assertion vacuous), while a founding layer is
    // partitioned; the value count measures both layouts
    val bucketsOf = (e: Long) =>
      spark.read.parquet(s"$out/state/fpcnt/epoch=$e")
        .select(col("bucket")).distinct().count()
    val founding = bucketsOf(0L)
    assert(founding > 1, "the founding epoch must populate multiple buckets")
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$out/state/fpcnt/epoch=0"))
      .toArray.map(_.toString).count(_.contains("bucket=")) > 1,
      "the founding full-copy layer must be bucket=-partitioned for pruned reads")
    Pipeline.curateEpoch(docOnly(tailDoc), out, Shards, 1L)
    val small = bucketsOf(1L)
    assert(small < founding,
      s"a small epoch must rewrite only touched buckets ($small vs founding $founding)")
    // untouched buckets still point at (and retain) the founding epoch
    val pointed = ptrOf(out, 1L, "fp").values.flatten.toSet
    assert(pointed === Set(0L, 1L),
      s"pointer map must split across both epochs, got $pointed")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/fpcnt/epoch=0")),
      "a still-referenced epoch must survive the prune")
  }

  test("verdict state is bucket-incremental: a small epoch's write volume is batch-bound") {
    // the round-12 pin: the doc-scale verdict state must not be rewritten
    // corpus-wide every epoch — an epoch writes only the buckets holding
    // its batch's docs plus the docs its deltas flip, so both the bucket
    // count and the ROW count of the written state are small fractions of
    // the founding epoch's
    val out = Files.createTempDirectory("graft-incr-vbkt").toString
    val all = Fixtures.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val tailDoc = all.filter(col("n") >= 20).orderBy(col("n"), col("doc_id"))
      .head().getLong(0)
    def docsExcept(id: Long) =
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") =!= id)
    def docOnly(id: Long) =
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") === id)
    Pipeline.curateEpoch(docsExcept(tailDoc), out, Shards, 0L)
    // distinct bucket VALUES, not bucket= dir counts — the tail delta
    // layer is flat, so a dir count would be vacuously zero (see the
    // fpcnt twin test)
    def bucketsOf(e: Long): Long =
      spark.read.parquet(s"$out/state/vbkt/epoch=$e")
        .select(col("bucket")).distinct().count()
    val foundingBuckets = bucketsOf(0L)
    val foundingRows = spark.read.parquet(s"$out/state/vbkt/epoch=0").count()
    assert(foundingBuckets > 1, "the founding epoch must populate multiple buckets")
    Pipeline.curateEpoch(docOnly(tailDoc), out, Shards, 1L)
    assert(bucketsOf(1L) < foundingBuckets,
      s"a small epoch must rewrite only touched buckets (${bucketsOf(1L)} vs $foundingBuckets)")
    val smallRows = spark.read.parquet(s"$out/state/vbkt/epoch=1").count()
    assert(smallRows < foundingRows / 2,
      s"a small epoch's verdict WRITE volume must be batch-bound, not " +
        s"corpus-bound ($smallRows rows vs founding $foundingRows)")
    // untouched buckets still point at (and retain) the founding epoch
    assert(ptrOf(out, 1L, "v").values.flatten.toSet === Set(0L, 1L))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/vbkt/epoch=0")),
      "a still-referenced verdict epoch must survive the prune")
    // and the folded state still converges
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-vbkt-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("rolling folds bound per-bucket fan-out with no compaction cliff") {
    val out = Files.createTempDirectory("graft-incr-compact").toString
    // founding epoch, then 10 thin descending slices — enough that any
    // bucket's layer list would exceed FpCompactAt without folding
    val cuts = (0 to 10).map(i => i * 15L)
    Pipeline.curateEpoch(chunk(cuts.last, Long.MaxValue), out, Shards, 0L)
    (0 until 10).foreach { i =>
      Pipeline.curateEpoch(chunk(cuts(9 - i), cuts(10 - i)), out, Shards, (i + 1).toLong)
    }
    for (kind <- Seq("fp", "v", "k")) {
      val ptr = ptrOf(out, 10L, kind)
      val worst = ptr.values.map(_.size).maxOption.getOrElse(0)
      assert(worst <= Pipeline.FpCompactAt,
        s"rolling folds must bound every $kind bucket's layer fan-out, " +
          s"got a list of $worst")
      assert(ptr.values.exists(_.exists(_ < 0L)),
        s"after 10 epochs the $kind state must have rolled folds " +
          "(otherwise the bound above is vacuous)")
    }
    // retention: exactly the referenced layers remain on disk — folds
    // age out once every bucket pointing at them rolls again
    for (fam <- Seq("fpcnt" -> "fp", "vbkt" -> "v", "kbkt" -> "k")) {
      assert(layerDirsOf(s"$out/state/${fam._1}") ===
        ptrOf(out, 10L, fam._2).values.flatten.toSet,
        s"every retained ${fam._1} layer must still be referenced")
    }
    // and the folded state is still CORRECT: convergence to one-shot
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-compact-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a transitional flat-fpcnt state dir (extended verdicts, no fpmap) re-buckets and continues") {
    import graft.operators.{Curation, Layout}
    // fabricate the intra-round transitional layout: extended verdict
    // state + a FLAT (un-bucketed) fpcnt dir, winv log, no pointer map
    val out = Files.createTempDirectory("graft-incr-flatfp").toString
    val c0 = chunk(150, Long.MaxValue)
    val base = c0.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
    Curation.winFpsOver(base.select(col("doc_id"), col("toks")), Curation.SubWidth)
      .write.parquet(s"$out/state/winv/batch=0")
    val winv0 = spark.read.parquet(s"$out/state/winv")
      .select(col("doc_id"), col("fp")).distinct()
    val vFull = Curation.verdictsFullFrom(
      Curation.docSignals(base), winv0).localCheckpoint()
    winv0.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .write.parquet(s"$out/state/fpcnt/epoch=0") // FLAT: no bucket dirs
    val kept0 = vFull.filter(col("kept"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"))
      .join(c0.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("shard", Layout.shardKey(col("doc_id"), Shards))
    kept0.write.partitionBy("shard").parquet(s"$out/corpus")
    Layout.shardManifest(spark.read.parquet(s"$out/corpus")
        .select(col("doc_id"), col("text")), Shards)
      .write.parquet(s"$out/manifest")
    spark.range(1).select(lit(Shards).as("num_shards"))
      .write.parquet(s"$out/meta")
    Curation.funnelRollup(vFull).write.parquet(s"$out/report")
    vFull.write.parquet(s"$out/state/verdicts/epoch=0")
    // new code must force a compacting re-bucket, prune the flat dir once
    // unreferenced, and converge
    Pipeline.curateEpoch(chunk(0, 160), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-flatfp-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
    assert(ptrOf(out, 1L, "fp").values.flatten.toSet === Set(1L),
      "compaction must point every bucket at the migrating epoch")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/fpcnt/epoch=0")),
      "the unreferenced flat fpcnt dir must be pruned")
  }

  test("a crashed epoch staged by the flat (pre-partitioned) layout replays without shard loss") {
    // upgrade scenario: the crash happened under the old code, whose
    // staging was flat parquet with shard as a data column — the replay
    // must NOT read an empty shard-dir listing and delete changed shards
    val out = Files.createTempDirectory("graft-incr-flatstage").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    Pipeline.failAfterStaging = true
    try intercept[IllegalStateException] {
      Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L)
    } finally Pipeline.failAfterStaging = false
    // rewrite the committed staging into the OLD flat layout
    val stagingPath = s"$out/state/staging/epoch=1/base=0"
    val staged = spark.read.parquet(stagingPath)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("text"), col("shard")).localCheckpoint()
    val sdir = java.nio.file.Paths.get(stagingPath)
    Files.walk(sdir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_ != sdir).sortBy(-_.getNameCount).foreach(Files.delete)
    staged.write.mode("overwrite").parquet(stagingPath) // flat, _SUCCESS
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-flatstage-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("an epoch with a different shard count than the founding run fails loudly") {
    val out = Files.createTempDirectory("graft-incr-shards").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L)
    val e = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(0, 210), out, Shards * 2, 1L)
    }
    assert(e.getMessage.contains("numShards"))
  }

  test("a wiped-and-recreated outDir re-founds cleanly under a different shard count") {
    // the JVM-lifetime numShards cache must yield to the DISK: after the
    // outDir is deleted, a legitimate re-founding with a new count must
    // succeed instead of failing against the stale cached entry
    val out = Files.createTempDirectory("graft-incr-refound").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L)
    val root = java.nio.file.Paths.get(out)
    Files.walk(root).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_ != root).sortBy(-_.getNameCount).foreach(Files.delete)
    val r = Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards * 2, 0L)
    assert(r.docsKept > 0)
    assert(spark.read.parquet(s"$out/meta").head().getAs[Int]("num_shards")
      === Shards * 2, "the re-founded meta must carry the NEW shard count")
  }

  test("an out-of-order winv state dir (batch > epoch) is ignored, not folded in") {
    import graft.operators.Curation
    val out = Files.createTempDirectory("graft-incr-ooo").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    // fabricate a FUTURE batch dir pairing state docs with every fp the
    // next epoch delivers: if the crossed-fp probe folded it in, any fp
    // that crosses the dup threshold in epoch 1 would inflate n_dup
    // across these docs and convergence would fail. (cross join is the
    // test fixture's intent: a worst-case poisoned dir)
    val nextToks = chunk(0, 120).select(col("doc_id"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
    val futureFps = Curation.winFpsOver(
      nextToks.select(col("doc_id"), col("toks")), Curation.SubWidth)
      .select(col("fp")).distinct()
    // the founding mass lives fp-bucketed under winvc; the poisoned dir
    // is fabricated in the flat tail namespace where an out-of-order
    // restore would land
    spark.read.parquet(s"$out/state/winvc").select(col("doc_id")).distinct()
      .limit(50).crossJoin(futureFps)
      .write.parquet(s"$out/state/winv/batch=99")
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-ooo-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a no-new-docs epoch is a heartbeat: pointers carried, no state rewrite, no report job") {
    // the steady-state contract: a batch of pure re-deliveries cannot move
    // any verdict, so the epoch writes ONLY its commit marker — no verdict
    // or fp bucket for the epoch, pointer maps carried verbatim, and the
    // report/manifest bytes untouched (the round-12 "no full-verdict
    // aggregation in a no-change epoch" pin, checked at the file level)
    val out = Files.createTempDirectory("graft-incr-heartbeat").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    val p0v = ptrOf(out, 0L, "v")
    val p0f = ptrOf(out, 0L, "fp")
    def artifactStamp(sub: String): Seq[(String, Long)] =
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$out/$sub"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .map(p => (p.getFileName.toString,
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toSeq.sortBy(_._1)
    val report0 = artifactStamp("report")
    val manifest0 = artifactStamp("manifest")
    val r = Pipeline.curateEpoch(chunk(150, 400), out, Shards, 1L) // all seen
    assert(r.added === 0L && r.removed === 0L && r.changedShards.isEmpty)
    assert(r.docsSeen > 0L && r.docsKept > 0L,
      "the heartbeat result must still report the cumulative totals")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/vbkt/epoch=1")),
      "a heartbeat epoch must not rewrite any verdict bucket")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/fpcnt/epoch=1")),
      "a heartbeat epoch must not rewrite any fp bucket")
    assert(ptrOf(out, 1L, "v") === p0v, "verdict pointers carried verbatim")
    assert(ptrOf(out, 1L, "fp") === p0f, "fp pointers carried verbatim")
    assert(artifactStamp("report") === report0,
      "a heartbeat epoch must not rewrite the report")
    assert(artifactStamp("manifest") === manifest0,
      "a heartbeat epoch must not rewrite the manifest")
    // and a real epoch after the heartbeat still converges
    Pipeline.curateEpoch(chunk(0, 110), out, Shards, 2L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-hb-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("an oversized fp tally falls back to shuffle joins and still converges") {
    // the broadcast gate (FpBroadcastMaxRows): a founding/backfill epoch
    // whose distinct-window-fp tally exceeds the cap must not force GBs
    // through broadcast — forced to 0, every fp-keyed probe takes the
    // shuffle-join path, and the fold must stay byte-identical
    val old = Pipeline.FpBroadcastMaxRows
    Pipeline.FpBroadcastMaxRows = 0L
    try {
      val out = Files.createTempDirectory("graft-incr-nobcast").toString
      Pipeline.curateEpoch(chunk(150, Long.MaxValue), out, Shards, 0L)
      Pipeline.curateEpoch(chunk(0, 160), out, Shards, 1L)
      val oneShot = Pipeline.curate(spark, dir,
        Files.createTempDirectory("graft-incr-nobcast-ref").toString, Shards)
      assertEqualsOneShot(out, oneShot)
    } finally Pipeline.FpBroadcastMaxRows = old
  }

  test("decontamination-gated epochs converge to the gated one-shot; benchmark drift fails loudly") {
    // opt-in q104 gate: docs sharing a window with the benchmark are
    // dropped, the report carries docs_contaminated, and the flag folds
    // through epochs exactly like the other gates (fixed at first sight)
    val bench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(3).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-decontam").toString
    Pipeline.curateEpoch(chunk(300, Long.MaxValue), out, Shards, 0L, Some(bench))
    Pipeline.curateEpoch(chunk(100, 320), out, Shards, 1L, Some(bench))
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 2L, Some(bench))
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-decontam-ref").toString, Shards,
      Some(bench))
    assertEqualsOneShot(out, oneShot)
    val report = spark.read.parquet(s"$out/report")
    assert(report.columns.contains("docs_contaminated"),
      "a gated run's report must carry the contamination column")
    assert(report.agg(sum(col("docs_contaminated"))).head().getLong(0) > 0L,
      "the benchmark is drawn from the corpus, so contamination must fire")
    // the benchmark is pinned for the life of the outDir: toggling the
    // gate off, or swapping the benchmark, must fail loudly
    val eOff = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(0, 50), out, Shards, 3L, None)
    }
    assert(eOff.getMessage.contains("benchmark"))
    val otherBench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id").desc).limit(2).localCheckpoint()
    val eSwap = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(0, 50), out, Shards, 3L, Some(otherBench))
    }
    assert(eSwap.getMessage.contains("benchmark"))
  }

  test("state written under a different bucket constant re-buckets BEFORE any probe trusts it") {
    // the upgrade path: a deployment changes VBuckets/FpBuckets, restarts,
    // and continues an outDir whose state is bucketed under the OLD
    // constant. The epoch's bucket-pruned probes must not prune
    // old-constant partitions with new-constant bucket sets — a missed
    // re-delivery would duplicate corpus rows and a missed fp prior would
    // double-count in the compaction fold — so pruning is disabled on
    // mismatch and the epoch compacts into the new scheme.
    val out0 = Files.createTempDirectory("graft-incr-nb-old").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out0, Shards, 0L)
    // fabricate the old-constant layout: re-bucket both state families
    // under 32 buckets and rewrite the commit artifact's pointer rows
    val OldNB = 32
    val vRe = spark.read.parquet(s"$out0/state/vbkt/epoch=0").drop("bucket")
      .withColumn("bucket",
        pmod(xxhash64(col("doc_id")), lit(OldNB.toLong)).cast("int"))
      .localCheckpoint() // off the dir we are about to overwrite
    vRe.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$out0/state/vbkt/epoch=0")
    val fRe = spark.read.parquet(s"$out0/state/fpcnt/epoch=0").drop("bucket")
      .withColumn("bucket", pmod(col("fp"), lit(OldNB.toLong)).cast("int"))
      .localCheckpoint()
    fRe.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$out0/state/fpcnt/epoch=0")
    def bucketsOf(p: String): Seq[Int] =
      java.nio.file.Files.list(java.nio.file.Paths.get(p)).toArray
        .map(_.toString).filter(_.contains("bucket="))
        .map(_.split("bucket=").last.toInt).toSeq
    val sq = spark
    import sq.implicits._
    val commit = spark.read.parquet(s"$out0/state/commit/epoch=0")
      .localCheckpoint()
    val ptrs =
      bucketsOf(s"$out0/state/vbkt/epoch=0").map(b => Pipeline.CommitRow("v",
        bucket = Some(b), epoch = Some(0L), n_buckets = Some(OldNB))) ++
      bucketsOf(s"$out0/state/fpcnt/epoch=0").map(b => Pipeline.CommitRow("fp",
        bucket = Some(b), epoch = Some(0L), n_buckets = Some(OldNB)))
    commit.filter(!col("kind").isin("fp", "v"))
      .unionByName(ptrs.toDS().toDF(), allowMissingColumns = true)
      .localCheckpoint()
      .write.mode("overwrite").parquet(s"$out0/state/commit/epoch=0")
    // continue under a FRESH outDir path (copy) — the restart analogue:
    // the in-JVM state cache is keyed by outDir, and an upgraded process
    // starts cold, reading the commit artifact from disk
    val out = Files.createTempDirectory("graft-incr-nb-new").toString
    java.nio.file.Files.walk(java.nio.file.Paths.get(out0)).forEach { src =>
      val dst = java.nio.file.Paths.get(out,
        java.nio.file.Paths.get(out0).relativize(src).toString)
      if (java.nio.file.Files.isDirectory(src))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(src, dst)
    }
    // overlap re-delivers docs 100-199; descending range displaces keepers
    Pipeline.curateEpoch(chunk(0, 200), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-nb-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
    // and the mismatch epoch compacted into the current scheme: every
    // bucket points at epoch 1 alone
    assert(ptrOf(out, 1L, "v").values.flatten.toSet === Set(1L),
      "a bucket-constant mismatch must compact the verdict state")
    assert(ptrOf(out, 1L, "fp").values.flatten.toSet === Set(1L),
      "a bucket-constant mismatch must compact the fp state")
  }

  test("the winv log stays bounded: re-delivered docs never append their windows twice") {
    val out = Files.createTempDirectory("graft-incr-winv").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    // a pure re-delivery heartbeat writes NO winv dir at all
    Pipeline.curateEpoch(chunk(150, 400), out, Shards, 1L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/winv/batch=1")),
      "a heartbeat epoch must not append to the window log")
    // a mixed batch appends only its NEW docs' windows
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 2L)
    val batch2Ids = spark.read.parquet(s"$out/state/winv/batch=2")
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batch2Ids.nonEmpty && batch2Ids.forall(_ < 100L),
      s"re-delivered docs (ids 100-119) must not re-enter the window log; got ${batch2Ids.filter(_ >= 100L)}")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-winv-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a benchmark with zero window fps still pins the gate: toggling off fails loudly") {
    // an all-short-docs benchmark has NO width-8 windows, so its fp
    // fingerprint is (0, 0) — identical to gate-off. The explicit gate
    // flag in the meta artifact is what keeps the report shape from
    // silently flip-flopping between gated and ungated epochs.
    val sq = spark
    import sq.implicits._
    val fpless = Seq((-1L, "too short")).toDF("doc_id", "text").localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-fpless").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L, Some(fpless))
    val report = spark.read.parquet(s"$out/report")
    assert(report.columns.contains("docs_contaminated"),
      "a gated run's report carries the contamination column even when nothing matches")
    val eOff = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(0, 210), out, Shards, 1L, None)
    }
    assert(eOff.getMessage.contains("benchmark"))
    // same gate, same (empty) fingerprint: continues fine and converges
    Pipeline.curateEpoch(chunk(0, 210), out, Shards, 1L, Some(fpless))
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-fpless-ref").toString, Shards,
      Some(fpless))
    assertEqualsOneShot(out, oneShot)
  }

  test("benchmark fps are computed once per run: same frame object hits the cache") {
    val bench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(3).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-bcache").toString
    Pipeline.curateEpoch(chunk(300, Long.MaxValue), out, Shards, 0L, Some(bench))
    val fps0 = Pipeline.benchCache(out)._2
    Pipeline.curateEpoch(chunk(150, 320), out, Shards, 1L, Some(bench))
    assert(Pipeline.benchCache(out)._2 eq fps0,
      "the second epoch with the same benchmark object must reuse the checkpointed fps")
    // a content-equal TWIN is a different object: recomputed (so drift
    // detection stays live), same fingerprint, run continues
    val twin = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(3).localCheckpoint()
    Pipeline.curateEpoch(chunk(0, 160), out, Shards, 2L, Some(twin))
    assert(!(Pipeline.benchCache(out)._2 eq fps0),
      "a different frame object must recompute so in-JVM drift is still detected")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-bcache-ref").toString, Shards,
      Some(bench))
    assertEqualsOneShot(out, oneShot)
  }

  test("keeper side-state is bucket-incremental and replaces the verdict scan") {
    // round-13: the displacement probe reads the bag-keyed keeper state
    // (state/kbkt) pruned to the batch's bag buckets — a small epoch's
    // keeper WRITE is a flat delta over few buckets, and the probe never
    // scans the verdict layers
    val out = Files.createTempDirectory("graft-incr-kbkt").toString
    val all = Fixtures.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val tailDoc = all.filter(col("n") >= 20).orderBy(col("n"), col("doc_id"))
      .head().getLong(0)
    def docsExcept(id: Long) =
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") =!= id)
    def docOnly(id: Long) =
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") === id)
    Pipeline.curateEpoch(docsExcept(tailDoc), out, Shards, 0L)
    val foundingBuckets = spark.read.parquet(s"$out/state/kbkt/epoch=0")
      .select(col("bucket")).distinct().count()
    assert(foundingBuckets > 1,
      "the founding epoch must populate multiple keeper buckets")
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$out/state/kbkt/epoch=0"))
      .toArray.map(_.toString).count(_.contains("bucket=")) > 1,
      "the founding keeper copy must be bucket=-partitioned for pruned reads")
    Pipeline.curateEpoch(docOnly(tailDoc), out, Shards, 1L)
    val smallBuckets = spark.read.parquet(s"$out/state/kbkt/epoch=1")
      .select(col("bucket")).distinct().count()
    assert(smallBuckets < foundingBuckets,
      s"a small epoch must write only its bags' keeper buckets " +
        s"($smallBuckets vs founding $foundingBuckets)")
    assert(ptrOf(out, 1L, "k").values.flatten.toSet === Set(0L, 1L),
      "untouched keeper buckets must still point at the founding copy")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-kbkt-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a steady epoch's state reads are bucket-pruned: an inflated untouched bucket is never read") {
    // the round-13 read-volume pin: pre-keeper-state, every epoch's
    // displacement probe scanned EVERY verdict layer row (vLayersFor(None)
    // — O(corpus-docs) per epoch). Inflate one verdict bucket the tiny
    // batch does not touch with 400k synthetic rows and pin, via a
    // task-metrics listener, that the epoch never reads them: its total
    // recordsRead stays far below the inflated bucket's row count.
    val N = 400000L
    val out0 = Files.createTempDirectory("graft-incr-readpin0").toString
    val all = Fixtures.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val tailDoc = all.filter(col("n") >= 20).orderBy(col("n"), col("doc_id"))
      .head().getLong(0)
    Pipeline.curateEpoch(
      Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .filter(col("doc_id") =!= tailDoc), out0, Shards, 0L)
    // synthetic rows: unique huge ids and bags, honest bucket hash, inert
    // (kept=false, bags match nothing, ids collide with nothing)
    val dummy = spark.range(N).select(
      (col("id") + 10000000L).as("doc_id"), lit("zz").as("lang"),
      lit("pin").as("source"), lit(5L).as("n_tok"), lit(1.0).as("h"),
      concat(lit("zzpin"), col("id")).as("bag"), lit(true).as("bag_keep"),
      lit(0L).as("n_win"), lit(0L).as("n_dup"), lit(false).as("contam"),
      lit(false).as("kept"))
      .withColumn("bucket",
        pmod(xxhash64(col("doc_id")), lit(64L)).cast("int"))
    dummy.write.partitionBy("bucket").parquet(s"$out0/state/vbkt/epoch=77")
    val dummyBuckets = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$out0/state/vbkt/epoch=77"))
      .toArray.map(_.toString).filter(_.contains("bucket="))
      .map(_.split("bucket=").last.toInt).toSeq
    // pointer surgery: register the inflated layer in the commit artifact
    val sq = spark
    import sq.implicits._
    val commit = spark.read.parquet(s"$out0/state/commit/epoch=0")
      .localCheckpoint()
    val extra = dummyBuckets.map(b => Pipeline.CommitRow("v",
      bucket = Some(b), epoch = Some(77L), n_buckets = Some(64)))
    commit.unionByName(extra.toDS().toDF(), allowMissingColumns = true)
      .localCheckpoint()
      .write.mode("overwrite").parquet(s"$out0/state/commit/epoch=0")
    // fresh outDir path (copy) so the in-JVM state cache starts cold
    val out = Files.createTempDirectory("graft-incr-readpin").toString
    java.nio.file.Files.walk(java.nio.file.Paths.get(out0)).forEach { src =>
      val dst = java.nio.file.Paths.get(out,
        java.nio.file.Paths.get(out0).relativize(src).toString)
      if (java.nio.file.Files.isDirectory(src))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(src, dst)
    }
    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          read.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try drained(read) {
        Pipeline.curateEpoch(
          Fixtures.documents(spark, dir)
            .select(col("doc_id"), col("lang"), col("source"), col("text"))
            .filter(col("doc_id") === tailDoc), out, Shards, 1L)
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(got < N / 2,
      s"a tiny epoch must not read the inflated untouched bucket " +
        s"(recordsRead=$got vs $N inflated rows — a full verdict scan " +
        "would read them all)")
  }

  test("a pre-keeper gen3 state migrates the keeper family once and continues") {
    // upgrade path: a commit artifact written before the kbkt family
    // existed has no 'k' pointer rows — the next epoch must fold the
    // keepers out of the verdict state exactly once and continue
    val out0 = Files.createTempDirectory("graft-incr-kmig0").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out0, Shards, 0L)
    // strip the keeper family: delete its dirs, drop its pointer rows
    val kdir = java.nio.file.Paths.get(s"$out0/state/kbkt")
    Files.walk(kdir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .sortBy(-_.getNameCount).foreach(Files.delete)
    val commit = spark.read.parquet(s"$out0/state/commit/epoch=0")
      .localCheckpoint()
    commit.filter(col("kind") =!= "k")
      .localCheckpoint()
      .write.mode("overwrite").parquet(s"$out0/state/commit/epoch=0")
    val out = Files.createTempDirectory("graft-incr-kmig").toString
    java.nio.file.Files.walk(java.nio.file.Paths.get(out0)).forEach { src =>
      val dst = java.nio.file.Paths.get(out,
        java.nio.file.Paths.get(out0).relativize(src).toString)
      if (java.nio.file.Files.isDirectory(src))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(src, dst)
    }
    // descending overlap: displacement must work through the migration
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L)
    assert(ptrOf(out, 1L, "k").values.flatten.toSet === Set(1L),
      "the migration must point every keeper bucket at the migrating epoch")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-kmig-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("the window log chunks: founding bucketed at birth, tails fold, flats stay bounded") {
    val out = Files.createTempDirectory("graft-incr-winvc").toString
    val cuts = (0 to 10).map(i => i * 15L)
    Pipeline.curateEpoch(chunk(cuts.last, Long.MaxValue), out, Shards, 0L)
    // the founding mass lives fp-bucketed under winvc from birth — no
    // corpus-scale flat dir ever exists to re-fold later
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$out/state/winvc/chunk=0"))
      .toArray.map(_.toString).count(_.contains("bucket=")) > 1,
      "the founding window log must be bucket=-partitioned at birth")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/winv/batch=0")),
      "the founding batch must not also land in the flat tail namespace")
    (0 until 10).foreach { i =>
      Pipeline.curateEpoch(chunk(cuts(9 - i), cuts(10 - i)), out, Shards,
        (i + 1).toLong)
    }
    // 10 tail batches > FpCompactAt: a fold must have re-bucketed the
    // older flats into a chunk and pruned them
    val flatBatches = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$out/state/winv"))
      .toArray.map(_.toString).filter(_.contains("batch="))
      .map(_.split("batch=").last.toLong).toSeq.sorted
    assert(flatBatches.size <= Pipeline.FpCompactAt,
      s"flat tail batches must stay bounded by the fold, got $flatBatches")
    val chunks = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$out/state/winvc"))
      .toArray.map(_.toString).filter(_.contains("chunk="))
      .map(_.split("chunk=").last.toLong).toSeq.sorted
    assert(chunks.size >= 2, s"a tail fold chunk must exist, got $chunks")
    // no row lost or duplicated: chunked + flat rows = the one-shot log
    // (distinct (doc, fp) per doc delivered once — overlaps re-deliver)
    val live = spark.read.parquet(s"$out/state/winvc")
      .select(col("doc_id"), col("fp"))
      .unionByName(spark.read.parquet(s"$out/state/winv")
        .select(col("doc_id"), col("fp")))
    assert(live.count() === live.distinct().count(),
      "fold + tails must hold each (doc, fp) exactly once")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-winvc-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a crossing epoch's window-log read volume scales with the crossed buckets") {
    // round-13 pin: the crossing probe partition-prunes the chunked log
    // to the crossed fps' buckets instead of scanning the full
    // token-scale log. A synthetic duplicate of one SHORT existing doc
    // crosses only that doc's few window fps, so the epoch must read far
    // less than the log.
    val out = Files.createTempDirectory("graft-incr-wvpin").toString
    Pipeline.curateEpoch(chunk(0, Long.MaxValue), out, Shards, 0L)
    val logRows = spark.read.parquet(s"$out/state/winvc").count()
    // the shortest doc that still has windows: few fps => few buckets
    val src = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 20).orderBy(col("n"), col("doc_id")).limit(1)
      .localCheckpoint()
    val dup = src.select(lit(9999999L).as("doc_id"), col("lang"),
      col("source"), col("text"))
    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          read.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try drained(read) { Pipeline.curateEpoch(dup, out, Shards, 1L) }
      finally spark.sparkContext.removeSparkListener(listener)
    // the crossing genuinely fired (otherwise the read bound is vacuous):
    // the source doc's verdict row was re-emitted with a span-dup delta
    val srcId = src.head().getLong(0)
    val flipped = spark.read.parquet(s"$out/state/vbkt/epoch=1")
      .filter(col("doc_id") === srcId)
    assert(flipped.count() === 1 && flipped.head().getAs[Long]("n_dup") > 0L,
      "the duplicate delivery must cross the source doc's window fps")
    assert(got < logRows / 2,
      s"a crossing epoch must read only the crossed buckets of the log " +
        s"(recordsRead=$got vs $logRows log rows)")
  }

  test("an epoch older than the newest committed one fails loudly instead of re-founding") {
    // once epoch 1 commits, epoch 0's commit artifact is pruned — a manual
    // or out-of-order replay of epoch 0 then finds no base, would re-found
    // from empty state, and its cleanup would prune layer dirs epoch 1's
    // pointers still reference (silent corruption). The epoch-entry guard
    // must reject it before any write.
    val out = Files.createTempDirectory("graft-incr-oldreplay").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L)
    Pipeline.curateEpoch(chunk(100, 210), out, Shards, 1L)
    val before = (corpusRows(out), rows(s"$out/manifest", "shard"))
    val e = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(100, 210), out, Shards, 0L)
    }
    assert(e.getMessage.contains("out-of-order"))
    assert((corpusRows(out), rows(s"$out/manifest", "shard")) === before,
      "the rejected replay must leave every artifact untouched")
    // the run continues normally after the rejected replay
    Pipeline.curateEpoch(chunk(0, 110), out, Shards, 2L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-oldreplay-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a heartbeat epoch repairs an externally corrupted manifest") {
    // the stored-manifest shard-set validation must run on EVERY epoch,
    // heartbeats included: with only re-delivered batches arriving, an
    // externally corrupted manifest (partial restore, manual copy) would
    // otherwise persist behind the fast path indefinitely
    val out = Files.createTempDirectory("graft-incr-hbrepair").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    val good = rows(s"$out/manifest", "shard")
    assert(good.size > 1, "fixture must populate multiple shards")
    // corrupt: drop one shard's manifest row (wrong shard SET, so the
    // cheap validation catches it)
    val truncated = spark.read.parquet(s"$out/manifest")
      .orderBy(col("shard")).limit(good.size - 1).localCheckpoint()
    truncated.write.mode("overwrite").parquet(s"$out/manifest")
    // pure re-delivery: a heartbeat, which must still repair
    val r = Pipeline.curateEpoch(chunk(150, 400), out, Shards, 1L)
    assert(r.added === 0L && r.removed === 0L, "the epoch must be a heartbeat")
    assert(rows(s"$out/manifest", "shard") === good,
      "the heartbeat must recompute the corrupted manifest from the corpus")
    assert(Pipeline.validateCorpus(spark, out).isEmpty)
  }

  test("validateCorpus fails loudly when a gated report's contamination column drifts") {
    val bench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(3).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-gateaudit").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L, Some(bench))
    Pipeline.curateEpoch(chunk(0, 110), out, Shards, 1L, Some(bench))
    assert(Pipeline.validateCorpus(spark, out).isEmpty,
      "an untampered gated run must self-validate")
    // fabricate an inconsistent report: same rows, contamination zeroed
    val tampered = spark.read.parquet(s"$out/report")
      .withColumn("docs_contaminated", lit(0L)).localCheckpoint()
    tampered.write.mode("overwrite").parquet(s"$out/report")
    val e = intercept[IllegalStateException] {
      Pipeline.validateCorpus(spark, out)
    }
    assert(e.getMessage.contains("docs_contaminated"))
  }

  test("regate to a revised benchmark converges to the v2-gated one-shot") {
    // eval sets get revised: regate re-flags every seen doc from the
    // persisted decontam-fp log, resurrects v1-only contamination from
    // the quarantine, removes-and-quarantines v2 contamination, and
    // re-pins the meta — after which the run is indistinguishable from
    // one gated by v2 all along
    val docsAll = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    val bench1 = docsAll.filter(col("n") >= 8 && col("doc_id") >= 300)
      .orderBy(col("doc_id")).limit(3).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-regate").toString
    Pipeline.curateEpoch(chunk(300, Long.MaxValue), out, Shards, 0L, Some(bench1))
    Pipeline.curateEpoch(chunk(100, 320), out, Shards, 1L, Some(bench1))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/quar")),
      "the v1 benchmark must quarantine keepable contaminated docs " +
        "(otherwise this test exercises no resurrection)")
    // v2 drawn from the v1-KEPT corpus: certainly removed by the regate
    val bench2 = spark.read.parquet(s"$out/corpus")
      .filter(size(split(col("text"), " ")) >= 8 && col("doc_id") >= 100)
      .orderBy(col("doc_id")).limit(2).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val rr = Pipeline.regate(spark, out, bench2, 2L)
    assert(rr.removed >= 1L,
      "v2 members were kept under v1, so the regate must remove them")
    assert(rr.added >= 1L,
      "v1-quarantined docs are clean under v2, so the regate must resurrect")
    // regate replay (same id, BEFORE any newer epoch — afterwards the
    // pruned marker makes it an out-of-order call, rejected like any old
    // epoch replay) is idempotent: short-circuits to the meta re-pin and
    // returns the persisted result
    val before = (corpusRows(out), rows(s"$out/manifest", "shard"),
      rows(s"$out/report", "lang", "source"))
    val replay = Pipeline.regate(spark, out, bench2, 2L)
    assert(replay === rr)
    assert((corpusRows(out), rows(s"$out/manifest", "shard"),
      rows(s"$out/report", "lang", "source")) === before)
    // the old benchmark is no longer accepted
    val eOld = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(0, 50), out, Shards, 3L, Some(bench1))
    }
    assert(eOld.getMessage.contains("benchmark"))
    // post-regate epochs run under v2 and the whole history converges to
    // the v2 one-shot
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 3L, Some(bench2))
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-regate-ref").toString, Shards,
      Some(bench2))
    assertEqualsOneShot(out, oneShot)
  }

  test("regate preconditions fail loudly: gate-off, pre-winc, out-of-order") {
    val sq = spark
    import sq.implicits._
    val bench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(2).localCheckpoint()
    // gate-off dir
    val plain = Files.createTempDirectory("graft-incr-rg-off").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), plain, Shards, 0L)
    val eOff = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, plain, bench, 1L)
    }
    assert(eOff.getMessage.contains("gate-off"))
    // gated dir founded before the winc log existed (meta lacks the flag)
    val old = Files.createTempDirectory("graft-incr-rg-old").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), old, Shards, 0L, Some(bench))
    val m = spark.read.parquet(s"$old/meta").drop("winc").localCheckpoint()
    m.write.mode("overwrite").parquet(s"$old/meta")
    val ePre = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, old, bench, 1L)
    }
    assert(ePre.getMessage.contains("winc") || ePre.getMessage.contains("log"))
    // an id at or below a committed epoch is rejected
    val g = Files.createTempDirectory("graft-incr-rg-ooo").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), g, Shards, 0L, Some(bench))
    Pipeline.curateEpoch(chunk(100, 210), g, Shards, 1L, Some(bench))
    val otherBench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id").desc).limit(2).localCheckpoint()
    val eOoo = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, g, otherBench, 0L)
    }
    assert(eOoo.getMessage.contains("exceed"))
    // the id of an ORDINARY committed epoch must not short-circuit as a
    // completed-regate replay — that path re-pins the meta and prunes
    // the quarantine without re-flagging anything
    val eOrd = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, g, otherBench, 1L)
    }
    assert(eOrd.getMessage.contains("ordinary"))
  }

  test("a stream resumed after a regate re-bases its epoch ids and converges") {
    val sq = spark
    import sq.implicits._
    val docsAll = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val bench1 = docsAll.select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8 && col("doc_id") >= 250)
      .orderBy(col("doc_id")).limit(2).localCheckpoint()
    val bench2 = docsAll.select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8 && col("doc_id") < 250)
      .orderBy(col("doc_id").desc).limit(2).localCheckpoint()
    val replayDir = Files.createTempDirectory("graft-incr-rgs-in").toString
    val out = Files.createTempDirectory("graft-incr-rgs-out").toString
    val ckpt = Files.createTempDirectory("graft-incr-rgs-ckpt").toString
    def writeChunk(lo: Long, hi: Long): Unit =
      chunk(lo, hi).coalesce(1).write.mode("append").parquet(replayDir)
    def run(bench: org.apache.spark.sql.DataFrame): Unit = {
      val schema = spark.read.parquet(replayDir).schema
      val q = Pipeline.startIncremental(
        Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1),
        out, ckpt, Shards, Some(bench))
      q.processAllAvailable()
      q.stop()
    }
    writeChunk(250, Long.MaxValue)
    writeChunk(120, 260)
    run(bench1) // two v1 epochs
    // revision between stream runs: the SAME checkpoint continues — its
    // batch counter knows nothing about the regate's epoch id, so the
    // resumed run must re-base past it instead of colliding or tripping
    // the out-of-order guard
    Pipeline.regate(spark, out,
      bench2, committedEpochsMax(out) + 1L)
    writeChunk(0, 130)
    run(bench2)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-rgs-ref").toString, Shards,
      Some(bench2))
    assertEqualsOneShot(out, oneShot)
  }

  /** Newest committed epoch id under `out` (test-side FS listing). */
  private def committedEpochsMax(out: String): Long =
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$out/state/commit"))
      .toArray.map(_.toString).filter(_.contains("epoch="))
      .map(_.split("epoch=").last.toLong).max

  test("a stream batch crashed after the corpus apply replays under the SAME epoch id") {
    // the self-stabilizing offset pin: the crash window between the
    // corpus overwrite and the commit marker leaves the corpus mutated;
    // a restart must replay the batch under its ORIGINAL epoch id so the
    // committed staging is reused — a re-based id would rebuild staging
    // from the already-mutated corpus and duplicate every added doc (or
    // lose a half-overwritten shard)
    val replayDir = Files.createTempDirectory("graft-incr-apl-in").toString
    val out = Files.createTempDirectory("graft-incr-apl-out").toString
    val ckpt = Files.createTempDirectory("graft-incr-apl-ckpt").toString
    def writeChunk(lo: Long, hi: Long): Unit =
      chunk(lo, hi).coalesce(1).write.mode("append").parquet(replayDir)
    def run(): Unit = {
      val schema = spark.read.parquet(replayDir).schema
      val q = Pipeline.startIncremental(
        Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1),
        out, ckpt, Shards)
      try q.processAllAvailable()
      finally q.stop()
    }
    writeChunk(150, Long.MaxValue)
    run() // epoch committed
    writeChunk(0, 160) // overlapping + displacing: changed shards for sure
    Pipeline.failAfterApply = true
    try intercept[Exception] { run() }
    finally Pipeline.failAfterApply = false
    // restart: the batch replays, must reuse its staging and converge
    // with zero duplicate corpus rows
    run()
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-apl-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("an orphaned window-log chunk is pruned, never folded into a crossing read") {
    val out = Files.createTempDirectory("graft-incr-orph").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    // fabricate a crashed attempt's chunk (complete _SUCCESS write, but
    // referenced by no commit's live-chunk set)
    val src = java.nio.file.Paths.get(s"$out/state/winvc/chunk=0")
    val orphan = java.nio.file.Paths.get(s"$out/state/winvc/chunk=3")
    java.nio.file.Files.walk(src).forEach { p =>
      val dst = orphan.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    }
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 5L)
    assert(!java.nio.file.Files.exists(orphan),
      "an unreferenced chunk must be pruned by the next commit's cleanup")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-orph-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a commit without explicit chunk liveness still reads its chunks and never prunes them") {
    // upgrade path: chunk-writing code that predates the wvc rows left
    // commits whose wvChunks read back empty — the reader must fall back
    // to the disk listing (or crossings silently undercount) and the
    // orphan cleanup must NOT treat the live chunks as orphans
    val out0 = Files.createTempDirectory("graft-incr-nowvc0").toString
    Pipeline.curateEpoch(chunk(0, Long.MaxValue), out0, Shards, 0L)
    val commit = spark.read.parquet(s"$out0/state/commit/epoch=0")
      .localCheckpoint()
    commit.filter(col("kind") =!= "wvc").localCheckpoint()
      .write.mode("overwrite").parquet(s"$out0/state/commit/epoch=0")
    val out = Files.createTempDirectory("graft-incr-nowvc").toString
    java.nio.file.Files.walk(java.nio.file.Paths.get(out0)).forEach { src =>
      val dst = java.nio.file.Paths.get(out,
        java.nio.file.Paths.get(out0).relativize(src).toString)
      if (java.nio.file.Files.isDirectory(src))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(src, dst)
    }
    // a synthetic duplicate of one short doc: its fps CROSS, so the
    // epoch must actually read the chunked log to count the flip
    val src = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 20).orderBy(col("n"), col("doc_id")).limit(1)
      .localCheckpoint()
    val dup = src.select(lit(9999998L).as("doc_id"), col("lang"),
      col("source"), col("text"))
    Pipeline.curateEpoch(dup, out, Shards, 1L)
    val srcId = src.head().getLong(0)
    val flipped = spark.read.parquet(s"$out/state/vbkt/epoch=1")
      .filter(col("doc_id") === srcId)
    assert(flipped.count() === 1 && flipped.head().getAs[Long]("n_dup") > 0L,
      "the fallback chunk read must surface the crossing flip")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/winvc/chunk=0")),
      "live chunks of a liveness-less commit must survive cleanup")
  }

  test("an empty founding batch neither derails the run nor claims the founding chunk") {
    val out = Files.createTempDirectory("graft-incr-empty0").toString
    val empty = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .filter(lit(false))
    val r0 = Pipeline.curateEpoch(empty, out, Shards, 0L)
    assert(r0.docsSeen === 0L && r0.docsKept === 0L)
    // the REAL founding mass still gets its bucketed-at-birth write
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 1L)
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$out/state/winvc/chunk=1"))
      .toArray.map(_.toString).count(_.contains("bucket=")) > 1,
      "the first batch WITH docs is the effective founding")
    Pipeline.curateEpoch(chunk(0, 120), out, Shards, 2L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-empty0-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("an epoch retry (same id) is idempotent across every artifact") {
    val out = Files.createTempDirectory("graft-incr-idem").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L)
    val first = (corpusRows(out), rows(s"$out/manifest", "shard"),
      rows(s"$out/report", "lang", "source"))
    val retry = Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L)
    val second = (corpusRows(out), rows(s"$out/manifest", "shard"),
      rows(s"$out/report", "lang", "source"))
    assert(first === second, "a retried epoch must rewrite, not drift")
    assert(retry.removed === 0L,
      "retry deltas vs the committed previous epoch (none) see only adds")
    // and a follow-up epoch after the retry still converges
    Pipeline.curateEpoch(chunk(0, 210), out, Shards, 1L)
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-iref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("a completed regate replayed with a DIFFERENT benchmark fails loudly") {
    // the 'rg' marker alone is not enough for the replay short-circuit:
    // it finishes the post-marker steps (meta re-pin + quarantine prune),
    // so short-circuiting under a benchmark the committed regate never
    // flagged state against would silently pin the corpus to it AND
    // destroy the only stored text of resurrectable docs — the recorded
    // benchmark fingerprint must reject the mismatch instead
    val docsAll = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    val bench1 = docsAll.filter(col("n") >= 8 && col("doc_id") >= 100)
      .orderBy(col("doc_id")).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val bench2 = docsAll.filter(col("n") >= 8 && col("doc_id") >= 100)
      .orderBy(col("doc_id").desc).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val bench3 = docsAll.filter(col("n") >= 8)
      .orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-rgsig").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L, Some(bench1))
    Pipeline.regate(spark, out, bench2, 1L)
    val e = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, out, bench3, 1L)
    }
    assert(e.getMessage.contains("DIFFERENT benchmark"))
    // the meta still pins bench2 — the stream continues under it (a
    // silently re-pinned meta would make this epoch fail the pin check)
    Pipeline.curateEpoch(chunk(0, 110), out, Shards, 2L, Some(bench2))
  }

  test("a crashed regate re-runs only with its original benchmark; a different one is refused") {
    // the quarantine consolidation and staging of an UNCOMMITTED regate
    // are keyed by (epochId, base) alone on disk — and after a
    // post-apply crash the old quarantine may hold the only text of docs
    // the apply already removed, so neither reusing NOR rebuilding under
    // a different benchmark is loss-free. The in-flight fingerprint
    // (`bsig`, recorded before the first durable write) must refuse the
    // mismatch and admit the original.
    val sq = spark
    import sq.implicits._
    val docsAll = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    val bench1 = docsAll.filter(col("n") >= 8 && col("doc_id") >= 200)
      .orderBy(col("doc_id")).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-rgcrash").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out, Shards, 0L, Some(bench1))
    Pipeline.curateEpoch(chunk(100, 220), out, Shards, 1L, Some(bench1))
    // bench2 ⊂ the v1 corpus ⇒ the regate certainly removes docs
    // (deltas nonempty, so the post-apply failpoint fires)
    val bench2 = spark.read.parquet(s"$out/corpus")
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val bench3 = spark.read.parquet(s"$out/corpus")
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id").desc).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    Pipeline.failAfterApply = true // the worst window: corpus already mutated
    try intercept[IllegalStateException] {
      Pipeline.regate(spark, out, bench2, 2L)
    } finally Pipeline.failAfterApply = false
    val e = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, out, bench3, 2L)
    }
    assert(e.getMessage.contains("in-flight"))
    // NO epoch may run over the half-applied revision either — a
    // restarted stream re-bases to the regate's own id and would
    // overwrite its consolidated quarantine (the only stored text of
    // docs the apply already removed); the fingerprint guard refuses
    val eEpoch = intercept[IllegalArgumentException] {
      Pipeline.curateEpoch(chunk(0, 110), out, Shards, 2L, Some(bench1))
    }
    assert(eEpoch.getMessage.contains("crashed before committing"))
    // the original benchmark completes the crashed regate and the whole
    // history (with the rest of the fixture delivered under v2)
    // converges to its one-shot
    Pipeline.regate(spark, out, bench2, 2L)
    Pipeline.curateEpoch(chunk(0, 110), out, Shards, 3L, Some(bench2))
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-rgcrash-ref").toString, Shards,
      Some(bench2))
    assertEqualsOneShot(out, oneShot)
    // and a PRE-FINGERPRINT in-flight regate (quar consolidation on disk,
    // no bsig) refuses outright — its benchmark is unverifiable
    val out2 = Files.createTempDirectory("graft-incr-rgold").toString
    Pipeline.curateEpoch(chunk(200, Long.MaxValue), out2, Shards, 0L, Some(bench1))
    Seq((1L, "en", "web", 30L, "stranded quarantined text"))
      .toDF("doc_id", "lang", "source", "n_tok", "text")
      .write.parquet(s"$out2/state/quar/batch=1")
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.regate(spark, out2, bench1, 1L)
    }
    assert(e2.getMessage.contains("fingerprint"))
  }

  test("a foreign committed staging at the epoch's path is rebuilt, never applied") {
    // a committed staging is only reusable when its shard set sits inside
    // the epoch's freshly computed deltas — anything else (a manual
    // restore, corruption, or a pre-fix regate's staging sharing the
    // namespace) must be rebuilt: blindly applying it would overwrite
    // shards with content the epoch never computed and then DELETE the
    // real delta shards it doesn't cover as "emptied"
    val sq = spark
    import sq.implicits._
    val out = Files.createTempDirectory("graft-incr-stval").toString
    Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L)
    // fabricate: shard=99 cannot be any epoch's delta (shards < 16)
    Seq((999999L, "xx", "web", 2L, "bogus text", 99))
      .toDF("doc_id", "lang", "source", "n_tok", "text", "shard")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$out/state/staging/epoch=1/base=0")
    Pipeline.curateEpoch(chunk(0, 150), out, Shards, 1L)
    assert(spark.read.parquet(s"$out/corpus")
      .filter(col("doc_id") === 999999L).isEmpty,
      "the foreign staged content must never reach the corpus")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-stval-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("gate-revision logs fold into chunks: dir counts bounded, regate reads converge") {
    // winc grows one flat dir per gate-on epoch and quar one per
    // contaminating epoch — for a long-lived stream that is the last
    // unbounded artifact family. Past FpCompactAt flats they must fold
    // into immutable chunks (commit-recorded liveness, orphan pruning),
    // and a later regate must read flats + chunks seamlessly: re-flag
    // docs whose winc rows folded, resurrect docs whose quarantined text
    // folded.
    val docsAll = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    // 12 bench members, one per epoch, each ≥ 22 tokens AND kept by the
    // ungated funnel — keepability is monotone-decreasing over epochs, so
    // final-kept ⇒ keepable at its own epoch ⇒ the epoch quarantines it
    // (contaminated-but-otherwise-kept) and writes a quar flat
    val ungated = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-fold-ug").toString, Shards)
    val marks: Array[Long] = spark.read.parquet(ungated.corpusPath)
      .select(col("doc_id"))
      .join(docsAll.filter(col("n") >= 22), Seq("doc_id"))
      .orderBy(col("doc_id")).collect().map(_.getLong(0))
    assert(marks.length >= 12, s"fixture holds only ${marks.length} keepable 22+-token docs")
    val ids: Seq[Long] = (0 until 12).map(i => marks(i * (marks.length / 12)))
    val bench1 = docsAll.filter(col("doc_id").isInCollection(ids))
      .select(col("doc_id"), col("text")).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-fold-out").toString
    val cuts: Seq[Long] = Long.MinValue +: ids.tail :+ Long.MaxValue
    (0 until 12).foreach { i =>
      Pipeline.curateEpoch(chunk(cuts(i), cuts(i + 1)), out, Shards,
        i.toLong, Some(bench1))
    }
    def dirsOf(path: String, prefix: String): Seq[Long] =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) Nil
      else java.nio.file.Files.list(java.nio.file.Paths.get(path))
        .toArray.map(_.toString.split("/").last).filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toLong).toSeq
    assert(dirsOf(s"$out/state/winc", "batch=").size <= Pipeline.FpCompactAt,
      "winc flats must fold once FpCompactAt of them accumulate")
    assert(dirsOf(s"$out/state/wincc", "chunk=").nonEmpty,
      "12 gate-on epochs must have produced a winc chunk")
    assert(dirsOf(s"$out/state/quar", "batch=").size <= Pipeline.FpCompactAt,
      "quar flats must fold once FpCompactAt of them accumulate")
    assert(dirsOf(s"$out/state/quarc", "chunk=").nonEmpty,
      "12 contaminating epochs must have produced a quar chunk")
    // revision: bench2 ⊂ the v1-gated corpus (disjoint from bench1's
    // members — those are quarantined, not in the corpus), so the regate
    // must remove bench2's members and resurrect every bench1 member —
    // including the ones whose quarantined text lives only in a chunk
    val bench2 = spark.read.parquet(s"$out/corpus")
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val rr = Pipeline.regate(spark, out, bench2, 12L)
    assert(rr.added >= 12L,
      "every chunk- or flat-quarantined bench1 member must resurrect")
    assert(rr.removed >= 1L, "bench2 members were kept under v1")
    // the consolidation retired every earlier flat AND chunk
    assert(dirsOf(s"$out/state/quar", "batch=") === Seq(12L),
      "the regate's consolidated quarantine must be the only quar dir left")
    assert(dirsOf(s"$out/state/quarc", "chunk=").isEmpty,
      "superseded quar chunks must be pruned")
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-fold-ref").toString, Shards,
      Some(bench2))
    assertEqualsOneShot(out, oneShot)
  }

  test("regate's shuffle volume is one corpus pass, not corpus × state families") {
    // regate is the DECLARED O(corpus) operation — but "O(corpus) once":
    // its shuffled rows must sit within a small constant of the gated
    // founding epoch's (which tokenized and window-fp'd the same corpus),
    // never re-shuffling the corpus per state family or per epoch layer.
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffled.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measured(fn: => Unit): Long = drained(shuffled)(fn)
    val docsAll = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    val bench1 = docsAll.filter(col("n") >= 8 && col("doc_id") >= 200)
      .orderBy(col("doc_id")).limit(2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val out = Files.createTempDirectory("graft-incr-rgshuf").toString
    spark.sparkContext.addSparkListener(listener)
    try {
      val founding = measured {
        Pipeline.curateEpoch(chunk(100, Long.MaxValue), out, Shards, 0L,
          Some(bench1)) }
      measured { // a tail epoch so the regate reads layered state
        Pipeline.curateEpoch(chunk(0, 120), out, Shards, 1L, Some(bench1)) }
      val bench2 = spark.read.parquet(s"$out/corpus")
        .filter(size(split(col("text"), " ")) >= 8)
        .orderBy(col("doc_id").desc).limit(2)
        .select(col("doc_id"), col("text")).localCheckpoint()
      val regate = measured {
        Pipeline.regate(spark, out, bench2, 2L) }
      assert(founding > 0L)
      assert(regate <= founding * 3,
        s"regate must shuffle one corpus pass, not corpus × families " +
          s"($regate vs founding $founding)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("fpcnt union folds engage, bound rows-per-fp at 2, and still converge") {
    // the fold-residue smoothing: each fpcnt fold merges only half its
    // slice (the sum exchange) and UNION-writes the other half (head
    // rows pass through + one summed delta row). The commit's fpUnion
    // set forces a union bucket's NEXT fold to merge, so no head layer
    // ever holds more than 2 rows per (bucket, fp) — readers sum rows,
    // so correctness is convergence, pinned against the one-shot.
    val out = Files.createTempDirectory("graft-incr-ufold").toString
    val cuts = (0 to 10).map(i => i * 15L)
    Pipeline.curateEpoch(chunk(cuts.last, Long.MaxValue), out, Shards, 0L)
    var sawUnion = false
    (0 until 10).foreach { i =>
      Pipeline.curateEpoch(chunk(cuts(9 - i), cuts(10 - i)), out, Shards,
        (i + 1).toLong)
      sawUnion = sawUnion || spark.read
        .parquet(s"$out/state/commit/epoch=${i + 1}")
        .filter(col("kind") === "fpu").limit(1).count() > 0L
    }
    assert(sawUnion, "10 epochs must have union-written at least one " +
      "fpcnt bucket (otherwise the bound below is vacuous)")
    val folds = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$out/state/fpcnt"))
      .toArray.map(_.toString).filter(_.contains("fold="))
    assert(folds.nonEmpty, "10 epochs must have produced fpcnt folds")
    folds.foreach { f =>
      val worst = spark.read.parquet(f).groupBy(col("bucket"), col("fp"))
        .count().agg(max(col("count"))).head().getLong(0)
      assert(worst <= 2L, s"fold layer $f holds $worst rows for one fp — " +
        "a union bucket's next fold must have merged")
    }
    val oneShot = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-incr-ufold-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }

  test("an epoch electing no keeper writes no kbkt layer and still converges") {
    // re-delivering every founding text under LARGER ids: each bag
    // already holds a smaller keeper, so the epoch elects nothing and
    // displaces nothing — the kbkt delta is provably empty
    // (driver-known from the delta agg) and the write must be skipped
    val sq = spark
    import sq.implicits._
    val out = Files.createTempDirectory("graft-incr-kskip").toString
    val orig = chunk(100, Long.MaxValue)
    Pipeline.curateEpoch(orig, out, Shards, 0L)
    // a SLICE only: duplicating the whole corpus would span-flip every
    // doc (each window fp doubles) and legitimately empty the corpus —
    // the converged-but-vacuous case; a slice keeps the rest alive
    val shifted = chunk(100, 180).withColumn("doc_id", col("doc_id") + 1000000L)
    Pipeline.curateEpoch(shifted, out, Shards, 1L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/state/kbkt/epoch=1")),
      "a no-keeper-change epoch must not write a kbkt layer")
    // convergence: the duplicate bags lose their elections and the fp
    // crossings from doubled windows flip span verdicts — both runs agree
    val srcDir = Files.createTempDirectory("graft-incr-kskip-src").toString
    orig.unionByName(shifted)
      .write.parquet(s"$srcDir/documents.parquet")
    assert(spark.read.parquet(s"$out/corpus").count() > 0,
      "the slice duplication must leave a live corpus (vacuousness guard)")
    val oneShot = Pipeline.curate(spark, srcDir,
      Files.createTempDirectory("graft-incr-kskip-ref").toString, Shards)
    assertEqualsOneShot(out, oneShot)
  }
}
