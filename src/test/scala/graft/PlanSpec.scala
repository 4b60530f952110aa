package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the 100-TB contract: filters reach the
  * parquet scan, small dims broadcast, top-k never globally sorts, and
  * metadata-only media queries prune the blob column. These are the
  * properties that decide whether a plan survives a 1000× scale-up, so they
  * are pinned as tests, not just eyeballed once.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("q1: shipdate/discount/quantity filters are pushed to the parquet scan") {
    val p = planOf("q1_filter_agg")
    assert(p.contains("PushedFilters:"), p.take(800))
    assert(p.contains("l_shipdate") && p.contains("GreaterThanOrEqual"),
      "shipdate range should appear in pushed filters")
  }

  test("q1: scan reads only the needed columns") {
    val p = planOf("q1_filter_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      s"projection pruning failed: $readSchema")
  }

  test("q3: nation side is broadcast") {
    val p = planOf("q3_join_agg")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(800))
  }

  test("q9: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = planOf("q9_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q134: weighted reservoir is one narrow scan + TakeOrderedAndProject (no shuffle, no sort)") {
    val p = planOf("q134_weighted_reservoir")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Exchange rangepartitioning"),
      s"the one-pass sampler must not shuffle:\n${p.take(1200)}")
  }

  test("q4: latest-by-key aggregates in two phases (map-side partial)") {
    // max_by carries a string in its buffer, so Spark picks SortAggregate
    // (strings aren't hash-agg buffer types); what matters at scale is the
    // partial phase before the exchange — rows shuffled = keys, not events.
    val p = planOf("q4_latest_by_key")
    assert("(Sort|Hash|ObjectHash)Aggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q28: metadata-only media query prunes the binary column at the scan") {
    val p = planOf("q28_media_meta")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"media blob column should not be read for metadata-only agg: $readSchema")
  }

  test("q31: as-of join uses one key shuffle + sort, not a per-key range join") {
    val p = planOf("q31_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of must not plan as a nested-loop range join")
    // union of two scans → one hash partitioning for the window, plus the
    // final presentation sort; anything more means an extra shuffle crept in
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(shuffles <= 3, s"unexpected shuffles ($shuffles):\n${p.take(1200)}")
  }

  test("q6: multiget pushes the IN-list into the scan") {
    val p = planOf("q6_multiget")
    assert(p.contains("PushedFilters:") && p.contains("In(user_id"),
      p.take(800))
  }

  /** Plan under broadcast-threshold 0: any BroadcastExchange that remains is
    * a forced hint. Only provably-tiny sides (1-row scalar aggregates, the
    * explicit ANN query side) may be pinned; unbounded-cardinality sides
    * (per-term DF table, LSH candidate pairs) must be left to AQE (VERDICT
    * r1 items 3/4 — a forced broadcast OOMs the driver at 100 TB).
    */
  private def withZeroBroadcastThreshold[T](f: => T): T = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try f finally spark.conf.set(k, prev)
  }

  test("q40: per-term DF table is never hint-broadcast (only the 1-row corpus count is)") {
    withZeroBroadcastThreshold {
      val p = planOf("q40_tfidf_topterms")
      val broadcasts = "BroadcastExchange".r.findAllIn(p).size
      assert(broadcasts == 1,
        s"expected exactly the pinned 1-row corpus-count broadcast, got $broadcasts:\n${p.take(1500)}")
    }
  }

  test("q57: dims broadcast into the fact scan; only the key join shuffles") {
    val p = planOf("q57_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"region/nation/customer/supplier should chain broadcast joins:\n${p.take(1500)}")
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      "date filter must reach the orders scan")
  }

  test("q51: unigram LM term table is never hint-broadcast (only the 1-row total is)") {
    withZeroBroadcastThreshold {
      val p = planOf("q51_unigram_logprob")
      val broadcasts = "BroadcastExchange".r.findAllIn(p).size
      assert(broadcasts == 1,
        s"expected exactly the pinned 1-row token-total broadcast, got $broadcasts:\n${p.take(1500)}")
    }
  }

  test("q55: top-100 bigrams plan as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q55_bigram_counts")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q17: LSH candidate pairs are never hint-broadcast") {
    withZeroBroadcastThreshold {
      val p = planOf("q17_dedup_minhash_lsh")
      assert(!p.contains("BroadcastExchange"),
        s"candidate-pair side must stay AQE-decided:\n${p.take(1500)}")
    }
  }

  test("q65: band join is an equi hash join on (key, bucket), never a nested loop") {
    withZeroBroadcastThreshold {
      val p = planOf("q65_interval_join")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"band join must stay an equi-join on (key, bucket):\n${p.take(1500)}")
    }
  }

  test("q68: packing window partitions by the shard key (no single-partition global window)") {
    val p = planOf("q68_seq_packing")
    assert(!p.contains("SinglePartition"),
      s"sequence packing must not funnel the corpus through one task:\n${p.take(1500)}")
  }

  test("q69: HLL sketches aggregate partially before the shuffle (mergeable)") {
    val p = planOf("q69_hll_users")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"sketch agg should run partial+final (merge at reducers):\n${p.take(1500)}")
  }

  test("q71: multi-column profile reads the table exactly once") {
    val p = planOf("q71_profile")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profiling must not rescan per column:\n${p.take(1500)}")
  }

  test("q41: median subtree and keep-count probe share ONE documents scan (ReuseExchange)") {
    // the whole point of the histogram-median plan is that the tokenizing
    // scan of documents happens once. The reuse is an AQE runtime decision
    // (stage-level, on canonically-equal exchanges), so execute first and
    // assert on the FINAL adaptive plan: the second hist consumer must show
    // up as a reused stage, not a second parquet scan.
    val df = SparkEntry.queries("q41_quality_filter")(spark, TestSpark.sf0001)
    df.collect()
    // the adaptive plan string appends the pre-AQE "Initial Plan" section,
    // which re-prints every scan — only the Final Plan section is what ran
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).size
    val reused = p.contains("ReusedQueryStage") || p.contains("ReusedExchange")
    assert(scans == 1 && reused,
      s"q41 must not rescan documents for the median subtree (scans=$scans, reused=$reused):\n${p.take(4000)}")
  }

  test("q123: k-means reads embeddings once (cached quantized corpus), model side broadcast") {
    // the corpus is quantized once into a persisted frame every round reads;
    // the distance join is corpus × broadcast(k-row model) — never a shuffle
    // of the data against the model and never a cartesian of two big sides
    val p = planOf("q123_kmeans")
    // the cached quantized corpus carries an explicit widening exchange
    // (Engine.widen), so the InMemoryRelation child is an AdaptiveSparkPlan
    // whose string echoes its one scan again under "== Initial Plan ==" —
    // count scans the way the q41 pin does, in the executed section only
    val executed = p.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(executed).size <= 1,
      s"k-means must train off the cached quantized corpus, not rescans:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroid model side should be broadcast:\n${p.take(1500)}")
  }

  test("q70/q72: layout and centroid aggregates combine map-side (partial+final)") {
    for (q <- Seq("q70_zorder_ranges", "q72_label_centroids")) {
      val p = planOf(q)
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q should partial-aggregate before the exchange:\n${p.take(1200)}")
    }
  }

  test("q76: both theta cohort sketches build from ONE events scan (conditional agg)") {
    val p = planOf("q76_theta_setops")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"cohort sketches must share a single scan, not one scan per cohort:\n${p.take(1500)}")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"theta sketches should merge partial+final:\n${p.take(1500)}")
  }

  test("q77: bloom prefilter is applied to the orders scan before the confirm join") {
    val p = planOf("q77_bloom_semijoin")
    assert(p.contains("might_contain"),
      s"bloom might_contain must appear in the physical plan:\n${p.take(1500)}")
    val filterIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "prefilter must sit below the join in the plan tree (printed after it)")
  }

  test("q79: heavy hitters accumulate partially per shard before one combine") {
    val p = planOf("q79_topk_terms")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"two-phase top-k must not rescan the corpus:\n${p.take(1500)}")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"approx_top_k should run partial+final:\n${p.take(1500)}")
  }

  test("q80: KLL sketches aggregate partially before the shuffle (mergeable)") {
    val p = planOf("q80_kll_quantiles")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"KLL agg should run partial+final:\n${p.take(1500)}")
  }

  test("q89: per-source cap is one window over one shuffle, no global sort") {
    val p = planOf("q89_source_cap")
    assert("Window".r.findAllIn(p).size >= 1, p.take(1200))
    assert(!p.contains("TakeOrderedAndProject"),
      "cap must rank per source, never plan a global top-k")
    // exactly one width-changing exchange for the window partition key
    assert("hashpartitioning\\(source".r.findAllIn(p).nonEmpty,
      s"window must partition by source:\n${p.take(1200)}")
  }

  test("q92: bipartite candidate join is an equi hash join; only the 1-row split broadcasts") {
    val p = planOf("q92_incremental_dedup")
    assert(!p.contains("CartesianProduct"),
      s"band join must never be a cartesian:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      "BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      "only the scalar split value may cross-join")
  }

  test("join strategy hints select their physical join operators") {
    val orders = Fixtures.orders(spark, TestSpark.sf0001)
    val customer = Fixtures.customer(spark, TestSpark.sf0001)
      .withColumnRenamed("c_custkey", "o_custkey")
    def planWith(strategy: String): String =
      operators.Relational.hintedJoin(orders, customer, Seq("o_custkey"), strategy)
        .queryExecution.executedPlan.toString
    assert(planWith("shuffle_hash").contains("ShuffledHashJoin"),
      "shuffle_hash must skip the sort-merge sort")
    assert(planWith("merge").contains("SortMergeJoin"))
    assert(planWith("broadcast").contains("BroadcastHashJoin"))
  }

  test("q91: resample grid explodes in-plan (no driver-side generation)") {
    val p = planOf("q91_resample_ffill")
    assert(p.contains("Generate") && p.toLowerCase.contains("explode"),
      s"grid must come from sequence+explode inside the plan:\n${p.take(1200)}")
    assert(!p.contains("LocalTableScan"),
      "grid rows must not be a driver-materialized local table")
  }

  test("q98: correlated subquery decorrelates to one aggregate + join, not a per-row re-scan") {
    val df = SparkEntry.queries("q98_correlated_subquery")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    // decorrelation failed if the scalar subquery survives to execution
    // (one inner re-scan per outer row) or degenerates to a nested loop
    assert(!p.contains("ScalarSubquery") && !p.contains("Subquery subquery"),
      s"correlated subquery must be decorrelated:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "decorrelated plan must use equi joins only")
    // exactly one aggregate pair over the inner lineitem (partial+final) —
    // the per-part threshold is computed ONCE and joined back
    val optimized = df.queryExecution.optimizedPlan.toString
    val innerAggs = "Aggregate \\[l_partkey".r.findAllIn(optimized).size
    assert(innerAggs == 1,
      s"expected exactly one per-part aggregate, got $innerAggs:\n${optimized.take(1200)}")
  }

  test("no query plans a cartesian product, and nested-loop joins appear only as 1-row scalar broadcasts") {
    // The whole-inventory scale guard: a CartesianProduct is corpus² work at
    // any size, and a BroadcastNestedLoopJoin is only acceptable when the
    // broadcast side is a single-row scalar aggregate (the documented
    // "broadcast the 1-row global total" pattern). Every legitimate such
    // query is allowlisted HERE so a new accidental nested loop fails loud.
    val scalarBroadcastOk = Set(
      "q103_mixture_weights",    // 1-row (tot, wsum) global total
      "q40_tfidf_topterms",      // 1-row corpus doc count
      "q43_scalar_subquery",     // 1-row uncorrelated scalar
      "q51_unigram_logprob",     // 1-row corpus token total
      "q59_contamination",       // tiny fixed probe-phrase list
      "q75_bigram_logprob",      // 1-row vocab/total scalars
      "q109_bm25",               // 1-row corpus-stats (N, Σdl, df) scalar row
      "q84_overlap_matrix",      // |slices|² sketch pairs (sketches, not rows)
      "q96_series_paa_knn",      // 1-row broadcast query sketch
      "q15_cosine_topk",         // constant-size query-vector set × corpus scoring
      "q20_dedup_embedding",     // same query-set pattern
      "q21_ann_brute",           // same (brute baseline is by definition q×corpus)
      "q114_hard_negatives",     // same query-set pattern (different-label top-k)
      "q22_ann_ivf",             // queries × nlist centroid table (nlist rows)
      "q46_ann_ivf_exhaustive",  // same centroid table
      "q100_ann_ivfpq",          // same centroid table + 1-row LUT scalars
      "q112_embedding_decontam", // eval × ≤16-row cell list (exhaustive probe)
      "q121_drift_psi",          // 1-row (t_base, t_cur) window totals
      "q122_pmi_collocations",   // 1-row corpus bigram/unigram totals
      "q123_kmeans",             // corpus × k-row centroid model (k bounded by design)
      "q132_dsir_resample",      // 1-row (n_pool, n_tgt, v) LM totals
      "q136_ks_drift")           // dense CDF grid = sources × distinct lengths
                                 // (catalog-sized by design) + 1-row N total
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${p.take(1200)}")
      if (!scalarBroadcastOk(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin (allowlist it only if the " +
            s"broadcast side is a 1-row scalar):\n${p.take(1200)}")
    }
  }

  test("q125: both hot-key set joins broadcast; no shuffle of the probe against the hot set") {
    // the hot set is bounded by |probe| / hotThreshold keys — the whole
    // point is that marking hot rows costs a broadcast lookup, not an
    // exchange of the probe/build sides against it
    val p = planOf("q125_skew_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"hot-set marking on both sides must be broadcast joins:\n${p.take(1500)}")
  }

  test("q126: shard manifest reads documents exactly once") {
    val p = planOf("q126_shard_manifest")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"the manifest is one narrow map + one shard-keyed aggregate:\n${p.take(1500)}")
  }

  test("q124: chunk inventory is cached once and shared by both dup-accounting consumers") {
    // the per-fp count and the join back must read the SAME persisted chunk
    // inventory — exactly two InMemoryTableScans over one InMemoryRelation.
    // (No textual parquet-scan count here: the cached subtree's rendering
    // nests earlier cache entries when other suites ran q124 first, so the
    // string count is session-state-dependent; the IMTS pin is the
    // invariant that matters — the corpus-reading subtree materializes
    // once, both consumers read the cache.)
    val p = planOf("q124_cdc_dedup")
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      s"both consumers must share the cached chunk inventory:\n${p.take(1500)}")
  }

  test("q128: both fingerprint consumers share the cached minimizer pass (one corpus read)") {
    // per-v40 doc counts + per-doc rollup must read the SAME persisted
    // selection — the k-gram digest + window-min pass never runs twice.
    // Cleared cache first: q129 persists a projection of the same minimizer
    // subtree, and a leftover entry from an earlier test would be picked up
    // by CacheManager plan-matching and add a third (still-cached) scan.
    spark.catalog.clearCache()
    val p = planOf("q128_winnow_fingerprints")
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      s"both consumers must share the cached minimizers:\n${p.take(1500)}")
  }

  test("q129/q130: candidate joins are equi hash joins, never nested loops") {
    for (name <- Seq("q129_edit_near_dup", "q130_source_span_matrix")) {
      val p = planOf(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name must join candidates on the fingerprint key:\n${p.take(1500)}")
    }
  }

  test("q139: every funnel gate reads the cached tokenized base, not the corpus") {
    // base (doc_id, lang, source, toks) is persisted and entropy/bag/span
    // gates plus the final verdict all consume it — ≥5 InMemoryTableScans
    // (4 base consumers + the cached window-fp branch); the corpus
    // materializes once. (No parquet-scan string count: every IMTS render
    // nests the cached child subtree, so that count is presentation-only.)
    spark.catalog.clearCache()
    val p = planOf("q139_curation_funnel_v2")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 5,
      s"funnel gates must share the cached tokenized base:\n${p.take(1500)}")
  }

  test("q104: both splits read ONE persisted window inventory; bloom prefilter is in-plan") {
    // the decontamination corpus scan+tokenize+fingerprint pass materializes
    // once (train fps, eval n_win fold, eval prefilter+confirm all read the
    // cache — ≥3 InMemoryTableScans), and the eval side is prefiltered by
    // the train-fp bloom (might_contain) before the exact confirm semi-join
    spark.catalog.clearCache()
    val p = planOf("q104_decontamination")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"both splits must share the cached window inventory:\n${p.take(1500)}")
    assert(p.contains("might_contain"),
      s"bloom prefilter must appear in the physical plan:\n${p.take(1500)}")
  }

  test("q140: anomaly window partitions by (event_type, chunk), never by type alone") {
    // the rolling frame's shuffle key must include the position chunk —
    // partitioning by event_type alone caps parallelism at |types| and
    // funnels the whole table through that many sort tasks at 100×
    val p = planOf("q140_rolling_anomaly")
    assert("hashpartitioning\\(event_type#\\d+, chunk#\\d+".r.findAllIn(p).nonEmpty,
      s"frame shuffle key must be (event_type, chunk):\n${p.take(1500)}")
    assert(!p.contains("SinglePartition"),
      s"anomaly frame must not plan a global window:\n${p.take(1200)}")
  }

  test("q143: totals and both gram aggregates read the cached tokenized base") {
    // three consumers (totals, unigram distinct, trigram distinct) must
    // share the one SignalStore materialization, not re-scan the corpus
    spark.catalog.clearCache()
    val p = planOf("q143_ngram_diversity")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"diversity consumers must share the cached base:\n${p.take(1500)}")
  }

  test("q131: vocab side broadcasts; corpus aggregated once behind the cache") {
    val p = planOf("q131_oov_rate")
    assert(p.contains("BroadcastHashJoin"),
      s"the top-V vocab must broadcast, not shuffle the token aggregate:\n${p.take(1500)}")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"vocab induction and the rollup must share the cached (source, token) aggregate:\n${p.take(1500)}")
  }
}
