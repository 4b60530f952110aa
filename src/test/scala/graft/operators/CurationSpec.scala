package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("stratified sample keeps ~10% of en and ~50% of the rest, deterministically") {
    val rows = SparkEntry.queries("q67_stratified_sample")(spark, dir).collect()
    for (r <- rows) {
      val (lang, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(kept <= total)
      val target = if (lang == "en") 0.10 else 0.50
      // md5 buckets are uniform; at fixture sizes allow wide tolerance
      assert(math.abs(kept.toDouble / total - target) < 0.25,
        s"$lang: kept $kept of $total, target $target")
    }
    val again = SparkEntry.queries("q67_stratified_sample")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("sequence packing preserves every document; bins are valid start-offset buckets") {
    // Only assert TRUE invariants of bin = floor(start_offset / budget):
    // a doc longer than the budget legally skips bins (no contiguity), and
    // fill level depends on doc-length distribution (no near-budget bound) —
    // fixture-dependent asserts on those would break on regenerated data.
    val packed = SparkEntry.queries("q68_seq_packing")(spark, dir)
    val nDocs = packed.agg(sum(col("n_docs"))).head().getLong(0)
    assert(nDocs === Fixtures.documents(spark, dir).count())
    // every lang starts at bin 0 (first doc's start offset is 0)...
    assert(packed.groupBy(col("lang")).agg(min(col("bin")).as("mn"))
      .filter(col("mn") =!= 0).isEmpty)
    // ...and the max bin is bounded by the lang's total tokens / budget
    val bad = packed.groupBy(col("lang"))
      .agg(max(col("bin")).as("mx"), sum(col("sum_tokens")).as("tot"))
      .filter(col("mx") > col("tot") / lit(256))
    assert(bad.isEmpty)
  }

  test("repetition fractions are in (0,1] and top_word_frac ≥ 1/n_tokens") {
    val rep = SparkEntry.queries("q66_repetition")(spark, dir)
    assert(rep.filter(col("top_word_frac") <= 0 || col("top_word_frac") > 1 ||
      col("dup_word_frac") < 0 || col("dup_word_frac") >= 1 ||
      col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).isEmpty)
  }

  test("chunking covers every token with no gaps: contiguous indices, stride-exact count, exact reconstruction") {
    // width 32 / stride 24: chunk k spans tokens [24k, 24k+32); the last
    // token covered is 24·max_idx + len(last chunk). Both must equal the
    // doc's token count, and indices must be 0..k contiguous — together
    // these prove no token span is lost at any boundary.
    val chunks = SparkEntry.queries("q101_chunking")(spark, dir)
    val perDoc = chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      min(col("chunk_idx")).as("mn"),
      max(col("chunk_idx")).as("mx"),
      max(col("chunk_idx") * 24 + col("n_tok")).as("covered"))
    val toks = Fixtures.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
    val joined = perDoc.join(toks, "doc_id")
    assert(joined.filter(col("mn") =!= 0 || col("mx") =!= col("n_chunks") - 1).isEmpty,
      "chunk indices must be contiguous from 0")
    assert(joined.filter(col("n_chunks") =!= floor((col("nt") - 1) / 24) + 1).isEmpty,
      "chunk count must match the stride formula")
    assert(joined.filter(col("covered") =!= col("nt")).isEmpty,
      "max covered token must equal the doc's token count")
  }

  test("substring dedup flags identical-text documents at dup_frac 1.0") {
    // identical docs share EVERY window, so any text owned by ≥2 doc_ids
    // (and long enough to have a window) must surface with dup_frac = 1.
    val docs = Fixtures.documents(spark, dir)
    val dupDocs = docs.groupBy(col("text")).agg(
        count(lit(1)).as("n"), collect_list(col("doc_id")).as("ids"))
      .filter(col("n") >= 2 && size(split(col("text"), " ")) >= 16)
      .select(explode(col("ids")).as("doc_id"))
    val out = SparkEntry.queries("q102_substring_dedup")(spark, dir)
    val missing = dupDocs.join(out.filter(col("dup_frac") === 1.0), Seq("doc_id"), "left_anti")
    assert(missing.isEmpty, "every identical-pair member must be fully duplicated")
    // and fractions are sane everywhere
    assert(out.filter(col("dup_frac") <= 0 || col("dup_frac") > 1 ||
      col("n_dup") > col("n_win")).isEmpty)
  }

  test("mixture shares each sum to 1 and repeat_factor is mix/nat") {
    val m = SparkEntry.queries("q103_mixture_weights")(spark, dir).collect()
    assert(math.abs(m.map(_.getAs[Double]("nat_share")).sum - 1.0) < 1e-4)
    assert(math.abs(m.map(_.getAs[Double]("mix_share")).sum - 1.0) < 1e-4)
    for (r <- m) {
      val (nat, mix, rf) = (r.getAs[Double]("nat_share"),
        r.getAs[Double]("mix_share"), r.getAs[Double]("repeat_factor"))
      assert(math.abs(rf - mix / nat) < 1e-2, s"repeat_factor $rf != $mix/$nat")
    }
  }

  test("span scrub flags exactly the substring-dedup doc set and removes at least one full window") {
    // q105 deletes positions covered by duplicated windows; a doc appears
    // in its output iff it has ≥1 duplicated window — exactly q102's doc
    // set — and any duplicated window covers SubWidth consecutive tokens,
    // so n_removed ≥ 16 always.
    val scrub = SparkEntry.queries("q105_span_scrub")(spark, dir)
    val detect = SparkEntry.queries("q102_substring_dedup")(spark, dir)
    assert(scrub.select("doc_id").join(detect.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty)
    assert(detect.select("doc_id").join(scrub.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty)
    assert(scrub.filter(col("n_removed") < 16 || col("n_removed") > col("n_tok")).isEmpty)
  }

  test("decontamination fractions are in (0,1] and only test-split docs are flagged") {
    val out = SparkEntry.queries("q104_decontamination")(spark, dir)
    assert(out.filter(col("contam_frac") <= 0 || col("contam_frac") > 1 ||
      col("n_hit") > col("n_win")).isEmpty)
    val testIds = Fixtures.documents(spark, dir)
      .select(col("doc_id"))
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100 >= 95)
    assert(out.join(testIds, Seq("doc_id"), "left_anti").isEmpty,
      "flagged docs must all be in the test split")
  }

  test("bloom-prefiltered decontamination equals the plain exact join, row for row") {
    // blooms have no false negatives and the confirm semi-join removes the
    // false positives, so the prefiltered path must be EXACT — this is the
    // contract that lets q104 ship the bloom as its default plan
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val withBloom = Curation.decontam(spark, dir, bloom = true).collect().map(key)
    val exact = Curation.decontam(spark, dir, bloom = false).collect().map(key)
    assert(withBloom.nonEmpty, "fixture must exercise the contaminated path")
    assert(withBloom.toSeq === exact.toSeq)
  }

  test("q104's prefilter selectivity is observable: pre/post window counts ride the plan") {
    // NO SILENT CAPS: an undersized bloom degrades selectivity, never the
    // answer — so the degradation must be measurable. The observe metrics
    // expose eval windows before and after the prefilter; post must cover
    // every confirmed hit (no false negatives) while actually pruning
    val df = SparkEntry.queries("q104_decontamination")(spark, dir)
    // metrics attach to THIS queryExecution — run it, then read them
    val hits = df.collect().map(_.getAs[Long]("n_hit")).sum
    val pre = df.queryExecution.observedMetrics("q104_windows_pre")
      .getAs[Long]("eval_windows")
    val post = df.queryExecution.observedMetrics("q104_windows_post")
      .getAs[Long]("prefiltered_windows")
    assert(pre > 0L)
    assert(post >= hits, "the prefilter may never drop a true hit")
    assert(post < pre,
      s"a right-sized bloom must prune clean windows (pre=$pre post=$post)")
  }

  test("CDC chunks partition every document: contiguous indices, token counts sum exactly") {
    import spark.implicits._
    val docs = Fixtures.documents(spark, dir).select(col("doc_id"), col("text"))
    val ch = Curation.cdcChunks(docs)
    val perDoc = ch.groupBy(col("doc_id")).agg(
      sum(col("n_tok")).as("tok_sum"), count(lit(1)).as("k"),
      min(col("chunk_idx")).as("mn"), max(col("chunk_idx")).as("mx"))
    val truth = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    // every chunk non-empty, indices are 0..k-1, token counts reconstruct
    assert(ch.filter(col("n_tok") <= 0).isEmpty)
    val bad = perDoc.join(truth, "doc_id")
      .filter(col("tok_sum") =!= col("n") || col("mn") =!= 0 ||
        col("mx") =!= col("k") - 1)
    assert(bad.isEmpty)
    // boundaries are content-defined, not fixed-stride: chunk lengths vary
    val distinctLens = ch.select(col("n_tok")).distinct().count()
    assert(distinctLens > 3, s"only $distinctLens distinct chunk lengths — looks fixed-stride")
  }

  test("CDC boundaries are shift-invariant: every chunk after the first survives a prefix insertion") {
    import spark.implicits._
    // deterministic pseudo-random token stream long enough to contain cuts
    val words = (0 until 400).map(i =>
      "w" + ((i * 2654435761L) % 97)).mkString(" ")
    val a = Seq((1L, words)).toDF("doc_id", "text")
    val b = Seq((2L, "inserted prefix tokens " + words)).toDF("doc_id", "text")
    val fa = Curation.cdcChunks(a).orderBy(col("chunk_idx"))
      .select(col("fp")).as[Long].collect()
    val fb = Curation.cdcChunks(b).select(col("fp")).as[Long].collect()
    assert(fa.length >= 4, s"fixture produced only ${fa.length} chunks — no cuts to test")
    // multiset containment: chunks 1..k-1 of A must all appear in B
    val bCounts = fb.groupBy(identity).view.mapValues(_.length).toMap
    val missing = fa.drop(1).groupBy(identity).view.mapValues(_.length)
      .filter { case (fp, n) => bCounts.getOrElse(fp, 0) < n }
    assert(missing.isEmpty,
      s"${missing.size} post-first chunks of A vanished after a prefix edit")
  }

  test("mixture schedule interleaves sources in weight proportion (WFQ fairness bound)") {
    import spark.implicits._
    val sched = SparkEntry.queries("q127_mixture_schedule")(spark, dir).collect()
    assert(sched.length === 200)
    // deterministic: same schedule on rerun
    val again = SparkEntry.queries("q127_mixture_schedule")(spark, dir).collect()
    assert(sched.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // WFQ property: at the schedule's vt horizon V, source s has delivered
    // floor(V·w/1e12) docs (capped by its corpus), within the ±1 discrete
    // bound plus the cut-mid-tick tolerance of a count-based prefix
    val w = Fixtures.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("nt"))
      .select(col("source"), floor(sqrt(col("nt"))).cast("long").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nPerSource = Fixtures.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val horizon = sched.map(_.getAs[Long]("vt")).max
    val got = sched.groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong)
    for ((s, ws) <- w) {
      val ideal = math.min(nPerSource(s), horizon * ws / 1000000000000L)
      val g = got.getOrElse(s, 0L)
      assert(math.abs(g - ideal) <= 2,
        s"source $s delivered $g docs at horizon $horizon, fluid ideal $ideal")
    }
    // within-source order is the md5-rank order: rn values are 1..k contiguous
    for ((s, rows) <- sched.groupBy(_.getAs[String]("source"))) {
      val rns = rows.map(_.getAs[Long]("rn")).sorted
      assert(rns === (1L to rns.length).toArray, s"source $s schedule skips ranks")
    }
  }

  test("CDC dedup flags identical-text documents at dup_frac 1.0") {
    val out = SparkEntry.queries("q124_cdc_dedup")(spark, dir)
    // exact-duplicate fixture docs (the q14 groups) share every chunk
    val dupIds = Fixtures.documents(spark, dir)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("doc_id"))
    val flagged = out.filter(col("dup_frac") === 1.0).select("doc_id")
    assert(dupIds.join(flagged, Seq("doc_id"), "left_anti").isEmpty,
      "every exact-duplicate doc must have all its CDC chunks flagged")
    // fractions well-formed; every doc emits a row
    assert(out.filter(col("dup_frac") < 0 || col("dup_frac") > 1 ||
      col("n_dup") > col("n_chunks")).isEmpty)
    assert(out.count() === Fixtures.documents(spark, dir).count())
  }

  test("q139 funnel v2: accounting is consistent and every gate actually fires on the fixture") {
    import spark.implicits._
    val rows = SparkEntry.queries("q139_curation_funnel_v2")(spark, dir)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    for ((_, _, in, kept, tok) <- rows) {
      assert(kept >= 0 && kept <= in)
      assert((kept == 0) == (tok == 0L) || tok >= kept * 20,
        "kept docs are >= 20 tokens each by the length gate")
    }
    val (totIn, totKept) = (rows.map(_._3).sum, rows.map(_._4).sum)
    assert(totIn === Fixtures.documents(spark, dir).count())
    assert(totKept > 0 && totKept < totIn, s"funnel must thin ($totKept/$totIn)")
    // the length gate binds: no kept doc can carry fewer than 20 tokens
    val tokensPerKept = rows.filter(_._4 > 0)
    assert(tokensPerKept.forall(r => r._5 >= 20 * r._4 && r._5 <= 95 * r._4))
  }
}
