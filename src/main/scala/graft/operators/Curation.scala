package graft.operators

import graft.{Fixtures, GraftQuery}
import graft.functions.{BloomFilters, Rounding}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships, built from the operators the engine already provides
  * ([EXT], BASELINE.json north star).
  *
  * Scale shape: every stage is a narrow map over the single corpus scan
  * except the dedup (one shuffle on the normalized-text key — at 100 TB
  * you'd key on md5(norm), cf. Dedup.exactDedupByHash) and the final tiny
  * per-language aggregate. The stage ORDER matters at scale: cheap
  * quality/contamination predicates run before the shuffle so the dedup
  * only pays for surviving rows.
  */
object Curation {

  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
  private val blockPhrases = Seq("lorem ipsum", "correct horse battery")

  // ---------------------------------------------------------------- q63
  // Full pipeline: quality-score ≥ 0.5 → contamination drop → near-exact
  // dedup on normalized text (keep the min doc_id) → per-language funnel
  // counts. The emitted funnel (raw → filtered → kept) is the number a
  // curation run reports.
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(enStops: _*)))
    val quality =
      lit(0.4) * (least(col("n_chars"), lit(500)) / lit(500.0)) +
        lit(0.3) * (stopCnt / nTok) +
        lit(0.3) * (least(col("n_chars") / nTok, lit(8.0)) / lit(8.0))
    val clean = blockPhrases.map(p => !col("text").contains(p)).reduce(_ && _)
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val filtered = Fixtures.documents(s, dir)
      .filter(quality >= 0.5 && clean)
      .select(col("doc_id"), col("lang"), norm.as("norm"))
    val kept = filtered
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("grp"))
    val raw = Fixtures.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
    filtered.join(kept, filtered("doc_id") === kept("keep_id"), "left_semi")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .join(raw, Seq("lang"), "right")
      .select(col("lang"), col("n_raw"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  private val q63Sql = {
    val enList = enStops.map(w => s"'$w'").mkString("(", ", ", ")")
    val cleanPred = blockPhrases.map(p => s"strpos(text, '$p') = 0").mkString(" AND ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |    0.4 * (LEAST(n_chars, 500) / 500.0) +
       |    0.3 * (len(list_filter(string_split(text, ' '), t -> t IN $enList)) /
       |           len(string_split(text, ' '))) +
       |    0.3 * (LEAST(n_chars / len(string_split(text, ' ')), 8.0) / 8.0) AS quality
       |  FROM documents),
       |filtered AS (
       |  SELECT doc_id, lang,
       |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
       |  FROM scored WHERE quality >= 0.5 AND $cleanPred),
       |kept AS (SELECT MIN(doc_id) AS keep_id FROM filtered GROUP BY norm),
       |raw AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang),
       |kc AS (
       |  SELECT lang, COUNT(*) AS n_kept FROM filtered
       |  WHERE doc_id IN (SELECT keep_id FROM kept) GROUP BY lang)
       |SELECT raw.lang, raw.n_raw, COALESCE(kc.n_kept, 0) AS n_kept
       |FROM raw LEFT JOIN kc USING (lang) ORDER BY raw.lang""".stripMargin
  }

  // ---------------------------------------------------------------- q64
  // Deterministic train/val/test split: bucket = md5(doc_id) mod 100 →
  // 90/5/5. Hash-based splits are reproducible across runs/engines and
  // stable under corpus growth (a document's split never changes) —
  // the property random() splits lack. Pure narrow map + tiny aggregate.
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val bucket = md5Bucket(col("doc_id"))
    val split = when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    Fixtures.documents(s, dir)
      .select(col("lang"), split.as("split"))
      .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))
  }

  private val q64Sql =
    """WITH b AS (
      |  SELECT lang,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q66
  // Repetition signals (the Gopher-style "repetitious text" quality rules):
  // per document, the fraction of tokens taken by the most frequent word,
  // the duplicate-word fraction (1 − distinct/total), and the fraction of
  // bigrams taken by the most frequent bigram. High values flag boilerplate
  // and degenerate generations — a standard pre-training drop rule.
  //
  // Scale shape: explode → two-level aggregate, all keyed by doc_id, so the
  // shuffles partition on the document — no global state, no hot keys
  // beyond a single document's token count.
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val docs = Fixtures.documents(s, dir)
    val toks = wsTokens(col("text"))
    // explode can't nest inside other expressions — two-step selects.
    val words = docs.select(col("doc_id"), explode(toks).as("w"))
    val wc = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val ws = wc.groupBy(col("doc_id")).agg(
      max(col("c")).as("mx"), sum(col("c")).as("n"), count(lit(1)).as("d"))
    val bigrams = docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(
        zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
    val bc = bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
    val bs = bc.groupBy(col("doc_id")).agg(
      max(col("c")).as("bmx"), sum(col("c")).as("bn"))
    // LEFT join: a 1-token document has no bigrams but must still get its
    // word-level signals (an inner join would silently exempt it from the
    // Gopher-rule filter); its bigram fraction is NULL.
    ws.join(bs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Rounding.stable(col("mx") * lit(1.0) / col("n"), 4).as("top_word_frac"),
        Rounding.stable(lit(1.0) - col("d") * lit(1.0) / col("n"), 4).as("dup_word_frac"),
        Rounding.stable(col("bmx") * lit(1.0) / col("bn"), 4).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  private val q66Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
      |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      |ws AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n, COUNT(*) AS d FROM wc GROUP BY 1),
      |big AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
      |        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
      |bs AS (SELECT doc_id, MAX(c) AS bmx, SUM(c) AS bn FROM bc GROUP BY 1)
      |SELECT ws.doc_id,
      |  floor(mx * 1.0 / n * 10000.0 + 0.5) / 10000.0 AS top_word_frac,
      |  floor((1.0 - d * 1.0 / n) * 10000.0 + 0.5) / 10000.0 AS dup_word_frac,
      |  floor(bmx * 1.0 / bn * 10000.0 + 0.5) / 10000.0 AS top_bigram_frac
      |FROM ws LEFT JOIN bs USING (doc_id) ORDER BY ws.doc_id""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Deterministic per-stratum sampling: keep a row iff its md5-derived
    * bucket (0–99) falls below the stratum's percentage. Hash-based
    * sampling is reproducible across runs AND engines (unlike
    * `df.sampleBy`, whose Bernoulli draw depends on Spark's RNG stream and
    * partitioning), stable under corpus growth, and a pure narrow map — the
    * standard way to rebalance language/source mixes in a training corpus.
    */
  /** Deterministic 0–99 bucket from an id column. ONE copy of the
    * cross-engine-sensitive formula (q64 split + q67 sampling both use it):
    * it must stay bit-identical to the oracle side's
    * `('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 4))::BIGINT % 100`.
    */
  private[graft] def md5Bucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10).cast("long") % 100

  def stratumKeep(idCol: Column, stratum: Column, pctByStratum: Map[String, Int],
      defaultPct: Int): Column = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (k, p)) => when(stratum === k, lit(p)).otherwise(acc)
    }
    md5Bucket(idCol) < pct
  }

  // Downsample dominant-language English to 10%, keep 50% of the rest —
  // emitted as a per-language funnel so the result is small and auditable.
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val keep = stratumKeep(col("doc_id"), col("lang"), Map("en" -> 10), 50)
    Fixtures.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  private val q67Sql =
    """WITH b AS (
      |  SELECT lang,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM b GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q68
  // Greedy sequence packing: assign documents (in stable doc_id order,
  // per language shard) to fixed token-budget bins by cumulative token
  // count — the batch-construction step before training (pack short docs
  // into context-window-sized sequences). A doc belongs to the bin where
  // its first token lands: bin = floor(start_offset / budget).
  //
  // Scale honesty: packing is inherently sequential WITHIN a shard (each
  // doc's bin depends on the running total), so the window partitions by
  // the shard key (lang here; at 100 TB: lang × a hash-shard column, cf.
  // q64's md5-bucket split) and shards pack in parallel — never one global
  // ordered window, which would funnel the corpus through one task.
  private val PackBudget = 256
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Fixtures.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(wsTokens(col("text"))).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("n_tok")) / lit(PackBudget)).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  private val q68Sql =
    """WITH d AS (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT lang, CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  MIN(doc_id) AS first_doc
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q101
  // Sliding-window chunking with overlap: split each document into
  // fixed-width token windows advanced by a smaller stride (25% overlap
  // here) — the context-window preparation step between curation and
  // packing (q68 packs whole short docs; long docs must be chunked first
  // so no span is lost at a hard boundary). Emits a per-chunk 60-bit
  // content fingerprint, so chunk-level dedup can run directly on the
  // output. One narrow map + explode per document — embarrassingly
  // parallel, no shuffle except the final presentation sort.
  private val ChunkWidth = 32
  private val ChunkStride = 24
  private def q101(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride))).as("start"))
      .select(col("doc_id"),
        (col("start") / ChunkStride).cast("long").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(ChunkWidth)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tok"),
        graft.functions.TextFunctions.hash60(concat_ws(" ", col("chunk"))).as("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val q101Sql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(0, len(toks) - 1, $ChunkStride)) AS start
       |  FROM t)
       |SELECT doc_id,
       |  CAST(start // $ChunkStride AS BIGINT) AS chunk_idx,
       |  CAST(len(list_slice(toks, start + 1, start + $ChunkWidth)) AS BIGINT) AS n_tok,
       |  ('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + $ChunkWidth), ' ')), 1, 15))::BIGINT AS fp
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q102
  // Exact substring-window dedup (the cross-document "exact substring"
  // detector of Lee et al. 2022, re-expressed relationally): every
  // SubWidth-token window at EVERY offset is fingerprinted; a window shared
  // by ≥2 documents marks both as containing duplicated spans. Output is
  // the per-document duplicated-window fraction — the signal used to strip
  // boilerplate/licenses that near-dup (whole-doc) passes miss.
  //
  // Scale shape: windows ≈ one row per corpus TOKEN, but each row is a
  // 64-bit fp + doc_id — the shuffle moves ~20 B/token, not documents.
  // One groupBy(fp) counts distinct docs per window, one join back + one
  // groupBy(doc_id) folds the verdict. No self-join, no all-pairs; this is
  // the linear-shuffle alternative to a suffix array at cluster scale.
  private[graft] val SubWidth = 16

  /** Distinct (doc_id, fp) over every SubWidth-token window at every offset
    * — the building block of q102/q104/q105 and the streaming span gate.
    * Docs shorter than SubWidth contribute no rows.
    *
    * Fingerprints feed COUNTS and equality joins only — no fp value reaches
    * a query output — so the hash needs collision-freeness, not oracle
    * parity. Codegen'd xxhash64 over the token-slice ARRAY replaces the old
    * md5(concat_ws(...)): no per-window string build, no digest, and no
    * full-toks-array copy riding every exploded row (the fp array is built
    * in ONE projection per document, then only 8-byte longs explode). The
    * DuckDB oracle keeps its own md5 fingerprints; both engines' counts
    * agree unless a hash collides (≈n²/2⁶⁵ — the same accepted-risk class
    * as the q17 minhash internals, which likewise never face the oracle).
    * The array hash is also strictly more faithful than the joined string:
    * ["a b","c"] vs ["a","b c"] collide as strings but not as arrays.
    *
    * Registry queries read this signal through [[SignalStore.winFps]] (one
    * materialization per run shared by q102/q105/q130/q139); this direct
    * form stays for ad-hoc frames (streaming span gate, specs).
    */
  private[graft] def windowFps(docs: DataFrame): DataFrame =
    winFpsOver(docs.select(col("doc_id"), wsTokens(col("text")).as("toks")),
      SubWidth)

  private def q102(s: SparkSession, dir: String): DataFrame = {
    val wins = SignalStore.winFps(s, dir) // shared persisted signal, read
                                          // twice (per-fp counts + join back)
    val perFp = wins.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
    wins.join(perFp, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .filter(col("n_dup") > 0)
      .select(col("doc_id"), col("n_win"), col("n_dup"),
        Rounding.stable(col("n_dup") / col("n_win"), 4).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  private val q102Sql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + $SubWidth), ' ')), 1, 15))::BIGINT AS fp
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - $SubWidth)) AS start
       |        FROM t WHERE len(toks) >= $SubWidth)),
       |s AS (SELECT fp, COUNT(*) AS nd FROM w GROUP BY 1)
       |SELECT w.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_win,
       |  CAST(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  floor(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS dup_frac
       |FROM w JOIN s USING (fp)
       |GROUP BY 1 HAVING CAST(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) > 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q139
  // Curation funnel v2 — the modern end-to-end keep/drop pipeline composed
  // from the round-8 signals, where q63's funnel uses the classic ones:
  //   1. length gate: 20 ≤ n_tok ≤ 95;
  //   2. entropy floor: 6-dp-rounded token entropy h ≥ 2.0 (q138) — drops
  //      repetitive boilerplate the rule-based q66 patterns miss;
  //   3. bag-of-words dedup: keep the smallest doc_id per sorted-token
  //      multiset (q137's fingerprint as a DROP rule, not just a count);
  //   4. duplicated-span gate: drop docs with ≥ half their 16-token
  //      windows duplicated across the corpus (q102's signal; the exact
  //      2·n_dup ≥ n_win integer form, no rounding at the threshold).
  // Gates 3–4 are computed over the FULL corpus (membership in a dup
  // group does not depend on the other gates) — the declared semantics,
  // mirrored in the oracle. Output: per (lang, source) in/out accounting
  // plus surviving token mass — the report a mixture rebalance consumes.
  //
  // Scale shape: each gate is one of the already-audited linear passes
  // (entropy aggregate, bag hash aggregate, window-fp aggregate) joined
  // back on doc_id; no new join patterns, no pairwise work.
  /** Per-document funnel verdicts `(doc_id, lang, source, n_tok, kept)` —
    * q139's gate composition before the per-(lang, source) rollup, exposed
    * so [[graft.Pipeline]] can materialize the kept corpus from the same
    * verdicts the report aggregates (one gate evaluation, two consumers).
    */
  private[graft] def funnelVerdicts(s: SparkSession, dir: String): DataFrame =
    // ONE corpus read: the tokenized base is the run-shared SignalStore
    // cache and every gate derives from it (a naive composition would
    // re-scan the 100 TB corpus once per gate — 4 reads; PlanSpec pins the
    // cached base). The per-gate token-level shapes are the audited
    // q138/q137/q102 chains, inlined over the shared `toks` array.
    verdictsFrom(docSignals(SignalStore.tokens(s, dir)), SignalStore.winFps(s, dir))

  /** The ONE copy of the decontamination-gate composition over an
    * already-evaluated funnel verdict: a benchmark-contaminated doc is
    * dropped no matter what the other gates said. Shared by the one-shot
    * [[graft.Pipeline.curate]] and the incremental epoch assembler.
    */
  private[graft] def contamKept(kept: Column, contam: Column): Column =
    kept && !contam

  /** Distinct width-[[DecontamWidth]] window fingerprints of a benchmark
    * `(doc_id, text)` frame — the train/eval-set side of the q104
    * contamination formula, reused by the pipeline's opt-in gate. A
    * benchmark is an eval set: small by definition, so downstream probes
    * broadcast it.
    */
  private[graft] def benchmarkFps(bench: DataFrame): DataFrame =
    winFpsOver(
      bench.select(col("doc_id"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("toks")),
      DecontamWidth).select(col("fp")).distinct()

  /** Doc ids of `wins` (a `(doc_id, fp)` width-[[DecontamWidth]] window
    * inventory) sharing at least one window with the benchmark — q104's
    * verdict reduced to the binary gate the curation funnel composes
    * (`n_hit >= 1`; the fraction-valued q104 remains the audit query).
    */
  private[graft] def contaminatedOf(wins: DataFrame, benchFps: DataFrame): DataFrame =
    wins.join(broadcast(benchFps), Seq("fp"), "left_semi")
      .select(col("doc_id")).distinct()

  /** Contaminated doc ids of the corpus at `dir` vs a benchmark frame —
    * the one-shot pipeline's gate input (window inventory over the shared
    * tokenized base; ONE corpus pass).
    */
  private[graft] def contaminatedIds(s: SparkSession, dir: String,
      bench: DataFrame): DataFrame =
    contaminatedOf(
      winFpsOver(SignalStore.tokens(s, dir), DecontamWidth),
      benchmarkFps(bench))

  /** Per-document funnel signals `(doc_id, lang, source, n_tok, h, bag)`
    * over a `(doc_id, lang, source, toks)` frame — everything about a doc
    * the funnel needs that does NOT depend on the rest of the corpus
    * (token count, 6-dp entropy, bag-of-words md5). The ONE copy of the
    * q138-entropy and q137-bag formulas shared by the batch funnel and
    * [[graft.Pipeline]]'s incremental epochs, which persist these rows as
    * compact per-batch state and re-derive corpus-global verdicts from
    * them without ever re-reading earlier batches' text.
    */
  private[graft] def docSignals(base: DataFrame): DataFrame = {
    val dt = base
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val lut = dt.select(col("c")).distinct()
      .select(col("c"), floor(log(col("c").cast("double")) * 1e6 + 0.5)
        .cast("long").as("s6"))
    val ent = dt.join(broadcast(lut), Seq("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"),
        sum(col("c") * col("s6")).as("slog"))
      .select(col("doc_id"), col("n_tok"),
        Rounding.stable(log(col("n_tok").cast("double"))
          - col("slog").cast("double") / (col("n_tok") * 1000000.0), 6).as("h"))
    base.select(col("doc_id"), col("lang"), col("source"),
        md5(concat_ws(" ", sort_array(col("toks")))).as("bag"))
      .join(ent, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tok"), col("h"), col("bag"))
  }

  /** Span-drop predicate over the per-doc window tallies — the ONE copy of
    * the gate-4 formula (shared by [[verdictsFullFrom]] and the incremental
    * epoch assembler in [[graft.Pipeline]]). `n_win = 0` (a doc too short
    * to have windows) can never span-drop.
    */
  private[graft] def spanDropExpr(nWin: Column, nDup: Column): Column =
    nWin > 0 && nDup * 2 >= nWin

  /** The composed keep verdict over a doc's funnel signals — the ONE copy
    * of the gate composition (length band, entropy floor, bag-keeper,
    * span-drop), shared by the one-shot funnel and the incremental epochs.
    */
  private[graft] def keptExpr(nTok: Column, h: Column, bagKeep: Column,
      spanDrop: Column): Column =
    nTok.between(20, 95) && h >= 2.0 && bagKeep && !spanDrop

  /** The corpus-GLOBAL funnel tail over per-doc signals + the window-fp
    * inventory: bag-keeper election (min doc_id per bag), per-fp document
    * counts, the span-drop fold, and the composed verdict. Exposed so the
    * incremental pipeline recomputes verdicts from compact state with the
    * exact formulas q139 verifies — the two entries cannot drift.
    */
  private[graft] def verdictsFrom(sigs: DataFrame, winv: DataFrame): DataFrame =
    verdictsFullFrom(sigs, winv)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"), col("kept"))

  /** [[verdictsFrom]] with the INTERMEDIATE funnel state kept in the output
    * — `(doc_id, lang, source, n_tok, h, bag, bag_keep, n_win, n_dup,
    * kept)`. This is the schema [[graft.Pipeline.curateEpoch]] persists as
    * its per-epoch verdict state: carrying `h`/`bag`/`bag_keep`/`n_win`/
    * `n_dup` is exactly what lets the NEXT epoch update verdicts by
    * delta-join (keeper displacement flips `bag_keep`, crossing window fps
    * bump `n_dup`) instead of re-aggregating every doc ever seen.
    */
  private[graft] def verdictsFullFrom(sigs: DataFrame, winv: DataFrame): DataFrame = {
    // bag-keeper election as a window min: ONE pass over sigs (a self-join
    // on bag would re-execute the entropy aggregate feeding sigs), same
    // bag-keyed shuffle the groupBy form pays
    val byBag = org.apache.spark.sql.expressions.Window.partitionBy(col("bag"))
    val wins = winv.select(col("doc_id"), col("fp"))
    val perFp = wins.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
    val spanTally = wins.join(perFp, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
    sigs
      .withColumn("bag_keep", col("doc_id") === min(col("doc_id")).over(byBag))
      .join(spanTally, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_win", "n_dup")) // short docs have no windows
      .withColumn("kept", keptExpr(col("n_tok"), col("h"), col("bag_keep"),
        spanDropExpr(col("n_win"), col("n_dup"))))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("h"), col("bag"), col("bag_keep"), col("n_win"), col("n_dup"),
        col("kept"))
  }

  /** The per-(lang, source) rollup over funnel verdicts — ONE copy shared
    * by the oracle-pinned q139 and [[graft.Pipeline]]'s shipped report, so
    * the report can never drift from the verified query.
    */
  private[graft] def funnelRollup(verdicts: DataFrame): DataFrame =
    funnelRollupEx(verdicts, withContam = false)

  /** [[funnelRollup]] with an optional `docs_contaminated` column (counts
    * the `contam`-flagged docs per group) — the report shape of a
    * decontamination-gated [[graft.Pipeline]] run. One aggregate, one
    * copy: the plain rollup is the `withContam = false` projection.
    */
  private[graft] def funnelRollupEx(verdicts: DataFrame,
      withContam: Boolean): DataFrame = {
    val base = Seq(count(lit(1)).as("docs_in"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("docs_kept"),
      sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tokens_kept"))
    val aggs = if (withContam)
      base :+ sum(when(col("contam"), 1L).otherwise(0L)).as("docs_contaminated")
    else base
    verdicts
      .groupBy(col("lang"), col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("lang"), col("source"))
  }

  private def q139(s: SparkSession, dir: String): DataFrame =
    funnelRollup(funnelVerdicts(s, dir))

  private val q139Sql =
    s"""WITH ${TextAnalysis.entropyCte},
       |bags AS (
       |  SELECT doc_id,
       |    md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag
       |  FROM documents),
       |keeper AS (SELECT bag, MIN(doc_id) AS keep_id FROM bags GROUP BY 1),
       |bk AS (
       |  SELECT bags.doc_id, bags.doc_id = keeper.keep_id AS bag_keep
       |  FROM bags JOIN keeper USING (bag)),
       |w AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + $SubWidth), ' ')), 1, 15))::BIGINT AS fp
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - $SubWidth)) AS start
       |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |        WHERE len(toks) >= $SubWidth)),
       |pf AS (SELECT fp, COUNT(*) AS nd FROM w GROUP BY 1),
       |sd AS (
       |  SELECT w.doc_id,
       |    SUM(CASE WHEN pf.nd >= 2 THEN 1 ELSE 0 END) * 2 >= COUNT(*) AS span_drop
       |  FROM w JOIN pf USING (fp) GROUP BY 1),
       |verdict AS (
       |  SELECT d.lang, d.source, ent.n_tok,
       |    (ent.n_tok BETWEEN 20 AND 95) AND ent.h >= 2.0
       |      AND bk.bag_keep AND NOT COALESCE(sd.span_drop, FALSE) AS kept
       |  FROM documents d
       |  JOIN ent ON ent.doc_id = d.doc_id
       |  JOIN bk ON bk.doc_id = d.doc_id
       |  LEFT JOIN sd ON sd.doc_id = d.doc_id)
       |SELECT lang, source,
       |  CAST(COUNT(*) AS BIGINT) AS docs_in,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
       |  CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
       |FROM verdict GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q130
  // Cross-source duplicated-span matrix: which SOURCE pairs share exact
  // SubWidth-token windows, and how many distinct windows each pair shares.
  // The corpus-audit view of q102 — per-document dup fractions say HOW MUCH
  // is duplicated; this says WHERE it flows between ingestion sources
  // (mirror detection, syndication, cross-crawl contamination), which is
  // what decides whether to drop a source or dedup against it.
  //
  // Scale shape: rides the same linear windowFps pass, then collapses to
  // DISTINCT (source, fp) — at most |sources| rows per fingerprint — before
  // any pairwise work. The fp self-join fans out ≤ |sources|² per
  // fingerprint (sources are a catalog-sized dimension, not data-sized), so
  // the matrix costs one fp-keyed shuffle over the deduped pairs; no
  // all-pairs document work anywhere. Fingerprints feed counts/joins only
  // (xxhash64 here, md5 in the oracle — the q102 accepted-risk class).
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val srcFps = SignalStore.winFps(s, dir)
      .join(SignalStore.tokens(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("source"), col("fp")).distinct()
    srcFps.as("a").join(srcFps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared_windows"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q130Sql =
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= $SubWidth),
       |w AS (
       |  SELECT DISTINCT source,
       |    ('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + $SubWidth), ' ')), 1, 15))::BIGINT AS fp
       |  FROM (SELECT source, toks, unnest(generate_series(0, len(toks) - $SubWidth)) AS start
       |        FROM t))
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared_windows
       |FROM w a JOIN w b ON a.fp = b.fp AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- q124
  // Windowed content-defined chunking (CDC) + per-document chunk-dup
  // accounting. q101's fixed-stride windows shift ALL downstream chunk
  // fingerprints when one token is inserted early in a document — a crawl
  // re-fetch with a one-word edit re-ingests every chunk. CDC (the
  // gear/Rabin idea from LBFS and modern dedup stores, re-expressed
  // relationally) cuts where a rolling content fingerprint of the trailing
  // CdcWin tokens satisfies fp % CdcDiv == 0: boundaries are a function of
  // LOCAL content, so an edit perturbs only the chunks it touches
  // (CurationSpec pins this shift-invariance: every chunk after the first
  // survives a prefix insertion verbatim). Expected chunk ~CdcDiv tokens.
  //
  // Relation to q74 (Dedup.scala): q74 is single-token-boundary CDC (gear
  // window = 1) emitting the corpus-level boilerplate report; q124 uses an
  // 8-token rolling fingerprint (boundaries keyed to CONTEXT, not to every
  // occurrence of 1/16 of the vocabulary) and emits the per-document dup
  // fraction — the doc-level drop/keep signal. Chunk assembly here is also
  // a different plan shape: boundaries and chunks materialize in ONE narrow
  // higher-order-function projection per document (no per-doc window
  // cumsum, no collect_list rebuild — q74 pays two doc-keyed shuffles).
  //
  // The rolling fingerprint is ADDITIVE (Buzhash family): one 56-bit md5
  // value per TOKEN, window fingerprint = sum of the trailing CdcWin token
  // values. One digest per token instead of one per (window × 8-token
  // string) — the md5 work drops ~8× and the per-position boundary test in
  // the HOF lambda is pure integer adds. The sum is permutation-insensitive
  // within the window, which is irrelevant for a boundary predicate (it
  // needs pseudo-randomness mod CdcDiv, not cryptographic distinctness);
  // 56-bit values keep the 8-term sum < 2⁶⁰, overflow-safe BIGINT in both
  // engines. The oracle mirrors the boundary rule exactly (md5-parity token
  // values + a trailing-ROWS window SUM), so boundaries — and therefore
  // chunk contents — are engine-identical. Chunk fps are match-only
  // (counts, never emitted) and use codegen'd xxhash64 on the token-slice
  // array; the oracle keeps md5 chunk fps — counts agree unless a 64-bit
  // hash collides, the same accepted-risk class as the q17 minhash
  // internals.
  //
  // Scale shape: boundary detection is one narrow token-scale pass (explode
  // → per-token digest → doc-partitioned ROWS-window sum → ~n/CdcDiv cut
  // rows); chunk assembly is one HOF projection per document over the
  // collected cut array; the remaining shuffles are the chunk-fp aggregate
  // and the join back, keyed on the 64-bit chunk fp — the same linear
  // ~20 B/token profile as q102. Cross-doc dup test counts DISTINCT docs
  // per fp, so within-doc repeats (boilerplate headers) don't self-certify
  // as duplicated.
  private val CdcWin = 8
  private val CdcDiv = 16

  /** Per-doc CDC chunk inventory `(doc_id, chunk_idx, n_tok, fp)`.
    *
    * Boundary sums are computed RELATIONALLY (posexplode → one codegen'd
    * md5 per token → per-doc ROWS-window SUM → boundary filter), not with
    * nested array lambdas: an `element_at(tokenValues, i - j)` inside a
    * per-position lambda invites Catalyst's project collapse to inline the
    * whole per-token transform into the lambda body, re-evaluating n
    * digests per position — O(n²) per document (observed: 11× the whole
    * inventory's bench time). The relational form digests each token
    * exactly once and mirrors the oracle SQL shape; the token-scale
    * shuffle is narrow (doc_id, pos, 8-byte value) and doc-partitioned.
    */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    // widen: tokenize + per-token digest + chunk rebuild are the CPU-dense
    // stages, single-task off a single-split scan (Engine.widen)
    val base = graft.Engine.widen(docs, col("doc_id"))
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")))
    // 56-bit per-token md5 values (hash60 >> 4 ≡ first 14 hex digits);
    // trailing CdcWin-sum per position, full windows only, no cut at n
    val wv = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(CdcWin - 1), 0)
    val cutRows = base
      .select(col("doc_id"), col("n"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("n"), col("pos"),
        shiftright(hash60(col("tok")), 4).as("v"))
      .withColumn("s", sum(col("v")).over(wv))
      .filter(col("pos") >= CdcWin - 1 && col("pos") <= col("n") - 2 &&
        pmod(col("s"), lit(CdcDiv.toLong)) === 0)
      .select(col("doc_id"), (col("pos") + 1).as("b"))
    val cutsArr = cutRows.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("b"))).as("cuts"))
    val chunk = (lo: Column, hi: Column) => struct(
      (hi - lo).cast("long").as("n_tok"),
      xxhash64(slice(col("toks"), lo + lit(1), hi - lo)).as("fp"))
    base.join(cutsArr, Seq("doc_id"), "left")
      .withColumn("bs", concat(array(lit(0)),
        coalesce(col("cuts"), array().cast("array<int>")), array(col("n"))))
      .withColumn("chunks", zip_with(
        slice(col("bs"), lit(1), size(col("bs")) - 1),
        slice(col("bs"), lit(2), size(col("bs")) - 1), chunk))
      .select(col("doc_id"), posexplode(col("chunks")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.n_tok").as("n_tok"), col("col.fp").as("fp"))
  }

  private def q124(s: SparkSession, dir: String): DataFrame = {
    val ch = cdcChunks(Fixtures.documents(s, dir))
      .persist() // read twice (per-fp distinct-doc counts + join back); the
                 // per-token digest + boundary pass is the expensive stage
    val perFp = ch.groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("nd"))
    ch.join(perFp, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        Rounding.stable(col("n_dup") / col("n_chunks"), 4).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  private val q124Sql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) > 0),
       |tok AS (
       |  SELECT doc_id, pos, len(toks) AS n,
       |    ('0x' || substr(md5(toks[pos + 1]), 1, 14))::BIGINT AS v
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS pos
       |        FROM t)),
       |roll AS (
       |  SELECT doc_id, pos + 1 AS i, n,
       |    SUM(v) OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN ${CdcWin - 1} PRECEDING AND CURRENT ROW) AS s,
       |    COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
       |                   ROWS BETWEEN ${CdcWin - 1} PRECEDING AND CURRENT ROW) AS c
       |  FROM tok),
       |cuts AS (
       |  SELECT doc_id, i AS b FROM roll
       |  WHERE c = $CdcWin AND i <= n - 1 AND s % $CdcDiv = 0),
       |bounds AS (
       |  SELECT doc_id, 0 AS b FROM t
       |  UNION ALL SELECT doc_id, b FROM cuts
       |  UNION ALL SELECT doc_id, len(toks) FROM t),
       |ob AS (SELECT doc_id, b,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY b) AS rn
       |       FROM bounds),
       |ch AS (
       |  SELECT lo.doc_id,
       |    ('0x' || substr(md5(array_to_string(
       |       list_slice(t.toks, lo.b + 1, hi.b), ' ')), 1, 15))::BIGINT AS fp
       |  FROM ob lo
       |  JOIN ob hi ON hi.doc_id = lo.doc_id AND hi.rn = lo.rn + 1
       |  JOIN t ON t.doc_id = lo.doc_id),
       |perfp AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
       |SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN perfp.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  floor(SUM(CASE WHEN perfp.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS dup_frac
       |FROM ch JOIN perfp USING (fp)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q105
  // Duplicated-span SCRUB — the removal counterpart to q102's detector
  // (Lee et al. 2022 remove repeated substrings rather than whole docs):
  // token positions covered by ANY cross-doc-duplicated window are deleted;
  // the output is the per-doc removal accounting plus a fingerprint of the
  // scrubbed text (the corpus rewrite artifact, hashed so the driver output
  // stays narrow).
  //
  // Scale shape: all stages are token-scale rows keyed by fp, (doc,pos), or
  // doc — linear shuffles, no self-join. Coverage expansion is bounded at
  // SubWidth rows per duplicated window. This is the heavyweight corpus
  // rewrite; it runs once per snapshot, after q102 says how much it'll cut.
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val docs = SignalStore.tokens(s, dir)
      .select(col("doc_id"), col("toks"))
      .filter(size(col("toks")) >= SubWidth)
    // position-bearing window fps — the run-shared signal (posexplode's
    // index IS the window start; match-only values, oracle keeps md5),
    // read twice (dup-fp derivation + coverage expansion)
    val wins = SignalStore.winFpsPos(s, dir)
    val dupFps = wins.select(col("doc_id"), col("fp")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("fp"))
    val covered = wins.join(dupFps, Seq("fp"))
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + SubWidth - 1)).as("pos"))
      .distinct()
    val tokens = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
    val keptAgg = tokens.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_after"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("cleaned"))
    docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - coalesce(col("n_after"), lit(0L))).as("n_removed"),
        graft.functions.TextFunctions.hash60(coalesce(col("cleaned"), lit("")))
          .as("scrubbed_fp"))
      .filter(col("n_removed") > 0)
      .orderBy(col("doc_id"))
  }

  private val q105Sql =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= $SubWidth),
       |w AS (
       |  SELECT doc_id, start,
       |    ('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + $SubWidth), ' ')), 1, 15))::BIGINT AS fp
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - $SubWidth)) AS start
       |        FROM d)),
       |dup AS (
       |  SELECT fp FROM (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY 1)
       |  WHERE nd >= 2),
       |cov AS (
       |  SELECT DISTINCT doc_id, unnest(generate_series(start, start + ${SubWidth - 1})) AS pos
       |  FROM w JOIN dup USING (fp)),
       |tok AS (
       |  SELECT doc_id, pos, toks[pos + 1] AS tok
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS pos FROM d)),
       |kept AS (
       |  SELECT t.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_after,
       |    array_to_string(list(t.tok ORDER BY t.pos), ' ') AS cleaned
       |  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |  WHERE c.pos IS NULL GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(len(d.toks) AS BIGINT) AS n_tok,
       |  CAST(len(d.toks) - COALESCE(k.n_after, 0) AS BIGINT) AS n_removed,
       |  ('0x' || substr(md5(COALESCE(k.cleaned, '')), 1, 15))::BIGINT AS scrubbed_fp
       |FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
       |WHERE len(d.toks) - COALESCE(k.n_after, 0) > 0
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q104
  // Benchmark decontamination (the GPT-3 appendix-C n-gram scrub): for each
  // document in the held-out test split (q64's md5 bucket ≥ 95), the
  // fraction of its 8-token windows that appear ANYWHERE in the train split
  // (bucket < 90). Docs over the threshold get dropped from the benchmark —
  // this is the asymmetric eval→train direction q59's phrase check and
  // q102's symmetric span detector don't cover.
  //
  // Scale shape: ONE corpus scan+tokenize — both splits derive from one
  // persisted window inventory (q139's shared-base pattern; the previous
  // form scanned and tokenized the corpus once per split, and the md5
  // bucket predicate prunes nothing at the scan). Train fingerprints are
  // one 64-bit-key set (~one row per train token); the verdict join rides
  // a bloom prefilter built from them (q77's plumbing): n_win folds per
  // eval doc BEFORE the filter, then only bloom-surviving eval windows —
  // ≈ the truly contaminated ones + fpp — reach the exact confirm
  // semi-join, so the shuffled eval side shrinks from every-window to
  // ~hits. Blooms have no false negatives and the semi-join removes the
  // false positives, so the answer is EXACT (CurationSpec pins ≡ the
  // plain-join form); the oracle keeps the plain left join.
  private[graft] val DecontamWidth = 8

  /** FALLBACK sizing constant for the q104 bloom build (4 Mi keys → a
    * 4 MB filter at 8 bits/key), used only for ad-hoc frames with no
    * [[SignalStore]] entry (CurationPropSpec's random corpora). The
    * registry q104 sizes from [[SignalStore.decontamTrainFpEst]] instead —
    * the round-11 idle bench showed the constant's oversized filter
    * DOMINATING q104's cost (eager-4Mi 6.4 s vs eager-counted 1.9 s at
    * sf0.1: every partial-aggregate task allocates and merges the full
    * 4 MB bitset regardless of data size). Mis-sizing remains benign for
    * CORRECTNESS: oversizing costs filter bytes, undersizing costs
    * prefilter selectivity (higher fpp) — never the answer, because the
    * exact confirm semi-join removes every false positive; the
    * `q104_windows_pre`/`q104_windows_post` observe metrics make the
    * selectivity visible either way.
    */
  private[graft] val DecontamBloomItems = 4L << 20

  /** Distinct `(doc_id, bucket, fp)` decontamination window inventory over
    * a `(doc_id, toks)` frame: match-only width-[[DecontamWidth]] xxhash64
    * fps (see [[windowFps]]; oracle keeps md5) for the train (< 90) and
    * eval (≥ 95) md5 buckets — 90–94 feed neither split, pruned before the
    * explode. Registry q104 reads this through [[SignalStore.decontamWins]]
    * (store-owned persist, shared across constructions); this direct form
    * stays for ad-hoc frames (CurationPropSpec's random corpora).
    */
  private[graft] def decontamWins(tokens: DataFrame): DataFrame =
    winFpsOver(
      tokens.select(col("doc_id"), md5Bucket(col("doc_id")).as("bucket"),
          col("toks"))
        .filter(col("bucket") < 90 || col("bucket") >= 95),
      DecontamWidth, extra = Seq("bucket"))

  /** Distinct `(doc_id[, extra...], fp)` window fingerprints at `width`
    * over a tokenized frame — the ONE copy of the slice-hash formula behind
    * the width-[[SubWidth]] span signals ([[windowFps]]) and the
    * width-[[DecontamWidth]] decontamination inventories (batch q104 and
    * [[graft.streaming.DecontamStream]]'s probe side).
    */
  private[graft] def winFpsOver(tokens: DataFrame, width: Int,
      extra: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ extra).map(col)
    tokens.filter(size(col("toks")) >= width)
      .select(keep :+ explode(transform(
        sequence(lit(0), size(col("toks")) - width),
        i => xxhash64(slice(col("toks"), i + 1, lit(width))))).as("fp"): _*)
      .distinct() // within-doc repeats count once
  }

  /** q104 body; `bloom = false` is the plain exact-join reference shape the
    * spec pins the bloom path against. The bloom build rides the final
    * plan as a scalar subquery ([[BloomFilters.mightContainLazy]] — the
    * `InjectRuntimeFilter` plan shape), sized by the store-cached
    * [[SignalStore.decontamTrainFpEst]] — the FIRST construction in a
    * session pays that one sketch-aggregate job; every later construction
    * (and EXPLAIN/planOf) is job-free.
    */
  private[graft] def decontam(s: SparkSession, dir: String,
      bloom: Boolean): DataFrame =
    decontamFromWins(SignalStore.decontamWins(s, dir), bloom,
      if (bloom) SignalStore.decontamTrainFpEst(s, dir) else DecontamBloomItems)

  /** q104 over any `(doc_id, toks)` frame — exposed so CurationPropSpec can
    * sweep random corpora for the bloom ≡ exact contract beyond the
    * fixture. Spec path: the inventory is UNPERSISTED here (recomputed per
    * fold at spec scale); production rides the store-owned cache.
    */
  private[graft] def decontamOver(tokens: DataFrame, bloom: Boolean): DataFrame =
    decontamFromWins(decontamWins(tokens), bloom)

  private def decontamFromWins(wins: DataFrame, bloom: Boolean,
      numItems: Long = DecontamBloomItems): DataFrame = {
    // per-doc dups don't matter to a semi-join or a bloom insert, so the
    // train side skips the distinct-on-fp shuffle entirely
    val trainFp = wins.filter(col("bucket") < 90).select(col("fp"))
    val evalW = wins.filter(col("bucket") >= 95).select(col("doc_id"), col("fp"))
    val nWin = evalW.groupBy(col("doc_id")).agg(count(lit(1)).as("n_win"))
    val evalPre =
      if (!bloom) evalW
      else
        // NO SILENT CAPS: an undersized bloom only degrades prefilter
        // selectivity (the confirm join keeps the answer exact), but that
        // degradation must be VISIBLE — the pre/post window counts ride
        // observe() metrics (the q84/TriCap pattern), so a pass-through
        // rate near 1.0 on a mostly-clean corpus flags a mis-sized filter
        evalW.observe("q104_windows_pre", count(lit(1)).as("eval_windows"))
          .filter(BloomFilters.mightContainLazy(trainFp, col("fp"),
            col("fp"), numItems = numItems))
          .observe("q104_windows_post", count(lit(1)).as("prefiltered_windows"))
    decontamVerdict(evalPre, trainFp, nWin)
  }

  /** The exact confirm fold shared by batch q104 and the streaming gate:
    * semi-join the (possibly bloom-prefiltered) eval windows against the
    * train fingerprints, then fold the per-doc contamination fraction.
    * Inner join on `nWin`: only docs with ≥ 1 confirmed hit emit.
    */
  private[graft] def decontamVerdict(evalPre: DataFrame, trainFp: DataFrame,
      nWin: DataFrame): DataFrame =
    evalPre.join(trainFp, Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      .join(nWin, Seq("doc_id")) // inner: only docs with ≥1 confirmed hit
      .select(col("doc_id"), col("n_win"), col("n_hit"),
        Rounding.stable(col("n_hit") / col("n_win"), 4).as("contam_frac"))
      .orderBy(col("doc_id"))

  private def q104(s: SparkSession, dir: String): DataFrame =
    decontam(s, dir, bloom = true)

  private val q104Sql =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket,
       |    string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= $DecontamWidth),
       |w AS (
       |  SELECT DISTINCT doc_id, bucket,
       |    ('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + $DecontamWidth), ' ')), 1, 15))::BIGINT AS fp
       |  FROM (SELECT doc_id, bucket, toks, unnest(generate_series(0, len(toks) - $DecontamWidth)) AS start
       |        FROM d)),
       |t AS (SELECT DISTINCT fp FROM w WHERE bucket < 90),
       |e AS (SELECT doc_id, fp FROM w WHERE bucket >= 95)
       |SELECT e.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_win,
       |  CAST(SUM(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  floor(SUM(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS contam_frac
       |FROM e LEFT JOIN t ON e.fp = t.fp
       |GROUP BY 1 HAVING CAST(SUM(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) > 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q103
  // Temperature-smoothed source mixture table (the "data mixture" step of
  // every LLM pretraining recipe): per-source token counts → natural share
  // → alpha-smoothed share (share^alpha, renormalized; alpha=0.5 here) →
  // repeat factor (epochs over that source needed to realize the smoothed
  // mix). Pure aggregate output — the artifact a run reviews/commits before
  // sampling; q67/q85/q89 consume rates like these.
  //
  // Scale shape: one narrow map (token count per doc) + one tiny groupBy
  // (|sources| rows) + a broadcast of the 1-row global total. Nothing
  // corpus-sized ever shuffles twice.
  private val MixAlpha = 0.5
  private def q103(s: SparkSession, dir: String): DataFrame = {
    val per = Fixtures.documents(s, dir)
      .select(col("source"), size(wsTokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot"),
      sum(pow(col("n_tokens"), lit(MixAlpha))).as("wsum"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot"), 6).as("nat_share"),
        round(pow(col("n_tokens"), lit(MixAlpha)) / col("wsum"), 6).as("mix_share"),
        round((pow(col("n_tokens"), lit(MixAlpha)) / col("wsum")) /
          (col("n_tokens") / col("tot")), 4).as("repeat_factor"))
      .orderBy(col("source"))
  }

  private val q103Sql =
    s"""WITH per AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT SUM(n_tokens) * 1.0 AS tot, SUM(POW(n_tokens, $MixAlpha)) AS wsum FROM per)
       |SELECT source, n_docs, n_tokens,
       |  ROUND(n_tokens / tot, 6) AS nat_share,
       |  ROUND(POW(n_tokens, $MixAlpha) / wsum, 6) AS mix_share,
       |  ROUND((POW(n_tokens, $MixAlpha) / wsum) / (n_tokens / tot), 4) AS repeat_factor
       |FROM per, tot ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q127
  // Mixture-realizing read order: weighted-fair (virtual-time) interleave
  // of sources — the step between q103's mixture TABLE and an actual
  // dataloader schedule. Each source's documents are ranked by md5 key
  // (the q85/q126 deterministic-shuffle order); document rn of source s is
  // scheduled at virtual time vt = rn·10¹² div w_s, and the global read
  // order is ascending vt — classic WFQ/virtual-time scheduling, which
  // realizes per-source throughput ∝ w_s in every schedule prefix (±1 doc
  // per source, the standard WFQ fairness bound). Weights here are
  // w_s = ⌊√tokens_s⌋ — a √-smoothed mixture of the same shape q103's
  // α = 0.5 smoothing produces, kept INTEGER (and IEEE-sqrt exact) so vt is
  // BIGINT floor arithmetic and both engines order identically; ties are
  // impossible in the (vt, source, rn) total order.
  //
  // Scale shape: per-source token totals are a tiny aggregate; ranking is
  // one WindowExec partitioned by source (never global); vt is a narrow
  // map over a broadcast weight table; the top-ScheduleK selection is a
  // TakeOrdered, not a global sort. The full schedule at 100 TB is the
  // same plan with the limit replaced by a range-partitioned write on vt.
  private val ScheduleK = 200
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val docs = Fixtures.documents(s, dir)
    val weights = docs
      .groupBy(col("source"))
      .agg(sum(size(wsTokens(col("text")))).cast("long").as("nt"))
      .select(col("source"), floor(sqrt(col("nt"))).cast("long").as("w"))
    val ranked = docs
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
    ranked.join(broadcast(weights), "source")
      .withColumn("vt", expr("(rn * 1000000000000) div w"))
      .select(col("doc_id"), col("source"), col("rn"), col("vt"))
      .orderBy(col("vt"), col("source"), col("rn"))
      .limit(ScheduleK)
  }

  private val q127Sql =
    s"""WITH per AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS nt
       |  FROM documents GROUP BY 1),
       |w AS (SELECT source, CAST(FLOOR(SQRT(nt)) AS BIGINT) AS w FROM per),
       |r AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
       |  FROM documents)
       |SELECT r.doc_id, r.source, r.rn, (r.rn * 1000000000000) // w.w AS vt
       |FROM r JOIN w USING (source)
       |ORDER BY vt, source, rn LIMIT $ScheduleK""".stripMargin

  // ---------------------------------------------------------------- q85
  // Deterministic EXACT-k per-stratum sample: rank documents inside each
  // language by md5(doc_id) and keep the first k — the fixed-size eval-set
  // builder (q67's rate-based sampling can't promise "exactly 20 per
  // lang"). Hash order is reproducible across runs and engines and
  // independent of physical row order; ties are impossible (md5 of
  // distinct ids). Scale shape: one window shuffle partitioned by the
  // stratum — never a global sort; k rows per stratum survive.
  private val SamplePerStratum = 20
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Fixtures.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SamplePerStratum)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("rk").cast("long").as("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  private val q85Sql =
    s"""SELECT doc_id, lang, n_chars, CAST(rk AS BIGINT) AS rk FROM (
       |  SELECT doc_id, lang, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $SamplePerStratum ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- q89
  // Per-source quota cap (domain balancing): keep at most CapPerSource docs
  // per source, longest (n_chars, the quality proxy used throughout the
  // curation queries) first, doc_id as the deterministic tie-break. The
  // canonical "no single domain dominates the corpus" policy from crawl
  // curation. Same top-k-per-group shape as q8: ONE shuffle on source,
  // rank + filter fused in a single WindowExec, no global sort — the cap
  // holds at any corpus size because per-source state is k rows.
  private val CapPerSource = 10

  private def q89(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Fixtures.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= CapPerSource)
      .orderBy(col("source"), col("rn"))
  }

  private val q89Sql =
    s"""SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $CapPerSource ORDER BY source, rn""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q89_source_cap", q89, Some(q89Sql)),
    GraftQuery("q85_exact_k_sample", q85, Some(q85Sql)),
    GraftQuery("q63_curation_pipeline", q63, Some(q63Sql)),
    GraftQuery("q64_dataset_split", q64, Some(q64Sql)),
    GraftQuery("q66_repetition", q66, Some(q66Sql)),
    GraftQuery("q67_stratified_sample", q67, Some(q67Sql)),
    GraftQuery("q68_seq_packing", q68, Some(q68Sql)),
    GraftQuery("q101_chunking", q101, Some(q101Sql)),
    GraftQuery("q102_substring_dedup", q102, Some(q102Sql)),
    GraftQuery("q103_mixture_weights", q103, Some(q103Sql)),
    GraftQuery("q104_decontamination", q104, Some(q104Sql)),
    GraftQuery("q105_span_scrub", q105, Some(q105Sql)),
    GraftQuery("q124_cdc_dedup", q124, Some(q124Sql)),
    GraftQuery("q127_mixture_schedule", q127, Some(q127Sql)),
    GraftQuery("q130_source_span_matrix", q130, Some(q130Sql)),
    GraftQuery("q139_curation_funnel_v2", q139, Some(q139Sql)))
}
