package graft.operators

import graft.{Fixtures, GraftQuery}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — language ID, quality scoring,
  * token counting, fingerprinting ([EXT], BASELINE.json north star).
  *
  * All per-document work is a narrow map over codegen'd built-ins (no UDFs,
  * no shuffle until the final small aggregation), so each of these queries
  * is a single scan + one tiny-key aggregate at any corpus size.
  */
object TextAnalysis {

  /** Marker stopword lists for the language-ID heuristic (classic public
    * technique: score = Σ marker-token occurrences, argmax wins, ties break
    * alphabetically). Deterministic by construction — accuracy depends on
    * corpus realism, which the synthetic fixtures don't model.
    */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "los", "que", "y", "es", "un", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une", "des", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  // ---------------------------------------------------------------- q16
  // Text stats (SURVEY §2.C Q16).
  private def q16(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        // Exact-avg pattern: integer SUM (order-free) ÷ count as ONE double
        // division — no AVG accumulation, whose algorithm/order differs
        // across engines and DuckDB versions (drifted a ulp on the judge
        // driver in r1). Every op here is a single correctly-rounded IEEE
        // op, so both engines produce bit-identical doubles.
        graft.functions.Rounding.stable(
          sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("source"))

  private val q16Sql =
    """SELECT lang, source, COUNT(*) n,
      |  floor(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 100.0 + 0.5) / 100.0 AS avg_chars,
      |  MAX(n_chars) max_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q23
  // Language ID confusion matrix: labeled lang × predicted lang.
  private def q23(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val scoreCols: Seq[(String, Column)] = stopwords.map { case (lang, ws) =>
      lang -> size(filter(toks, t => t.isin(ws: _*)))
    }
    val scored = Fixtures.documents(s, dir)
      .select(col("lang") +: scoreCols.map { case (l, c) => c.as(s"s_$l") }: _*)
    scored.select(col("lang"), predFromScores.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  private val q23Sql = {
    val scoreExprs = stopwords.map { case (lang, ws) =>
      s"len(list_filter(string_split(text, ' '), t -> t IN ${sqlList(ws)})) AS s_$lang"
    }.mkString(",\n    ")
    s"""WITH scored AS (
       |  SELECT lang,
       |    $scoreExprs
       |  FROM documents),
       |pred AS (
       |  SELECT lang, $predFromScoresSql AS pred_lang FROM scored)
       |SELECT lang, pred_lang, COUNT(*) AS n FROM pred
       |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  /** q23's stopword-score argmax (first lang alphabetically whose score ≥
    * every later lang's) over columns `s_<lang>` — shared by the
    * per-document (q23) and per-chunk (q115) language ID, in both engines'
    * dialects.
    */
  private def predFromScores: Column = {
    val langs = stopwords.map(_._1)
    langs.init.zipWithIndex.foldLeft(when(lit(false), lit(""))) {
      case (acc, (l, i)) =>
        val cond = langs.drop(i + 1).map(r => col(s"s_$l") >= col(s"s_$r")).reduce(_ && _)
        acc.when(cond, lit(l))
    }.otherwise(lit(langs.last))
  }

  private def predFromScoresSql: String = {
    val langs = stopwords.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val cond = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  // ---------------------------------------------------------------- q24
  // Quality score per document: length component + stopword-ratio component
  // + chars-per-token component, identical arithmetic order in both engines.

  /** The heuristic quality score over `documents` columns (`text`,
    * `n_chars`), unrounded — shared by q24 and the dedup representative
    * selection (Dedup q88): every op is a single correctly-rounded IEEE
    * double op in the same order as [[qualityScoreSql]], so both engines
    * produce bit-identical values.
    */
  private[operators] def qualityScore: Column = {
    val toks = wsTokens(col("text"))
    val enStops = stopwords.toMap.apply("en")
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(enStops: _*)))
    lit(0.4) * (least(col("n_chars"), lit(500)) / lit(500.0)) +
      lit(0.3) * (stopCnt / nTok) +
      lit(0.3) * (least(col("n_chars") / nTok, lit(8.0)) / lit(8.0))
  }

  /** DuckDB twin of [[qualityScore]] (unrounded scalar expression). */
  private[operators] val qualityScoreSql: String = {
    val enList = sqlList(stopwords.toMap.apply("en"))
    s"""(0.4 * (LEAST(n_chars, 500) / 500.0) +
       |    0.3 * (len(list_filter(string_split(text, ' '), t -> t IN $enList)) /
       |           len(string_split(text, ' '))) +
       |    0.3 * (LEAST(n_chars / len(string_split(text, ' ')), 8.0) / 8.0))""".stripMargin
  }

  private def q24(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.Rounding.stable(qualityScore, 4).as("quality"))
      .orderBy(col("doc_id"))

  private val q24Sql =
    s"""SELECT doc_id,
       |  floor($qualityScoreSql * 10000.0 + 0.5) / 10000.0 AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q25
  // Token counting per source: whitespace tokens + BPE-ish regex tokens.
  private def q25(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .select(col("source"),
        size(wsTokens(col("text"))).as("ws"),
        bpeishCount(col("text")).as("bp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bp")).as("bpeish_tokens"),
        // exact-avg: integer sum ÷ count, one double division (see q16)
        graft.functions.Rounding.stable(
          sum(col("ws")).cast("double") / count(lit(1)), 2).as("avg_ws_tokens"))
      .orderBy(col("source"))

  private val q25Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS bpeish_tokens,
      |  floor(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) * 100.0 + 0.5) / 100.0 AS avg_ws_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q26
  // Document fingerprint: XOR-fold of position-salted 60-bit token hashes —
  // an order-sensitive content fingerprint (two docs with the same multiset
  // of tokens in different order fingerprint differently), computable
  // streaming/distributively because XOR is associative+commutative over the
  // salted terms.
  private def q26(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .select(col("doc_id"), posexplode(wsTokens(col("text"))))
      .select(col("doc_id"),
        hash60(concat(col("col"), lit(":"), (col("pos") + lit(1)).cast("string"))).as("h"))
      .groupBy(col("doc_id"))
      .agg(expr("bit_xor(h)").as("fp"))
      .orderBy(col("doc_id"))

  private val q26Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) tok,
      |         generate_subscripts(string_split(text, ' '), 1) pos FROM documents)
      |SELECT doc_id,
      |  bit_xor(('0x' || substr(md5(tok || ':' || CAST(pos AS VARCHAR)), 1, 15))::BIGINT) AS fp
      |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q40
  // TF-IDF top terms per document: tf per (doc, term) and df per term are
  // two aggregations. The df side is one row per distinct term — at 100 TB
  // that's billions of rows, so it must NOT be force-broadcast (a broadcast
  // hint ignores autoBroadcastJoinThreshold and OOMs the driver); the join
  // is a plain equi-join on term and AQE converts it to broadcast only when
  // the built side measures small. Corpus size N is a 1-row scalar aggregate
  // cross-joined in-plan (no second driver-side scan of the corpus).
  // idf = ln((N+1)/(df+1)) + 1 (smoothed); top-3 terms per doc by
  // (score desc, term) via a windowed rank.
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val docs = Fixtures.documents(s, dir)
    val nDf = docs.agg(count(lit(1)).as("corpus_n")) // 1 row, broadcast by AQE
    val tf = graft.Engine.widen(docs, col("doc_id")) // widen single-file scan (see Dedup.docShingles)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // broadcast(nDf) is always safe (a global agg is provably one row) and
    // pins the plan even with AQE off — unlike df_, which must stay unhinted
    val scored = tf.join(df_, "term").crossJoin(broadcast(nDf))
      .withColumn("score",
        col("tf") * (log((col("corpus_n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"),
        graft.functions.Rounding.stable(col("score"), 4).as("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private val q40Sql =
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents) t
      |  GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, term, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, term, floor(score * 10000.0 + 0.5) / 10000.0 AS score
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q41
  // Quality-percentile filtering: the end-to-end curation decision — score
  // every document, compute the per-language median, keep docs strictly
  // above it. The 4-dp-rounded score has ≤ 10 001 distinct values, so the
  // EXACT median comes from a value histogram: ONE scan of documents into
  // map-side-combinable (lang, quality) counts, then every downstream step
  // (cumulative ranks, median pick, keep-count) runs over the tiny
  // histogram. This replaces an earlier percentile()-based plan that
  // scanned + tokenized documents twice (median subtree and join probe
  // side) and ran the median as an interpreted sort-based aggregate — at
  // corpus scale the tokenizing scan dominates, so halving it matters.
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val enStops = stopwords.toMap.apply("en")
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(enStops: _*)))
    val score = graft.functions.Rounding.stable(
      lit(0.4) * (least(col("n_chars"), lit(500)) / lit(500.0)) +
        lit(0.3) * (stopCnt / nTok) +
        lit(0.3) * (least(col("n_chars") / nTok, lit(8.0)) / lit(8.0)), 4)
    val hist = Fixtures.documents(s, dir)
      .select(col("lang"), score.as("quality"))
      .groupBy(col("lang"), col("quality")).agg(count(lit(1)).as("cnt"))
    val W = org.apache.spark.sql.expressions.Window
    // 1-indexed middle ranks: lower = ⌊(n+1)/2⌋, upper = ⌊n/2⌋+1 (equal for
    // odd n). Value-at-rank r = first histogram row whose cumulative count
    // reaches r. Interpolation `v_l + (v_u − v_l) * 0.5` is DuckDB's
    // quantile_cont form (lo + delta*d), which is what the oracle hash
    // depends on. (Spark's percentile() interpolates as
    // (higher−pos)*lo + (pos−lower)*hi — up to 1 ulp different — but the
    // oracle is DuckDB, not percentile().)
    // Median ranks run over NON-NULL qualities only — quantile_cont ignores
    // NULLs, so a null-text/null-n_chars doc must not shift the ranks. This
    // is a CONDITIONAL sum, not a filter: a `hist.filter(isNotNull)` would be
    // pushed below hist's aggregate (quality is a grouping column), making
    // the two hist subtrees canonically different and killing the exchange
    // reuse that keeps the documents scan single-pass. Null rows sort first
    // (cum stays 0, never reaching rank ≥ 1) and their `quality` is null, so
    // min(when(...)) skips them either way. The unfiltered hist still feeds
    // the n_total join below, where such rows DO count (COUNT(*) semantics)
    // and fail the `quality > median` keep test.
    val nnCnt = when(col("quality").isNotNull, col("cnt")).otherwise(lit(0L))
    val cum = hist
      .withColumn("cum", sum(nnCnt).over(W.partitionBy("lang").orderBy("quality")))
      .withColumn("ntot", sum(nnCnt).over(W.partitionBy("lang")))
    val meds = cum.groupBy(col("lang"))
      .agg(min(when(col("cum") >= floor((col("ntot") + 1) / lit(2.0)),
             col("quality"))).as("v_l"),
           min(when(col("cum") >= floor(col("ntot") / lit(2.0)) + 1,
             col("quality"))).as("v_u"))
      .select(col("lang"),
        (col("v_l") + (col("v_u") - col("v_l")) * lit(0.5)).as("median_q"))
    // hist's shuffle exchange is shared with the window subtree above —
    // ReuseExchange keeps the documents scan single-pass (PlanSpec's
    // "q41 single scan" test pins exactly one documents FileScan).
    hist.join(broadcast(meds), "lang")
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_total"),
        sum(when(col("quality") > col("median_q"), col("cnt"))
          .otherwise(lit(0L))).as("n_kept"),
        graft.functions.Rounding.stable(max(col("median_q")), 4).as("median_q"))
      .orderBy(col("lang"))
  }

  private val q41Sql = {
    val enList = sqlList(stopwords.toMap.apply("en"))
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    floor((
       |      0.4 * (LEAST(n_chars, 500) / 500.0) +
       |      0.3 * (len(list_filter(string_split(text, ' '), t -> t IN $enList)) /
       |             len(string_split(text, ' '))) +
       |      0.3 * (LEAST(n_chars / len(string_split(text, ' ')), 8.0) / 8.0)) * 10000.0 + 0.5) / 10000.0 AS quality
       |  FROM documents),
       |medians AS (SELECT lang, quantile_cont(quality, 0.5) AS median_q FROM scored GROUP BY 1)
       |SELECT lang, COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN quality > median_q THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  floor(MAX(median_q) * 10000.0 + 0.5) / 10000.0 AS median_q
       |FROM scored JOIN medians USING (lang)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  // Unigram language-model quality score — the perplexity-style filter a
  // training-data pipeline runs after the heuristic ones (q24/q41): build a
  // unigram LM from the corpus itself (p(term) = count/total), score each
  // document by its mean log-probability. Two aggregations + one equi-join
  // on term (same scale shape as q40: the LM side must NOT be
  // force-broadcast; AQE decides). Cross-engine hashing works because each
  // log-prob is rounded to 9 dp and summed as DECIMAL — order-free.
  private def q51(s: SparkSession, dir: String): DataFrame = {
    // materialized once: feeds the total count, the LM aggregation AND the
    // scoring join (lineage would recompute the tokenize 3×)
    val toks = Fixtures.documents(s, dir)
      .transform(graft.Engine.widenIf(_, col("doc_id"))) // size-gated: light tokenize (see Engine.widenIf)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
      .localCheckpoint()
    val totals = toks.agg(count(lit(1)).as("t")) // 1 row, safe to pin
    val lm = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(totals))
      .select(col("term"),
        round(log(col("c").cast("double") / col("t")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("lp"))
    toks.join(lm, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        graft.functions.Rounding.stable(
          sum(col("lp")).cast("double") / count(lit(1)), 4).as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  private val q51Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tot AS (SELECT COUNT(*) AS t FROM toks),
      |lm AS (
      |  SELECT term, CAST(round(ln(CAST(COUNT(*) AS DOUBLE) / MAX(tot.t)), 9) AS DECIMAL(28,12)) AS lp
      |  FROM toks CROSS JOIN tot GROUP BY term)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  floor(CAST(SUM(lp) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_logp
      |FROM toks JOIN lm USING (term)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q55
  // Corpus-wide bigram counts, top 100 — n-gram statistics for tokenizer /
  // LM corpus prep. Bigrams are built with array ops (zip_with over shifted
  // slices) — a narrow map, no self-join; the only shuffle is the count
  // aggregation, with map-side partial agg. Top-100 is a
  // TakeOrderedAndProject, never a global sort.
  private def q55(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val n = size(toks)
    val bgs = zip_with(slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    Fixtures.documents(s, dir)
      .transform(graft.Engine.widenIf(_, col("doc_id"))) // size-gated: light bigram count (see Engine.widenIf)
      .select(explode(bgs).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bg"))
      .limit(100)
  }

  private val q55Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
      |bg AS (
      |  SELECT a.tok || ' ' || b.tok AS bg
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
      |SELECT bg, COUNT(*) AS n FROM bg GROUP BY bg
      |ORDER BY n DESC, bg LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q59
  // Benchmark decontamination check: which blocklist phrases appear in the
  // corpus, and in how many documents. The phrase list is tiny and
  // broadcast; the corpus is scanned ONCE with a narrow contains per
  // phrase. (Real decontamination at 100 TB hashes benchmark n-grams and
  // equi-joins against document shingles — the q17 machinery; this is the
  // exact small-list form.)
  private val contamPhrases = Seq(
    "the quick brown", "lorem ipsum", "correct horse battery",
    "the the", "data data")
  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val phrases = contamPhrases.toDF("phrase")
    Fixtures.documents(s, dir)
      .crossJoin(broadcast(phrases))
      .groupBy(col("phrase"))
      .agg(sum(when(expr("instr(text, phrase) > 0"), 1).otherwise(0))
        .cast("long").as("n_docs"))
      .orderBy(col("phrase"))
  }

  private val q59Sql = {
    val lst = contamPhrases.map(p => s"'$p'").mkString(", ")
    s"""SELECT phrase,
       |  CAST(SUM(CASE WHEN strpos(text, phrase) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
       |FROM documents CROSS JOIN (SELECT unnest([$lst]) AS phrase) p
       |GROUP BY phrase ORDER BY phrase""".stripMargin
  }

  // ---------------------------------------------------------------- q75
  // Bigram conditional log-probability scoring — the KenLM-style perplexity
  // filter (CCNet's quality signal) one order up from q51's unigram LM:
  // score each document by mean ln P(wᵢ | wᵢ₋₁) with Laplace smoothing,
  // P(w|prev) = (c(prev,w) + 1) / (c(prev,·) + V), from corpus-derived
  // counts. Scale shape: bigrams built with array ops (no self-join), two
  // count shuffles + the scoring equi-join on the bigram; only the 1-row
  // vocabulary size is pinned broadcast — the LM table is unbounded and
  // stays AQE-decided (same contract as q40/q51). Per-bigram log-probs are
  // rounded to 9 dp and summed as DECIMAL — order-free, hash-checked.
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val DEC = org.apache.spark.sql.types.DecimalType(28, 12)
    val toksArr = wsTokens(col("text"))
    val n = size(toksArr)
    val bgs = zip_with(slice(toksArr, lit(1), greatest(n - 1, lit(0))),
      slice(toksArr, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    // materialized once: feeds the bigram LM AND the scoring join
    val docsB = Fixtures.documents(s, dir)
      .transform(graft.Engine.widen(_, col("doc_id")))
      .select(col("doc_id"), explode(bgs).as("bg"))
      .localCheckpoint()
    val vocab = Fixtures.documents(s, dir)
      .select(explode(wsTokens(col("text"))).as("term"))
      .agg(countDistinct(col("term")).as("v")) // 1 row, safe to pin
    val bc = docsB.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      .withColumn("prev", substring_index(col("bg"), " ", 1))
    val pc = bc.groupBy(col("prev")).agg(sum(col("cb")).as("cp"))
    val lm = bc.join(pc, "prev").crossJoin(broadcast(vocab))
      .select(col("bg"),
        round(log((col("cb") + 1).cast("double") / (col("cp") + col("v"))), 9)
          .cast(DEC).as("lp"))
    docsB.join(lm, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.functions.Rounding.stable(
          sum(col("lp")).cast("double") / count(lit(1)), 4).as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  private val q75Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
      |v AS (SELECT COUNT(DISTINCT term) AS v FROM toks),
      |bg AS (SELECT a.doc_id, a.term || ' ' || b.term AS bg
      |       FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |bc AS (SELECT bg, COUNT(*) AS cb FROM bg GROUP BY 1),
      |pc AS (SELECT split_part(bg, ' ', 1) AS prev, SUM(cb) AS cp FROM bc GROUP BY 1),
      |lm AS (
      |  SELECT bc.bg,
      |    CAST(round(ln(CAST(cb + 1 AS DOUBLE) / (pc.cp + v.v)), 9) AS DECIMAL(28,12)) AS lp
      |  FROM bc JOIN pc ON split_part(bc.bg, ' ', 1) = pc.prev CROSS JOIN v)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  floor(CAST(SUM(lp) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_logp
      |FROM bg JOIN lm USING (bg)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q81
  // Blocklist-term redaction — the PII/sensitive-string scrub stage of a
  // training-data pipeline (emails, phone numbers, credential-shaped
  // strings; this corpus has none, so the blocklist is term-based — the
  // regex machinery is identical). Pure narrow map: regexp_count for the
  // audit count, regexp_replace + fingerprint for the redacted artifact.
  // The pattern stays in the RE2 ∩ java.util.regex common dialect
  // (alternation, \b word boundaries) so both engines match identically.
  private val redactPattern = "\\b(customer|spark|vector)\\b"
  private def q81(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(redactPattern)).cast("long").as("n_redacted"),
        substring(md5(regexp_replace(col("text"), redactPattern, "<TERM>")), 1, 12)
          .as("redacted_sig"))
      .filter(col("n_redacted") > 0)
      .orderBy(col("doc_id"))

  // NB: DuckDB string literals are standard-conforming (no backslash
  // escapes), so the Scala-level pattern interpolates verbatim — `\b`
  // must arrive at RE2 as a single backslash + b.
  private val q81Sql =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$redactPattern')) AS BIGINT) AS n_redacted,
       |  substr(md5(regexp_replace(text, '$redactPattern', '<TERM>', 'g')), 1, 12)
       |    AS redacted_sig
       |FROM documents
       |WHERE len(regexp_extract_all(text, '$redactPattern')) > 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q109
  // BM25 top-k retrieval (Robertson's probabilistic idf in the always-
  // positive Lucene shape, k1=1.2 b=0.75) for a fixed query-term set — the
  // retrieval primitive behind decontamination-by-retrieval and targeted
  // corpus mining. Scale shape: ALL corpus statistics (N, Σdl, per-term
  // document frequencies) collapse into ONE 1-row conditional-sum aggregate
  // — no per-term corpus scan, no explode, no posting-list join for a fixed
  // query; the row is broadcast and scoring is a narrow map over codegen'd
  // array built-ins; top-20 plans as TakeOrderedAndProject, never a global
  // sort. Determinism: idf is round(ln(·),9) (q51's ln-parity discipline);
  // every other op is a correctly-rounded IEEE div/mul on identical inputs,
  // so scores are bit-identical cross-engine before the 6-dp output round.
  private val bm25Terms = Seq("table", "hash", "window")
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val docs = Fixtures.documents(s, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val statCols =
      count(lit(1)).as("nd") +: sum(size(col("toks"))).as("nt") +:
        bm25Terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val scored = docs.crossJoin(broadcast(stats))
      .withColumn("dl", size(col("toks")).cast("double"))
      .withColumn("avgdl", col("nt").cast("double") / col("nd"))
      .withColumn("norm",
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
    def tf(t: String): Column =
      size(filter(col("toks"), x => x === lit(t))).cast("double")
    def idf(i: Int): Column =
      round(log((col("nd").cast("double") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)) + lit(1.0)), 9)
    val score = bm25Terms.zipWithIndex.map { case (t, i) =>
      idf(i) * ((tf(t) * lit(2.2)) / (tf(t) + col("norm")))
    }.reduceLeft(_ + _)
    scored
      .select(col("doc_id"), graft.functions.Rounding.stable(score, 6).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  private val q109Sql = {
    val dfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(",\n      |  ")
    val tfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf_$i"
    }.mkString(",\n      |  ")
    val idfCols = bm25Terms.indices.map { i =>
      s"round(ln((CAST(nd AS DOUBLE) - df_$i + 0.5) / (df_$i + 0.5) + 1.0), 9) AS idf_$i"
    }.mkString(",\n      |  ")
    val scoreExpr = bm25Terms.indices.map { i =>
      s"idf_$i * ((tf_$i * 2.2) / (tf_$i + norm))"
    }.mkString(" + ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |st AS (SELECT COUNT(*) AS nd, SUM(len(toks)) AS nt,
      |  $dfCols
      |  FROM d),
      |sc AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
      |  $tfCols
      |  FROM d),
      |x AS (SELECT doc_id, dl, tf_0, tf_1, tf_2,
      |  1.2 * (0.25 + 0.75 * (dl / (CAST(nt AS DOUBLE) / nd))) AS norm,
      |  $idfCols
      |  FROM sc CROSS JOIN st),
      |z AS (SELECT doc_id,
      |  floor(($scoreExpr) * 1000000.0 + 0.5) / 1000000.0 AS score FROM x)
      |SELECT doc_id, score FROM z WHERE score > 0.0
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- q111
  // Hashed-feature linear quality classifier — the fastText/CCNet-shape
  // model-based filter that follows the heuristic (q24/q41) and LM (q51/
  // q75) stages: each token hashes into one of 1024 feature buckets, each
  // bucket carries a fixed weight (both md5-derived, so the "model" is
  // deterministic and the oracle re-derives it arithmetically — a trained
  // model would arrive as a broadcast weight table with identical plan
  // shape), and a document's score is the mean bucket weight plus a bias;
  // sign decides keep/drop. Pure narrow map — per-token hashing stays
  // inside array HOFs over codegen'd built-ins, no explode, no join, no
  // shuffle before the final ORDER BY. Per-token weights are rounded to
  // 9 dp and folded as DECIMAL — order-free, hash-checked.
  /** The q111 classifier score z as a column over `text` — shared with the
    * q113 sampler (which uses z as its keep-probability signal).
    */
  /** The 1024-entry bucket→weight table, derived once on the driver (the
    * "model": weight(b) = (int(md5("w:" ++ b)[0:4], 16) % 2001 - 1000) /
    * 1000, identical to what the oracle SQL re-derives per row). Shipping
    * it as a literal array + `element_at` halves the per-token hashing on
    * the hottest scan vs re-computing the second md5 for every token — at
    * corpus scale the md5s dominate this operator's CPU bill.
    */
  private lazy val classifierWeights: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(1024) { b =>
      val h = md.digest(s"w:$b".getBytes("UTF-8"))
      val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff) // first 4 hex chars
      (v % 2001 - 1000) / 1000.0
    }
  }

  private def classifierZ: Column = {
    val DEC = org.apache.spark.sql.types.DecimalType(28, 12)
    def bucket(t: Column): Column =
      conv(substring(md5(concat(lit("feat:"), t)), 1, 4), 16, 10).cast("int") % 1024
    val lut = typedlit(classifierWeights.toSeq)
    val toks = wsTokens(col("text"))
    val wts = transform(toks, t =>
      round(element_at(lut, bucket(t) + 1), 9).cast(DEC))
    val sumw = aggregate(wts, lit(0).cast(DEC), (acc, v) => (acc + v).cast(DEC))
    lit(-0.01) + sumw.cast("double") / size(toks)
  }

  private def q111(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val z = classifierZ
    // widen: the classifier's per-doc tokenize/feature projection is the
    // CPU-dense stage and the single-split scan leaves it one task
    // (Engine.widen; QueryProbe r14 measured 0.9 s of 1.1 s single-task)
    graft.Engine.widen(Fixtures.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        graft.functions.Rounding.stable(z, 6).as("z"),
        when(z >= lit(0.0), 1).otherwise(0).as("pass"))
      .orderBy(col("doc_id"))
  }

  private val q111Sql =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |f AS (SELECT doc_id,
      |  ('0x' || substr(md5('feat:' || term), 1, 4))::INT % 1024 AS b FROM t),
      |w AS (SELECT doc_id,
      |  CAST(round(CAST(('0x' || substr(md5('w:' || b), 1, 4))::INT % 2001 - 1000 AS DOUBLE)
      |    / 1000.0, 9) AS DECIMAL(28,12)) AS wt FROM f),
      |zr AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |  -0.01 + CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS zraw FROM w GROUP BY doc_id)
      |SELECT doc_id, n_tokens, floor(zraw * 1000000.0 + 0.5) / 1000000.0 AS z,
      |  CASE WHEN zraw >= 0.0 THEN 1 ELSE 0 END AS pass
      |FROM zr ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q113
  // Quality-weighted sampling — the model-scored importance-sampling stage
  // (CCNet/DataComp shape): instead of a hard keep/drop at z ≥ 0 (q111),
  // each document survives with probability p derived from its classifier
  // score, so borderline text is downsampled rather than discarded and the
  // corpus quality distribution shifts without a cliff. p is a clamped
  // linear link (p = clamp[0.05,0.95](0.5 + 5z) — transcendental-free, so
  // both engines compute bit-identical doubles), and the coin is the
  // deterministic md5 uniform u = hash32("samp:"+doc_id)/2³² — reproducible
  // across runs and engines, stable under corpus growth (same contract as
  // the q64/q67 hash splits). Pure narrow map + tiny per-(lang,source)
  // aggregate; keep decision and p are re-derived arithmetically by the
  // oracle.
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val DEC = org.apache.spark.sql.types.DecimalType(28, 12)
    val p = greatest(lit(0.05), least(lit(0.95), lit(0.5) + lit(5.0) * classifierZ))
    val u = conv(substring(md5(concat(lit("samp:"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long") / lit(4294967296.0)
    Fixtures.documents(s, dir)
      .select(col("lang"), col("source"), p.as("p"), u.as("u"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("u") < col("p"), 1L).otherwise(0L)).as("n_kept"),
        graft.functions.Rounding.stable(
          sum(round(col("p"), 9).cast(DEC)).cast("double") / count(lit(1)), 6)
          .as("avg_p"))
      .orderBy(col("lang"), col("source"))
  }

  private val q113Sql =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |f AS (SELECT doc_id,
      |  ('0x' || substr(md5('feat:' || term), 1, 4))::INT % 1024 AS b FROM t),
      |w AS (SELECT doc_id,
      |  CAST(round(CAST(('0x' || substr(md5('w:' || b), 1, 4))::INT % 2001 - 1000 AS DOUBLE)
      |    / 1000.0, 9) AS DECIMAL(28,12)) AS wt FROM f),
      |zr AS (SELECT doc_id,
      |  -0.01 + CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS zraw FROM w GROUP BY doc_id),
      |pr AS (SELECT doc_id,
      |  greatest(0.05, least(0.95, 0.5 + 5.0 * zraw)) AS p,
      |  ('0x' || substr(md5('samp:' || doc_id), 1, 8))::BIGINT / 4294967296.0 AS u
      |  FROM zr)
      |SELECT d.lang, d.source, COUNT(*) AS n,
      |  SUM(CASE WHEN pr.u < pr.p THEN 1 ELSE 0 END)::BIGINT AS n_kept,
      |  floor((CAST(SUM(CAST(round(pr.p, 9) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*))
      |    * 1000000.0 + 0.5) / 1000000.0 AS avg_p
      |FROM documents d JOIN pr USING (doc_id)
      |GROUP BY d.lang, d.source ORDER BY d.lang, d.source""".stripMargin

  // ---------------------------------------------------------------- q132
  // DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
  // Language Models via Importance Resampling"): score every pool document
  // by how much more likely its tokens are under a TARGET-domain unigram LM
  // than under the pool LM, then keep probabilistically by that ratio —
  // the principled replacement for hard domain filters when assembling a
  // pretraining mixture around a seed corpus. Target domain here = the
  // `src0` documents (declared); both LMs are Laplace-smoothed unigram
  // models (the q51/q75 family).
  //
  // Determinism: per-token log-ratios are computed once per DISTINCT token
  // and floor-scaled to 1e-6 BIGINT units, so the per-doc score is an
  // exact integer SUM (order-free); the only doubles are |vocab| ln()
  // calls shared verbatim with the oracle (the q122 PMI risk class). The
  // keep rule is the q113 contract: clamped LINEAR probability
  // p = clamp[0.05,0.95]((lr + A) / 2A) — transcendental-free — against
  // the deterministic md5 coin u = hash32("dsir:"+doc_id)/2³².
  //
  // Scale shape: ONE per-(doc, token) aggregate off the corpus (persisted;
  // doc-bounded), token LMs and totals fold FROM it (map-side combinable,
  // vocab-sized + 1-row broadcasts), scores come back via a broadcast LUT
  // join — the corpus is touched once, exactly the q131 posture.
  private val DsirTarget = "src0"
  private val DsirScale = 20000000L // A: linear link saturates at |lr| = 20

  private def q132(s: SparkSession, dir: String): DataFrame = {
    // widen the single-split scan: tokenize + explode + the per-(doc,tok)
    // partial agg all fuse into the scan's map stage, which otherwise runs
    // one task (r15 QueryProbe: 0.32 s single-task, the query's largest
    // job) — same shape as q40's tf base (Engine.widen)
    val dt = graft.Engine.widen(Fixtures.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), col("source"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .persist() // read twice: LM induction + per-doc scoring
    val lm = dt.groupBy(col("tok"))
      .agg(sum(col("n")).as("c_pool"),
        sum(when(col("source") === DsirTarget, col("n")).otherwise(0L)).as("c_tgt"))
    val totals = lm.agg(sum(col("c_pool")).as("n_pool"), sum(col("c_tgt")).as("n_tgt"),
      count(lit(1)).as("v"))
    val lut = lm.crossJoin(broadcast(totals))
      .select(col("tok"), floor(
        (log((col("c_tgt") + 1).cast("double") / (col("n_tgt") + col("v")))
          - log((col("c_pool") + 1).cast("double") / (col("n_pool") + col("v"))))
          * 1e6 + 0.5).cast("long").as("s6"))
    val perDoc = dt.join(broadcast(lut), Seq("tok"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n")).as("n_tok"), sum(col("s6") * col("n")).as("lr"))
    val p = greatest(lit(0.05), least(lit(0.95),
      (col("lr") + DsirScale).cast("double") / (2.0 * DsirScale)))
    val u = conv(substring(md5(concat(lit("dsir:"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long") / lit(4294967296.0)
    perDoc.select(col("doc_id"), col("source"), col("n_tok"), col("lr"),
      (u < p).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val q132Sql =
    s"""WITH dt AS (
       |  SELECT doc_id, source, tok, COUNT(*) AS n FROM (
       |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2, 3),
       |lm AS (
       |  SELECT tok, SUM(n) AS c_pool,
       |    SUM(CASE WHEN source = '$DsirTarget' THEN n ELSE 0 END) AS c_tgt
       |  FROM dt GROUP BY 1),
       |tot AS (SELECT SUM(c_pool) AS n_pool, SUM(c_tgt) AS n_tgt, COUNT(*) AS v FROM lm),
       |lut AS (
       |  SELECT tok, CAST(floor(
       |    (ln(CAST(c_tgt + 1 AS DOUBLE) / (n_tgt + v))
       |     - ln(CAST(c_pool + 1 AS DOUBLE) / (n_pool + v))) * 1e6 + 0.5) AS BIGINT) AS s6
       |  FROM lm CROSS JOIN tot),
       |pd AS (
       |  SELECT dt.doc_id, dt.source,
       |    CAST(SUM(dt.n) AS BIGINT) AS n_tok,
       |    CAST(SUM(lut.s6 * dt.n) AS BIGINT) AS lr
       |  FROM dt JOIN lut USING (tok) GROUP BY 1, 2)
       |SELECT doc_id, source, n_tok, lr,
       |  (('0x' || substr(md5('dsir:' || doc_id), 1, 8))::BIGINT / 4294967296.0)
       |    < greatest(0.05, least(0.95, CAST(lr + $DsirScale AS DOUBLE) / ${2 * DsirScale}.0)) AS keep
       |FROM pd ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q134
  // Efraimidis–Spirakis weighted reservoir sampling (A-Res, 2006): an
  // EXACT-k sample where inclusion probability scales with document weight
  // (here token count — the "sample by contribution to the token budget"
  // rule). Each item draws priority u^(1/w) and the k largest win; ordering
  // by ln(u)/w is monotone-equivalent and needs one transcendental. This is
  // THE one-pass distributed weighted sampler: no global sort, no second
  // scan, mergeable top-k — where q113's Bernoulli keep gives a RANDOM
  // sample size and q85's per-stratum k ignores weights.
  //
  // Determinism: u is the md5 coin (h+1)/2³² ∈ (0,1] (the q64/q113
  // contract), priorities are floor-rounded to 9 dp and the ORDER applies
  // to the rounded value with doc_id tiebreak, so both engines rank
  // identically (the q122 rounded-order pattern; ln ulp drift is the
  // accepted q122/q132 risk class).
  //
  // Scale shape: one narrow scan → TakeOrderedAndProject (per-partition
  // top-k, merged at the driver); nothing shuffles but k rows.
  private[graft] val ResK = 50

  /** The A-Res priority projection `(doc_id, n_tok, pri)` — shared verbatim
    * by q134 and the streaming cross-batch reservoir (top-k is a mergeable
    * monoid, so streaming state that keeps the k best priorities seen so
    * far converges to exactly this batch answer).
    */
  private[graft] def reservoirScores(docs: DataFrame): DataFrame = {
    val u = (conv(substring(md5(concat(lit("esam:"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long") + 1L) / lit(4294967296.0)
    docs.select(col("doc_id"), size(wsTokens(col("text"))).cast("long").as("n_tok"),
      graft.functions.Rounding.stable(log(u) / size(wsTokens(col("text"))), 9).as("pri"))
  }

  private def q134(s: SparkSession, dir: String): DataFrame =
    reservoirScores(Fixtures.documents(s, dir))
      .orderBy(col("pri").desc, col("doc_id"))
      .limit(ResK)

  private val q134Sql =
    s"""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |  floor(ln((('0x' || substr(md5('esam:' || doc_id), 1, 8))::BIGINT + 1) / 4294967296.0)
       |        / len(string_split(text, ' ')) * 1000000000.0 + 0.5) / 1000000000.0 AS pri
       |FROM documents
       |ORDER BY pri DESC, doc_id LIMIT $ResK""".stripMargin

  // ---------------------------------------------------------------- q138
  // Per-document token entropy — the information-density quality signal
  // (Shannon entropy of the doc's own unigram distribution): low-entropy
  // documents are repetitive boilerplate/keyword-stuffing that the q66
  // repetition RULES only catch for their specific patterns, and high
  // entropy on a short doc flags hash-like noise. H = ln(n) − (Σ c·ln c)/n
  // over per-doc token counts c.
  //
  // Determinism: ln(c) is evaluated once per DISTINCT count value via a
  // broadcast LUT of floor-scaled 1e-6 integers (count values are tiny —
  // bounded by the longest document — so the LUT is O(max doc len) rows),
  // making the per-doc Σ c·s6 an exact BIGINT sum; only the final
  // ln(n) − S/(n·10⁶) is a double, 6-dp floor-rounded (the q132 risk
  // class). One per-(doc, token) aggregate touches the corpus; everything
  // after is doc-keyed.
  /** Per-doc `(doc_id, n_tok, n_unique, h)` — the q138 entropy chain,
    * shared with the q139 curation funnel.
    */
  private[graft] def entropyPerDoc(docs: DataFrame): DataFrame = {
    val dt = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val lut = dt.select(col("c")).distinct()
      .select(col("c"), floor(log(col("c").cast("double")) * 1e6 + 0.5)
        .cast("long").as("s6"))
    dt.join(broadcast(lut), Seq("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("n_unique"),
        sum(col("c") * col("s6")).as("slog"))
      .select(col("doc_id"), col("n_tok"), col("n_unique"),
        graft.functions.Rounding.stable(
          log(col("n_tok").cast("double"))
            - col("slog").cast("double") / (col("n_tok") * 1000000.0), 6).as("h"))
  }

  private def q138(s: SparkSession, dir: String): DataFrame =
    entropyPerDoc(Fixtures.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Oracle CTE producing `ent(doc_id, n_tok, n_unique, h)` — shared with
    * the q139 funnel's oracle.
    */
  private[graft] val entropyCte =
    """dt AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |lut AS (
      |  SELECT c, CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS s6
      |  FROM (SELECT DISTINCT c FROM dt)),
      |ent AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
      |    CAST(COUNT(*) AS BIGINT) AS n_unique,
      |    floor((ln(CAST(SUM(c) AS DOUBLE))
      |           - CAST(SUM(c * s6) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) * 1000000.0))
      |          * 1000000.0 + 0.5) / 1000000.0 AS h
      |  FROM dt JOIN lut USING (c) GROUP BY 1)""".stripMargin

  private val q138Sql =
    s"""WITH $entropyCte
       |SELECT doc_id, n_tok, n_unique, h FROM ent ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q115
  // Mixed-language detection — chunk-level langid disagreement: documents
  // whose 32-token chunks do not all predict the same language (code-mixed
  // pages, concatenated crawls, template/content mixes — standard drop or
  // route-to-lang-split candidates in corpus curation). Runs the q23
  // stopword-argmax heuristic per CHUNK, then aggregates disagreement per
  // document: distinct predicted langs and the plurality fraction.
  //
  // Scale shape: explode → three aggregations, all keyed by doc_id (the
  // first shuffle co-locates a document; the rest are partition-local
  // under AQE) — same class as q66's repetition signals. No UDFs; the
  // argmax is the shared q23 CASE chain.
  private val ChunkLangTokens = 32
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val words = Fixtures.documents(s, dir)
      .transform(graft.Engine.widenIf(_, col("doc_id"))) // size-gated: light stopword sums (see Engine.widenIf)
      .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "term")))
    val aggs = stopwords.map { case (l, ws) =>
      sum(when(col("term").isin(ws: _*), 1).otherwise(0)).as(s"s_$l")
    }
    val scored = words
      .select(col("doc_id"),
        floor(col("pos") / ChunkLangTokens).cast("int").as("chunk"), col("term"))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(aggs.head, aggs.tail: _*)
    val perPred = scored.select(col("doc_id"), predFromScores.as("pred"))
      .groupBy(col("doc_id"), col("pred")).agg(count(lit(1)).as("c"))
    perPred.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chunks"), count(lit(1)).as("n_langs"),
        max(col("c")).as("mx"))
      .filter(col("n_langs") > 1)
      .select(col("doc_id"), col("n_chunks"), col("n_langs"),
        graft.functions.Rounding.stable(
          col("mx").cast("double") / col("n_chunks"), 6).as("plurality_frac"))
      .orderBy(col("doc_id"))
  }

  private val q115Sql = {
    val scoreExprs = stopwords.map { case (lang, ws) =>
      s"SUM(CASE WHEN term IN ${sqlList(ws)} THEN 1 ELSE 0 END) AS s_$lang"
    }.mkString(",\n      |    ")
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
      |scored AS (
      |  SELECT doc_id, (pos - 1) // $ChunkLangTokens AS chunk,
      |    $scoreExprs
      |  FROM toks GROUP BY 1, 2),
      |pred AS (SELECT doc_id, $predFromScoresSql AS pred FROM scored),
      |pp AS (SELECT doc_id, pred, COUNT(*) AS c FROM pred GROUP BY 1, 2),
      |agg AS (SELECT doc_id, SUM(c)::BIGINT AS n_chunks, COUNT(*) AS n_langs, MAX(c) AS mx
      |        FROM pp GROUP BY 1)
      |SELECT doc_id, n_chunks, n_langs,
      |  floor((CAST(mx AS DOUBLE) / n_chunks) * 1000000.0 + 0.5) / 1000000.0 AS plurality_frac
      |FROM agg WHERE n_langs > 1 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q116
  // Tokenizer fertility by language — subword tokens per whitespace word
  // (the standard tokenizer-quality metric: high fertility = the vocabulary
  // fragments that language, inflating sequence length and training cost).
  // Uses the BPE-ish regex token count over the exact-integer-sum ÷ count
  // pattern (q16's discipline). One scan, one tiny-key aggregate.
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val subw = bpeishCount(col("text")).cast("long")
    val words = size(wsTokens(col("text"))).cast("long")
    Fixtures.documents(s, dir)
      .select(col("lang"), subw.as("subw"), words.as("words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("subw")).as("n_subword"),
        sum(col("words")).as("n_words"),
        graft.functions.Rounding.stable(
          sum(col("subw")).cast("double") / sum(col("words")), 6).as("fertility"))
      .orderBy(col("lang"))
  }

  private val q116Sql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  SUM(CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT))::BIGINT AS n_subword,
      |  SUM(CAST(len(string_split(text, ' ')) AS BIGINT))::BIGINT AS n_words,
      |  floor((CAST(SUM(CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)) AS DOUBLE)
      |    / SUM(CAST(len(string_split(text, ' ')) AS BIGINT))) * 1000000.0 + 0.5) / 1000000.0
      |    AS fertility
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q120
  // Cross-source vocabulary overlap — pairwise Jaccard between each source's
  // distinct-token vocabulary. The corpus-diversity diagnostic run before
  // setting mixture weights (a pair of sources with near-1 vocabulary
  // Jaccard is redundant mass; near-0 is genuinely new distribution).
  //
  // Shape: distinct (source, token) pairs, then a token self-join restricted
  // to s1 < s2. Fan-out per token is bounded by |sources|² (a token present
  // everywhere yields C(20,2)=190 pairs), NOT by corpus size — so the join
  // output is |vocab|·O(|sources|²) regardless of document volume. At very
  // large source counts you would MinHash each source's vocabulary instead
  // (exactly q17's signature machinery applied per-source); this exact form
  // is the oracle-able diagnostic for catalog-scale source counts (10s-100s).
  // Intersection/union are exact BIGINTs; Jaccard is the one derived double,
  // floor-rounded at 6 dp in both engines.
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val toks = Fixtures.documents(s, dir)
      .select(col("source"), explode(wsTokens(col("text"))).as("tok"))
      .distinct()
    val sizes = toks.groupBy("source").agg(count(lit(1)).as("vsz"))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("source").as("s1"), col("vsz").as("v1")), "s1")
      .join(sizes.select(col("source").as("s2"), col("vsz").as("v2")), "s2")
      .select(col("s1"), col("s2"), col("inter"),
        (col("v1") + col("v2") - col("inter")).as("uni"),
        graft.functions.Rounding.stable(
          col("inter").cast("double") / (col("v1") + col("v2") - col("inter")), 6)
          .as("jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  private val q120Sql =
    """WITH toks AS (
      |  SELECT DISTINCT source, tok FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS vsz FROM toks GROUP BY source),
      |inter AS (
      |  SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS inter
      |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.s1, i.s2, i.inter,
      |  CAST(v1.vsz + v2.vsz - i.inter AS BIGINT) AS uni,
      |  floor((CAST(i.inter AS DOUBLE) / (v1.vsz + v2.vsz - i.inter)) * 1000000.0 + 0.5)
      |    / 1000000.0 AS jaccard
      |FROM inter i
      |JOIN sizes v1 ON v1.source = i.s1
      |JOIN sizes v2 ON v2.source = i.s2
      |ORDER BY i.s1, i.s2""".stripMargin

  // ---------------------------------------------------------------- q122
  // PMI collocation extraction — pointwise mutual information over adjacent
  // word pairs, top-20. The standard vocabulary-induction signal for
  // multi-word expressions ("hong kong"-style units a tokenizer should not
  // split); q55's bigram machinery plus unigram margins and a log-ratio
  // score. pmi = ln(c_xy/N_bi) − ln(c_x/N_uni) − ln(c_y/N_uni), min support
  // 5 so noise pairs can't top the list.
  //
  // Shape: bigrams/unigrams are narrow maps (zip_with over shifted slices —
  // no self-join); two margin equi-joins are vocab-sized, totals ride 1-row
  // broadcasts; top-20 on the ROUNDED score with a lexicographic tiebreak
  // is a TakeOrderedAndProject and deterministic in both engines.
  private def q122(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val n = size(toks)
    val bgs = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val docs = Fixtures.documents(s, dir)
      .transform(graft.Engine.widenIf(_, col("doc_id"))) // size-gated: light bigram/unigram counts (see Engine.widenIf)
    val bi = docs.select(explode(bgs).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val uni = docs.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nBi = bi.agg(sum(col("c_xy")).as("n_bi"))
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    bi.filter(col("c_xy") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(nBi)).crossJoin(broadcast(nUni))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        graft.functions.Rounding.stable(
          log(col("c_xy").cast("double") / col("n_bi"))
            - log(col("c_x").cast("double") / col("n_uni"))
            - log(col("c_y").cast("double") / col("n_uni")), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  private val q122Sql =
    """WITH bi AS (
      |  SELECT b[1] AS w1, b[2] AS w2, CAST(count(*) AS BIGINT) AS c_xy FROM (
      |    SELECT unnest(list_zip(
      |      list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 1),
      |      list_slice(string_split(text, ' '), 2, len(string_split(text, ' '))))) AS b
      |    FROM documents)
      |  GROUP BY 1, 2),
      |uni AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1),
      |nb AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_bi FROM bi),
      |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni)
      |SELECT b.w1, b.w2, b.c_xy, u1.c AS c_x, u2.c AS c_y,
      |  floor((ln(CAST(b.c_xy AS DOUBLE) / n_bi)
      |       - ln(CAST(u1.c AS DOUBLE) / n_uni)
      |       - ln(CAST(u2.c AS DOUBLE) / n_uni)) * 1000000.0 + 0.5) / 1000000.0 AS pmi
      |FROM bi b
      |JOIN uni u1 ON u1.w = b.w1
      |JOIN uni u2 ON u2.w = b.w2
      |CROSS JOIN nb CROSS JOIN nu
      |WHERE b.c_xy >= 5
      |ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q131
  // Tokenizer OOV rate per source against a frequency-induced vocabulary:
  // vocab = the top-V tokens of the GLOBAL occurrence histogram (count
  // desc, token asc — a total order, so the cut is deterministic in both
  // engines); per source, the fraction of token OCCURRENCES falling outside
  // it. The coverage complement to q116 (fertility says how finely a
  // tokenizer splits; OOV says what its vocab misses per source) and to
  // q120 (set-level vocabulary jaccard, occurrence-blind).
  //
  // Shape: ONE token-scale aggregate — per-(source, token) counts, persisted
  // vocab-sized (|sources|·|vocab|-bounded); the global histogram and top-V
  // cut fold FROM that aggregate (map-side combinable, no second corpus
  // scan), and the vocab is a broadcast left join. At 100 TB the corpus is
  // touched once and everything after is catalog-sized.
  private val OovVocab = 20

  private def q131(s: SparkSession, dir: String): DataFrame = {
    val perSrcTok = Fixtures.documents(s, dir)
      .select(col("source"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      .persist() // read twice (vocab induction + per-source rollup); tiny —
                 // bounded by |sources| × |vocabulary|
    val vocab = perSrcTok.groupBy(col("tok")).agg(sum(col("n")).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(OovVocab)
      .select(col("tok"), lit(1).as("in_v"))
    perSrcTok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("in_v").isNull, col("n")).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        graft.functions.Rounding.stable(col("n_oov") / col("n_tokens"), 4).as("oov_rate"))
      .orderBy(col("source"))
  }

  private val q131Sql =
    s"""WITH st AS (
       |  SELECT source, tok, COUNT(*) AS n FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |v AS (
       |  SELECT tok FROM (
       |    SELECT tok, SUM(n) AS c FROM st GROUP BY 1
       |    ORDER BY c DESC, tok ASC LIMIT $OovVocab))
       |SELECT st.source,
       |  CAST(SUM(st.n) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN v.tok IS NULL THEN st.n ELSE 0 END) AS BIGINT) AS n_oov,
       |  floor(SUM(CASE WHEN v.tok IS NULL THEN st.n ELSE 0 END) * 1.0
       |        / SUM(st.n) * 10000.0 + 0.5) / 10000.0 AS oov_rate
       |FROM st LEFT JOIN v ON v.tok = st.tok
       |GROUP BY 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q143
  // Corpus n-gram diversity per source — the type-token ratio at unigram
  // and trigram granularity (distinct grams / total gram occurrences).
  // This is the corpus-LEVEL repetition audit behind modern curation
  // recipes: a source whose trigram TTR collapses is template/boilerplate
  // farmland even when per-document signals (q66 rules, q138 entropy)
  // look healthy, and the number is what a dedup pass is expected to RAISE
  // — the before/after gauge for q102/q14-style interventions.
  //
  // Scale shape: reads the shared tokenized base (SignalStore); totals are
  // one narrow map-side-combinable aggregate; each distinct-gram count is
  // one linear (source, 8-byte xxhash64 gram-key) distinct shuffle — the
  // windowFps profile at width 1 and 3, never a string-keyed shuffle.
  // Distinct counts ride the hash, so a collision would undercount by one
  // (≈n²/2⁶⁵ — the q102 accepted-risk class, here visible in an output
  // count; the oracle counts raw grams and agrees unless a hash collides).
  /** Shared q143 body: everything but the distinct-count strategy — the
    * exact and approx twins differ ONLY in how a `(source, g)` gram frame
    * folds to a per-source count, so a change to the gram shape, rounding,
    * or join structure cannot drift between them.
    */
  private def diversity(s: SparkSession, dir: String,
      distinctCount: (DataFrame, String) => DataFrame): DataFrame = {
    val base = SignalStore.tokens(s, dir).select(col("source"), col("toks"))
    val tot = base.groupBy(col("source"))
      .agg(sum(size(col("toks"))).cast("long").as("n_tok"),
        sum(greatest(size(col("toks")) - 2, lit(0))).cast("long").as("n_tri_total"))
    val uniG = base.select(col("source"), explode(col("toks")).as("t"))
      .select(col("source"), xxhash64(col("t")).as("g"))
    val triG = base.filter(size(col("toks")) >= 3)
      .select(col("source"), explode(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => xxhash64(slice(col("toks"), i + 1, lit(3))))).as("g"))
    // LEFT joins + zero-fill: a source whose docs are all shorter than 3
    // tokens has no trigram rows (and an all-empty-token source no unigram
    // rows) — an inner join would silently omit exactly the degenerate
    // sources a diversity audit most needs to show (the no-silent-caps
    // stance). Zero-denominator TTRs are NULL, mirrored in the oracle.
    tot.join(distinctCount(uniG, "n_uni_distinct"), Seq("source"), "left")
      .join(distinctCount(triG, "n_tri_distinct"), Seq("source"), "left")
      .select(col("source"), col("n_tok"),
        coalesce(col("n_uni_distinct"), lit(0L)).as("n_uni_distinct"),
        col("n_tri_total"),
        coalesce(col("n_tri_distinct"), lit(0L)).as("n_tri_distinct"))
      .select(col("source"), col("n_tok"), col("n_uni_distinct"),
        col("n_tri_total"), col("n_tri_distinct"),
        when(col("n_tok") > 0, graft.functions.Rounding.stable(
          col("n_uni_distinct") / col("n_tok"), 4)).as("uni_ttr"),
        when(col("n_tri_total") > 0, graft.functions.Rounding.stable(
          col("n_tri_distinct") / col("n_tri_total"), 4)).as("tri_ttr"))
      .orderBy(col("source"))
  }

  private def q143(s: SparkSession, dir: String): DataFrame =
    diversity(s, dir, (grams, alias) =>
      grams.distinct().groupBy(col("source")).agg(count(lit(1)).as(alias)))

  private val q143Sql =
    """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
      |tot AS (
      |  SELECT source, CAST(SUM(len(toks)) AS BIGINT) AS n_tok,
      |    CAST(SUM(GREATEST(len(toks) - 2, 0)) AS BIGINT) AS n_tri_total
      |  FROM t GROUP BY 1),
      |uni AS (
      |  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_uni_distinct
      |  FROM (SELECT source, unnest(toks) AS tok FROM t) GROUP BY 1),
      |tri AS (
      |  SELECT source, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_tri_distinct
      |  FROM (SELECT source, array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS g
      |        FROM (SELECT source, toks, unnest(generate_series(0, len(toks) - 3)) AS i
      |              FROM t WHERE len(toks) >= 3)) GROUP BY 1)
      |SELECT source, n_tok,
      |  CAST(COALESCE(n_uni_distinct, 0) AS BIGINT) AS n_uni_distinct,
      |  n_tri_total,
      |  CAST(COALESCE(n_tri_distinct, 0) AS BIGINT) AS n_tri_distinct,
      |  CASE WHEN n_tok > 0
      |    THEN floor(COALESCE(n_uni_distinct, 0) * 1.0 / n_tok * 10000.0 + 0.5) / 10000.0
      |    ELSE NULL END AS uni_ttr,
      |  CASE WHEN n_tri_total > 0
      |    THEN floor(COALESCE(n_tri_distinct, 0) * 1.0 / n_tri_total * 10000.0 + 0.5) / 10000.0
      |    ELSE NULL END AS tri_ttr
      |FROM tot LEFT JOIN uni USING (source) LEFT JOIN tri USING (source)
      |ORDER BY source""".stripMargin

  /** Approximate twin of q143 — the shape that actually ships at 100 TB:
    * each distinct-gram count becomes one mergeable HLL aggregate
    * (`approx_count_distinct`, rsd 2%) over the exploded gram hashes, so
    * there is NO (source, gram) distinct exchange at all — partial sketches
    * fold map-side and only |sources| sketches merge. The q10_approx
    * pattern: declared-approximate (no oracle, rows-only driver check);
    * TextSignalsSpec pins every count within 5% of exact q143 and totals
    * bit-identical (totals are exact sums in both).
    */
  private def q143Approx(s: SparkSession, dir: String): DataFrame =
    diversity(s, dir, (grams, alias) =>
      grams.groupBy(col("source"))
        .agg(approx_count_distinct(col("g"), 0.02).as(alias)))

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q143_ngram_diversity", q143, Some(q143Sql)),
    GraftQuery("q143_approx_diversity", q143Approx, None),
    GraftQuery("q120_source_overlap", q120, Some(q120Sql)),
    GraftQuery("q131_oov_rate", q131, Some(q131Sql)),
    GraftQuery("q132_dsir_resample", q132, Some(q132Sql)),
    GraftQuery("q134_weighted_reservoir", q134, Some(q134Sql)),
    GraftQuery("q138_token_entropy", q138, Some(q138Sql)),
    GraftQuery("q122_pmi_collocations", q122, Some(q122Sql)),
    GraftQuery("q115_lang_consistency", q115, Some(q115Sql)),
    GraftQuery("q116_tokenizer_fertility", q116, Some(q116Sql)),
    GraftQuery("q109_bm25", q109, Some(q109Sql)),
    GraftQuery("q111_quality_classifier", q111, Some(q111Sql)),
    GraftQuery("q113_weighted_sample", q113, Some(q113Sql)),
    GraftQuery("q81_redaction", q81, Some(q81Sql)),
    GraftQuery("q75_bigram_logprob", q75, Some(q75Sql)),
    GraftQuery("q40_tfidf_topterms", q40, Some(q40Sql)),
    GraftQuery("q41_quality_filter", q41, Some(q41Sql)),
    GraftQuery("q16_text_stats", q16, Some(q16Sql)),
    GraftQuery("q23_langid", q23, Some(q23Sql)),
    GraftQuery("q24_quality_score", q24, Some(q24Sql)),
    GraftQuery("q25_token_stats", q25, Some(q25Sql)),
    GraftQuery("q26_fingerprint", q26, Some(q26Sql)),
    GraftQuery("q51_unigram_logprob", q51, Some(q51Sql)),
    GraftQuery("q55_bigram_counts", q55, Some(q55Sql)),
    GraftQuery("q59_contamination", q59, Some(q59Sql)))
}
