package graft.operators

import graft.{Fixtures, GraftQuery}
import graft.functions.Rounding
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing (MOSS-style) document fingerprints — the guaranteed-gap SPARSE
  * alternative to q102's every-offset window fingerprints.
  *
  * q102/q105 fingerprint every SubWidth-token offset: exact, but the index
  * is one row per token. Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm) keeps only the MINIMUM k-gram hash of each
  * window of W consecutive k-grams, shrinking the index ~2/(W+1) per token
  * while preserving a hard guarantee: any shared token run of length
  * ≥ K + W − 1 still produces at least one shared selected fingerprint,
  * because both documents contain the same full window of W k-grams and the
  * window's minimum VALUE is a function of the window contents alone (the
  * position tie-break only picks WHICH occurrence, never which value).
  * WinnowSpec pins exactly that guarantee on adversarial shared-run corpora.
  *
  * Selection is relational and engine-identical: per-k-gram 40-bit md5
  * value v40 (first 10 hex digits — the same digest-prefix family as
  * [[graft.functions.Md5Hash60]]), packed key = v40·2²⁰ + pos (< 2⁶⁰,
  * overflow-safe BIGINT in both engines; pos < 2²⁰ bounds documents at 1M
  * tokens — fine for LLM-corpus shards, and the cap is a declared constant,
  * not a silent truncation), selected key per window = MIN over a
  * doc-partitioned ROWS window. MIN-of-packed-key = leftmost occurrence of
  * the minimal v40 — a deterministic tie-break variant (robust winnowing
  * proper, Schleimer et al. §2.3, breaks ties toward the RIGHTMOST minimal
  * hash, preferring the previously-selected fingerprint to shrink the index
  * further); the shared-fingerprint guarantee is value-based, so it holds
  * under either rule. The rule is mirrored verbatim by the oracle's window
  * SUM…MIN SQL.
  *
  * Scale shape: one narrow token-scale pass (k-gram explode → one codegen'd
  * digest per k-gram → doc-partitioned ROWS-window MIN → distinct), then all
  * cross-doc work happens on the ~n·2/(W+1) surviving fingerprints. The
  * candidate join (q129) is an equi-join on v40 — bucketed by construction,
  * no all-pairs stage; the verify step is threshold-banded Levenshtein
  * (O(maxDist·len) per pair, and pairs are candidate-bounded). This is the
  * fingerprint-index layout you ship at 100 TB when the every-offset index
  * is too large to keep hot.
  *
  * The reference has no fingerprinting at all (its closest surface is the
  * by-key upsert fold, /root/reference/src/main/scala/com/iravid/fs2/kafka/
  * streams/Tables.scala); this module is [EXT] training-data-pipeline
  * surface like the rest of the dedup family.
  */
object Winnow {

  /** Word k-gram width. */
  private[graft] val K = 4

  /** Winnowing window: W consecutive k-grams per selection window. */
  private[graft] val W = 4

  /** Position packing base (2²⁰). */
  private[graft] val PosBase = 1048576L

  /** Max edit distance for the q129 verify step (declared semantics: the
    * banded-DP threshold IS the pair cutoff, so Spark's `levenshtein(l, r,
    * threshold)` -1-above-threshold contract mirrors the oracle's
    * `levenshtein(...) <= MaxDist` filter exactly).
    */
  private[graft] val MaxDist = 60

  /** Selected minimizers per document: `(doc_id, nk, v40, spos)` — the
    * distinct (value, position) fingerprints winnowing keeps. `v40` is the
    * cross-document match key; `spos` locates the selected k-gram; `nk`
    * (the doc's k-gram count, constant per doc) rides along so q128 never
    * needs a second corpus scan.
    */
  private[graft] def minimizers(docs: DataFrame): DataFrame = {
    // repartition BEFORE the narrow k-gram + digest stage: the fixture is a
    // single parquet file, so without it the whole md5 pass runs in one
    // task (see Dedup.docShingles); hashpartitioning(doc_id) also exactly
    // satisfies the window's required distribution — no second exchange
    val base = graft.Engine.widen(docs, col("doc_id"))
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= K + W - 1) // at least one full window
    val kg = base
      .select(col("doc_id"), (size(col("toks")) - (K - 1)).cast("long").as("nk"),
        posexplode(transform(sequence(lit(0), size(col("toks")) - K),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(K)))))
          .as(Seq("pos", "kgram")))
      .select(col("doc_id"), col("nk"), col("pos"),
        (shiftright(hash60(col("kgram")), 20) * PosBase + col("pos")).as("key"))
    val wv = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, W - 1)
    kg.withColumn("selkey", min(col("key")).over(wv))
      .filter(col("pos") <= col("nk") - W) // full windows only
      .select(col("doc_id"), col("nk"), col("selkey")).distinct()
      .select(col("doc_id"), col("nk"),
        shiftright(col("selkey"), 20).as("v40"),
        pmod(col("selkey"), lit(PosBase)).as("spos"))
  }

  // ---------------------------------------------------------------- q128
  // Per-document winnowing fingerprint accounting: how many k-grams, how
  // many survived selection (index compression), and how many of the
  // selected fingerprints are shared with at least one other document (the
  // sparse-index analogue of q102's dup_frac — computed on ~1/3 the rows).
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val sel = minimizers(Fixtures.documents(s, dir))
      .persist() // read twice: per-v40 doc counts + the per-doc rollup — the
                 // k-gram digest + window pass must run once
    val perV = sel.select(col("doc_id"), col("v40")).distinct()
      .groupBy(col("v40")).agg(count(lit(1)).as("nd"))
    sel.join(perV, Seq("v40"))
      .groupBy(col("doc_id"))
      .agg(max(col("nk")).as("n_kgrams"),
        count(lit(1)).as("n_min"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_kgrams"), col("n_min"), col("n_shared"),
        Rounding.stable(col("n_shared") / col("n_min"), 4).as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  /** The winnowing CTE shared verbatim by the q128 and q129 oracles. */
  private val winnowCte =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |      WHERE len(string_split(text, ' ')) >= ${K + W - 1}),
       |kg AS (
       |  SELECT doc_id, pos, len(toks) - ${K - 1} AS nk,
       |    ('0x' || substr(md5(array_to_string(
       |       list_slice(toks, pos + 1, pos + $K), ' ')), 1, 10))::BIGINT AS v40
       |  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - $K)) AS pos
       |        FROM t)),
       |win AS (
       |  SELECT doc_id, pos, nk,
       |    MIN(v40 * $PosBase + pos) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS selkey
       |  FROM kg),
       |sel AS (
       |  SELECT DISTINCT doc_id, selkey // $PosBase AS v40, selkey % $PosBase AS spos
       |  FROM win WHERE pos <= nk - $W)""".stripMargin

  private val q128Sql =
    s"""WITH $winnowCte,
       |perv AS (
       |  SELECT v40, COUNT(DISTINCT doc_id) AS nd FROM sel GROUP BY 1)
       |SELECT selk.doc_id,
       |  CAST(MAX(selk.nk) AS BIGINT) AS n_kgrams,
       |  CAST(COUNT(*) AS BIGINT) AS n_min,
       |  CAST(SUM(CASE WHEN perv.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  floor(SUM(CASE WHEN perv.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
       |        * 10000.0 + 0.5) / 10000.0 AS shared_frac
       |FROM (SELECT s.doc_id, s.v40, kgn.nk FROM sel s
       |      JOIN (SELECT doc_id, MAX(nk) AS nk FROM kg GROUP BY 1) kgn
       |        USING (doc_id)) selk
       |JOIN perv USING (v40)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q129
  // Edit-distance near-dup pairs, MOSS-shaped: candidates = document pairs
  // sharing at least one SELECTED winnowing fingerprint (guaranteed to
  // include every pair sharing a ≥ K+W−1-token run), verified with
  // threshold-banded Levenshtein. The threshold is part of the declared
  // semantics — Spark's 3-arg `levenshtein` stops the DP at MaxDist
  // (O(MaxDist·len) instead of O(len²) per pair) and returns −1 above it,
  // which the filter drops; the oracle applies the same `<= MaxDist` cut to
  // the full distance, so the two forms are result-identical by the
  // function's contract. Complements the token-set views of similarity
  // (q17 jaccard, q18 hamming): edit distance sees ORDER and local edits.
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val docs = Fixtures.documents(s, dir)
    val sel = minimizers(docs).select(col("doc_id"), col("v40")).distinct()
      .persist() // both sides of the candidate self-join — the k-gram
                 // digest + window pass must not run twice
    val cand = sel.as("a").join(sel.as("b"),
        col("a.v40") === col("b.v40") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    cand.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b"), MaxDist).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q129Sql =
    s"""WITH $winnowCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sel a JOIN sel b ON a.v40 = b.v40 AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist
       |FROM cand
       |JOIN documents ta ON ta.doc_id = cand.doc_a
       |JOIN documents tb ON tb.doc_id = cand.doc_b
       |WHERE levenshtein(ta.text, tb.text) <= $MaxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q128_winnow_fingerprints", q128, Some(q128Sql)),
    GraftQuery("q129_edit_near_dup", q129, Some(q129Sql)))
}
