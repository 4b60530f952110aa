package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph centrality (PageRank) — the corpus-curation quality signal
  * used by production web-crawl pipelines (harmonic/PageRank centrality over
  * the host graph decides which documents are worth keeping, cf. the
  * CommonCrawl-derived corpora in PAPERS.md). The reference engine has no
  * graph surface at all; this extends the engine the same way the dedup
  * connected-components operator does ([[Dedup]] alternating-star, which is
  * the other fixed-point graph loop in the repo).
  *
  * Arithmetic is INTEGER-SCALED so the fixed point is bit-exact and
  * DuckDB-oracle-able: scores are maintained as BIGINT in units of 1e-12
  * (init = 1.0 ⇒ 10^12), one update is
  *
  *   score'(v) = base + Σ_{(u,v)∈E} ((score(u) div outdeg(u)) * 85) div 100
  *
  * with base = 0.15·10^12 — i.e. damping 0.85 with floor division at every
  * step, which both engines evaluate identically on positive BIGINTs
  * (`div`/`//` are floor-toward-zero). Floating-point PageRank would make
  * the oracle hash depend on the reduction order of doubles across
  * partitions — the exact nondeterminism class this repo bans from outputs.
  * Dangling-node mass (sinks have no out-edges) evaporates rather than being
  * redistributed; that choice is part of the declared semantics and is
  * mirrored in the oracle.
  *
  * Scale shape (the 100 TB posture): the loop is the Pregel superstep in
  * DataFrame form. State is the SPARSE in-mass table — one row per node
  * with ≥1 in-edge — not the dense score vector: a node's score is always
  * `base + inmass` (0 if absent), so carrying the dense vector would only
  * add a vertex-set left join to every superstep. One iteration is
  * `edges ⨝ inmass (on src, left)` + `groupBy dst`; the join key is the
  * edge source, the aggregate is map-side-combinable (sum of longs).
  * `edges`+`outdeg` are computed once and persisted (they are re-read every
  * iteration; recomputing the edge-derivation join per iteration is the
  * classic lineage trap — same lesson as the IVF refine loop,
  * Similarity.scala). Each round's in-mass is eagerly `localCheckpoint`ed —
  * the same bound [[Dedup.resolveGroups]] uses — so every superstep builds
  * on a LogicalRDD and plan depth is ONE superstep regardless of `iters`
  * (GraphSpec pins constant depth at iters=15). A persist/unpersist chain
  * is NOT an alternative here: `unpersist()` on round t makes CacheManager
  * re-compile (and clear the data of) every cache entry whose plan contains
  * round t — i.e. round t+1 — so lineage and recomputation grow
  * exponentially while every round still claims to be cached. Local
  * checkpoints die with an executor; on a real cluster a reliable
  * `checkpoint()` every k rounds is the swap-in (as resolveGroups offers).
  *
  * Early exit at the exact fixed point: because the arithmetic is integer,
  * `inmass(t+1) == inmass(t)` implies every later round is bit-identical,
  * so the loop may stop and return the fixed point as the result of ALL
  * remaining iterations — the same no-change halting rule as Pregel's
  * vote-to-halt, made sound by exactness (a float tolerance would change
  * the declared semantics; equality does not). The probe is FUSED into the
  * superstep: the previous round joins back on the constant in-mass node
  * set and an `observe()` metric counts changed rows during the
  * localCheckpoint job itself — zero extra actions per round. Iteration 1
  * needs no score join at all: every source holds exactly `init`.
  */
object Graph {

  /** Integer-scaled PageRank over an edge list (`src: long, dst: long`).
    * Returns `(node, score)` with score in 1e-12 units, bit-identical to
    * running the recurrence exactly `iters` times.
    */
  def pagerank(edges: DataFrame, iters: Int,
      init: Long = 1000000000000L, base: Long = 150000000000L): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (iters <= 0) return nodes.withColumn("score", lit(init))
    // out-degree rides on every edge row so the per-iteration join is a
    // single equi-join on src (not edges⨝deg⨝scores). No pre-partitioning
    // by src: at fixture scale AQE broadcasts the vertex-sized in-mass
    // side, so the persisted edge table is never reshuffled per round
    // anyway; at cluster scale, bucket the edge table by src to get the
    // same exchange reuse durably.
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    // superstep 1: every source's score is `init` — pure edge aggregate.
    // Eager localCheckpoint materializes the round and truncates lineage
    // to a LogicalRDD; the previous round's blocks are released by the
    // ContextCleaner once unreferenced.
    var inmass = ed
      .select(col("dst").as("node"),
        expr(s"(($init div deg) * 85) div 100").as("c"))
      .groupBy("node").agg(sum("c").as("inmass"))
      .localCheckpoint()
    var it = 1
    var fixed = false
    while (it < iters && !fixed) {
      // Exact fixed-point probe FUSED into the round's materialization: the
      // previous round joins back on (the constant) in-mass node set and an
      // observe() metric counts changed rows while the localCheckpoint job
      // runs — one action per superstep instead of checkpoint + probe.
      // `<=>` tolerates the (impossible) null anyway; `prev` is projected
      // away before the checkpoint so the carried state stays (node, inmass).
      val obs = org.apache.spark.sql.Observation()
      val next = ed
        .join(inmass.select(col("node").as("src"), col("inmass").as("im")),
          Seq("src"), "left")
        .select(col("dst").as("node"),
          expr(s"((($base + coalesce(im, 0L)) div deg) * 85) div 100").as("c"))
        .groupBy("node").agg(sum("c").as("inmass"))
        .join(inmass.select(col("node"), col("inmass").as("prev")), Seq("node"))
        .observe(obs, sum(when(!(col("inmass") <=> col("prev")), 1L)
          .otherwise(0L)).as("changed"))
        .drop("prev")
        .localCheckpoint()
      inmass = next
      it += 1
      fixed = obs.get("changed").asInstanceOf[Long] == 0L
    }
    nodes.join(inmass, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + coalesce(col("inmass"), lit(0L))).as("score"))
  }

  // ---------------------------------------------------------------- q117
  // Supplier→customer trade graph: an edge when a supplier shipped a line
  // item on one of the customer's orders. Customer node ids are offset by
  // 1e6 to keep the two key spaces disjoint. 5 iterations, full node set
  // out, ordered by score (highest-centrality trading partners first).
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val li = Fixtures.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Fixtures.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").cast("long").as("src"),
        (col("o_custkey").cast("long") + lit(1000000L)).as("dst"))
      .distinct()
    pagerank(edges, iters = 5)
      .orderBy(col("score").desc, col("node"))
  }

  // Chained-CTE mirror of the same fixed point: it0 … it5, each iteration
  // one grouped left join. SUM(BIGINT) is HUGEINT in DuckDB — every
  // iteration casts back to BIGINT so the final schema (and the driver's
  // stringified hash) stays in the 64-bit domain.
  private val q117Sql: String = {
    val head =
      """WITH edges AS (
        |  SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |it0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS score FROM nodes)""".stripMargin
    val iters = (1 to 5).map { i =>
      s"""it$i AS (
         |  SELECT n.node, CAST(150000000000 + COALESCE(SUM(((p.score // d.deg) * 85) // 100), 0) AS BIGINT) AS score
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN it${i - 1} p ON p.node = e.src
         |  LEFT JOIN deg d ON d.src = e.src
         |  GROUP BY n.node)""".stripMargin
    }
    (head +: iters).mkString(",\n") +
      "\nSELECT node, score FROM it5 ORDER BY score DESC, node"
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q117_pagerank", q117, Some(q117Sql)))
}
