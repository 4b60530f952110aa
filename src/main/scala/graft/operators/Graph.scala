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

  /** Single-task evaluation of the SAME integer recurrence (early exit
    * included) for edge sets at or below `SPARK_GRAFT_PR_LOCAL_EDGES`:
    * every superstep of the distributed loop costs several AQE stage waves
    * plus a broadcast build over a vertex-sized state table — pure
    * scheduling latency when the whole graph is a few MB (guide §2.5,
    * parallelism matched to data size; the r14 scaling block measured q117
    * at ratio 0.48 — 32 cores SLOWER than 8 on the superstep cadence). All
    * arithmetic is the declared positive-BIGINT floor recurrence, so the
    * result is bit-identical to the distributed loop (GraphSpec pins
    * fast ≡ distributed ≡ sequential-reference).
    */
  private def localPagerank(e: DataFrame, iters: Int,
      init: Long, base: Long): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val edges = it.toArray
        val deg = scala.collection.mutable.LongMap.empty[Long]
        edges.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
        // superstep 1: every source holds exactly `init`
        var inmass = scala.collection.mutable.LongMap.empty[Long]
        edges.foreach { case (s, d) =>
          inmass(d) = inmass.getOrElse(d, 0L) + ((init / deg(s)) * 85L) / 100L
        }
        var round = 1
        var fixed = false
        while (round < iters && !fixed) {
          val next = scala.collection.mutable.LongMap.empty[Long]
          edges.foreach { case (s, d) =>
            next(d) = next.getOrElse(d, 0L) +
              (((base + inmass.getOrElse(s, 0L)) / deg(s)) * 85L) / 100L
          }
          fixed = next == inmass // exact fixed point ⇒ all later rounds identical
          inmass = next
          round += 1
        }
        val nodes = scala.collection.mutable.LongMap.empty[Unit]
        edges.foreach { case (s, d) => nodes(s) = (); nodes(d) = () }
        nodes.keysIterator.map(n => (n, base + inmass.getOrElse(n, 0L)))
      }
      .toDF("node", "score")
  }

  /** Integer-scaled PageRank over an edge list (`src: long, dst: long`).
    * Returns `(node, score)` with score in 1e-12 units, bit-identical to
    * running the recurrence exactly `iters` times.
    */
  def pagerank(edges: DataFrame, iters: Int,
      init: Long = 1000000000000L, base: Long = 150000000000L): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    // sub-bound graphs run the whole loop in one task (see localPagerank);
    // the count rides the persisted edge table every downstream path needs
    val localBound = graft.Engine.confLong("SPARK_GRAFT_PR_LOCAL_EDGES", 1000000L)
    if (iters > 0 && localBound > 0 && e.count() <= localBound)
      return localPagerank(e, iters, init, base)
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
    // widen the fact side before the broadcast join: the single-split scan
    // otherwise leaves scan+join+partial-distinct fused on one task
    // (Engine.widen; r14 QueryProbe: a 0.53 s 3-task edge-derivation job)
    val li = graft.Engine.widen(
      Fixtures.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
      col("l_orderkey"))
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

  // ---------------------------------------------------------------- q133
  // Degree-oriented triangle counting over the customer co-purchase graph —
  // the clustering-coefficient backbone (community density, spam-farm and
  // collusion detection on interaction graphs; for corpora, the same
  // operator runs on the near-dup candidate graph to find boilerplate
  // cliques). Edge (a, b) when two customers ordered the same part; parts
  // with more than TriCap distinct buyers are excluded (the declared
  // hot-item guardrail every bipartite co-occurrence projection needs —
  // one part with 10⁶ buyers would otherwise emit 10¹² edges).
  //
  // The algorithm is the MapReduce-classic orientation trick (Suri &
  // Vassilvitskii 2011 / Cohen 2009): direct every edge from the
  // lower-(degree, id) endpoint to the higher, so each triangle is counted
  // exactly once from its lowest-rank vertex and wedge generation per node
  // is bounded by OUT-degree ≤ O(√m) — a hot vertex's in-edges never pair.
  // Both wedge-build and closure are equi hash joins (on src, then on the
  // (v, w) pair); per-node counts explode 3 rows per triangle and fold in
  // one map-side-combinable aggregate; top-20 is a TakeOrderedAndProject.
  // Rank packs as deg·10⁹ + node (node ids < 10⁹), a single BIGINT both
  // engines order identically.
  private[graft] val TriCap = 20

  /** Per-node triangle counts over an undirected edge list `(x, y)` with
    * x < y, distinct, no self-loops. Degree-oriented exactly-once counting
    * (see q133 scaladoc); returns `(node, n_tri)` for nodes in ≥1 triangle.
    */
  private[graft] def triangleCounts(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.persist() // read thrice: degrees + both orientation joins
    val deg = edges.select(col("x").as("n")).union(edges.select(col("y")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val dir0 = edges
      .join(deg.select(col("n").as("x"), col("d").as("dx")), Seq("x"))
      .join(deg.select(col("n").as("y"), col("d").as("dy")), Seq("y"))
      .select((col("dx") * 1000000000L + col("x")).as("rx"),
        (col("dy") * 1000000000L + col("y")).as("ry"), col("x"), col("y"))
    val dirE = dir0.select(
        when(col("rx") < col("ry"), col("x")).otherwise(col("y")).as("u"),
        when(col("rx") < col("ry"), col("y")).otherwise(col("x")).as("v"),
        greatest(col("rx"), col("ry")).as("rv"))
      .persist() // read thrice: two wedge sides + the closure probe
    // NOTE (r15): SHUFFLE_MERGE hints on these two joins were tried twice
    // against the engine-wide SHJ default — r14 (hinted 3.5 s vs unhinted
    // 3.2 s) and r15 (alternating idle A/B: hinted 4.9 s vs unhinted
    // 2.9 s) — and lost both times; the r14 driver's q133 5.8 s reading
    // that motivated them did not reproduce at idle. Unhinted stays.
    val tri = dirE.as("e1").join(dirE.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rv") < col("e2.rv"))
      .select(col("e1.u").as("ta"), col("e1.v").as("tb"), col("e2.v").as("tc"))
      .join(dirE.as("e3"),
        col("tb") === col("e3.u") && col("tc") === col("e3.v"))
      .select(col("ta"), col("tb"), col("tc"))
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** q133 body over raw bipartite `(p, c)` rows (part, customer; dups
    * fine — the per-part collect_set dedups). Exposed so the spec can
    * plant a hot part and read the guardrail metric.
    *
    * NO SILENT CAPS: the TriCap exclusion is observable — the parts
    * aggregate carries an `observe("q133_guardrail", ...)` with the count
    * of excluded hot parts and the hottest part's buyer count, so a 100×
    * run can SEE what the projection dropped (via
    * `queryExecution.observedMetrics` / any QueryExecutionListener)
    * instead of discovering a silently thinner graph.
    */
  private[graft] def coPurchaseTriangles(pc: DataFrame): DataFrame = {
    // Bipartite projection WITHOUT a self-join: one collect_set aggregate
    // per part (the same shuffle the cap filter needs anyway), then the
    // ≤ TriCap² ordered pairs per part unfold in a narrow HOF projection —
    // per-part work is cap-bounded by construction, so the lambda is safe
    // from the q124 HOF-collapse trap and the only remaining shuffle is the
    // cross-part edge distinct.
    val parts = pc
      .groupBy(col("p")).agg(sort_array(collect_set(col("c").cast("long"))).as("cs"))
      .observe("q133_guardrail",
        sum(when(size(col("cs")) > TriCap, 1L).otherwise(0L)).as("n_excluded_parts"),
        max(size(col("cs"))).as("max_part_buyers"))
      .filter(size(col("cs")) >= 2 && size(col("cs")) <= TriCap)
    val edges = parts.select(explode(flatten(transform(
        sequence(lit(0), size(col("cs")) - 2),
        i => transform(slice(col("cs"), i + 2, size(col("cs")) - i - 1),
          cb => struct(element_at(col("cs"), i + 1).as("x"), cb.as("y"))))))
        .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y")).distinct()
    triangleCounts(edges)
      .orderBy(col("n_tri").desc, col("node"))
      .limit(20)
  }

  private def q133(s: SparkSession, dir: String): DataFrame =
    coPurchaseTriangles(
      // widen the fact side before the broadcast join (same single-split
      // scan serialization as q117's edge derivation; see Engine.widen)
      graft.Engine.widen(
          Fixtures.lineitem(s, dir).select(col("l_partkey").as("p"), col("l_orderkey")),
          col("l_orderkey"))
        .join(Fixtures.orders(s, dir).select(col("o_orderkey"), col("o_custkey").as("c")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("p"), col("c")))

  private val q133Sql =
    s"""WITH pc AS (
       |  SELECT DISTINCT l_partkey AS p, o_custkey AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |ok AS (SELECT p FROM pc GROUP BY p HAVING COUNT(*) BETWEEN 2 AND $TriCap),
       |e AS (
       |  SELECT DISTINCT a.c AS x, b.c AS y
       |  FROM pc a JOIN pc b ON a.p = b.p AND a.c < b.c
       |  JOIN ok ON ok.p = a.p),
       |deg AS (
       |  SELECT n, COUNT(*) AS d FROM (
       |    SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
       |dir AS (
       |  SELECT CASE WHEN dx.d * 1000000000 + x < dy.d * 1000000000 + y THEN x ELSE y END AS u,
       |         CASE WHEN dx.d * 1000000000 + x < dy.d * 1000000000 + y THEN y ELSE x END AS v,
       |         greatest(dx.d * 1000000000 + x, dy.d * 1000000000 + y) AS rv
       |  FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
       |tri AS (
       |  SELECT e1.u AS ta, e1.v AS tb, e2.v AS tc
       |  FROM dir e1 JOIN dir e2 ON e1.u = e2.u AND e1.rv < e2.rv
       |  JOIN dir e3 ON e3.u = e1.v AND e3.v = e2.v)
       |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
       |  SELECT ta AS node FROM tri
       |  UNION ALL SELECT tb FROM tri
       |  UNION ALL SELECT tc FROM tri)
       |GROUP BY 1 ORDER BY n_tri DESC, node LIMIT 20""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q117_pagerank", q117, Some(q117Sql)),
    GraftQuery("q133_triangles", q133, Some(q133Sql)))
}
