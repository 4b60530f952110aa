package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed k-means (Lloyd) training over the embedding corpus — the
  * clustering primitive behind SemDeDup-style semantic dedup (cluster, then
  * dedup within clusters), IVF coarse-quantizer training, and
  * cluster-balanced data mixing. The reference engine has no vector surface
  * at all (its tables are Kafka-backed KV state,
  * `/root/reference/src/main/scala/com/iravid/fs2/kafka/streams/Table.scala`);
  * this extends the engine the same way [[Similarity]]'s IVF/PQ family does,
  * and complements the decimal Lloyd refiner already inside
  * [[Similarity]]'s IVF builder: that one optimizes float centroids for
  * recall, this one is the ORACLE-EXACT trainer whose every round is
  * bit-reproducible across engines.
  *
  * Arithmetic is INTEGER end-to-end so the fixed point is engine-exact:
  * vectors are first int8-quantized with q62's symmetric scheme
  * (scale = max|x|/127, qᵢ = floor(xᵢ/scale + 0.5) — spelled identically in
  * the oracle), distances are exact BIGINT squared-L2 over the quantized
  * coordinates, and the centroid update is the TRUNCATED per-component mean
  * `sum div n` (Spark `div` and DuckDB `//` both truncate toward zero, so
  * negative components agree too — unlike `floor(…)`, which rounds toward
  * −∞ and would need double division). Assignment ties break toward the
  * smaller cluster id via a single min(struct(dist, cid)) argmin. A cluster
  * that loses all members keeps its previous centroid (mirrored in the
  * oracle via an anti-join carry), so the state is total at every round.
  *
  * Scale shape (the 100 TB posture): classic parameter-server layout. The
  * model (k×dim longs) is broadcast; one iteration is a broadcast
  * nested-loop join producing n×k distance rows reduced by a
  * map-side-combinable min-struct argmin, then a posexplode + long-sum
  * aggregate over n×dim rows for the update — no all-pairs work, no
  * data-sized shuffle beyond the two aggregates, and the corpus is scanned
  * from cache (quantized once, persisted). Each round's centroid table is
  * eagerly `localCheckpoint`ed — k rows — so plan depth stays one round
  * regardless of `iters` (same lineage bound as [[Graph.pagerank]] and
  * [[Dedup.resolveGroups]]; a persist/unpersist chain would hit the
  * CacheManager recompile-and-clear trap documented in Graph.scala).
  */
object Clustering {

  /** Squared-L2 distance between two equal-length long arrays, exact in
    * BIGINT: Σ (aᵢ−bᵢ)². |q| ≤ 127 ⇒ per-term ≤ 254², dim 64 ⇒ ≤ 2^22 —
    * nowhere near overflow even at dim 10⁵. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** q62's symmetric int8 quantization, as (vec_id, qv: array<long>).
    * Zero-norm vectors are excluded (scale undefined), as in q62. */
  private def quantized(s: SparkSession, dir: String): DataFrame = {
    val absmax = aggregate(col("embedding"),
      lit(0.0), (a, x) => greatest(a, abs(x.cast("double"))))
    Fixtures.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), absmax.as("m"))
      .filter(col("m") > 0)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") / (col("m") / 127.0) + 0.5).cast("long"))
          .as("qv"))
  }

  /** Lloyd iterations over pre-quantized vectors `(vec_id, qv)`. Returns
    * the final per-cluster summary: (cluster_id, n_members, wcss,
    * centroid_l1) — members and within-cluster squared distance under the
    * FINAL centroids, plus the centroid's L1 norm as a value-level
    * fingerprint of the trained model. Seeds are the `k` smallest vec_ids
    * (deterministic, like the IVF seed rule in [[Similarity]]). */
  def kmeans(qdocsIn: DataFrame, k: Int, iters: Int): DataFrame = {
    // widen before persisting: the per-iteration distance stage (n×k
    // interpreted HOF folds over dim-long arrays) is CPU-dense on small
    // bytes, exactly the shape AQE's byte-sized coalescer serializes onto
    // one core (see Engine.widen) — and the persisted partitioning is what
    // every iteration inherits
    val qdocs = graft.Engine.widen(qdocsIn, col("vec_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed cid = rank of vec_id among the k smallest — the window runs on
    // k rows post-limit, so the single-partition sort is model-sized
    // model-state lineage cuts are LAZY and single-partition (r15): the
    // centroid table is k rows at ANY scale, so a dedicated 32-partition
    // eager materialization job per Lloyd round was pure cadence — the
    // next round's broadcast build materializes the pending cut instead
    // (one job per round, not two), and one partition keeps every
    // downstream read single-task-sized. Same posture as the PQ codebook
    // (Similarity.pqTopK); reliable-checkpoint deployments flip all of
    // them with SPARK_GRAFT_RELIABLE_CKPT.
    var cents = graft.Engine.cutLineage(
      qdocs.orderBy(col("vec_id")).limit(k)
        .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("cid"),
          col("qv").as("cv"))
        .coalesce(1), eager = false)

    def distances(c: DataFrame): DataFrame =
      qdocs.crossJoin(broadcast(c))
        .select(col("vec_id"), col("qv"), col("cid"),
          sqDist(col("qv"), col("cv")).as("dist"))

    // qv rides through the argmin as any_value (constant per vec_id group),
    // so the update step needs NO join back to qdocs — one exchange per
    // iteration instead of two (guide §2.4: two operations keyed the same
    // way share one exchange; here the second keyed op is eliminated).
    def assignment(c: DataFrame): DataFrame =
      distances(c).groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"),
          any_value(col("qv")).as("qv"))
        .select(col("vec_id"), col("qv"),
          col("m.cid").as("cid"), col("m.dist").as("dist"))

    for (_ <- 1 to iters) {
      val sums = assignment(cents)
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      // truncated mean, re-assembled in dimension order (collect_list is
      // order-free; the sort_array on (pos, c) structs restores it)
      val next = sums
        .select(col("cid"), col("pos"), expr("s div n").as("c"))
        .groupBy(col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("cv"))
      // a cluster with no members keeps its previous centroid
      val carried = cents.join(next.select(col("cid")), Seq("cid"), "left_anti")
      cents = graft.Engine.cutLineage(
        next.unionByName(carried).coalesce(1), eager = false)
    }

    val stats = assignment(cents).groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("wcss"))
    val l1 = cents.select(col("cid"),
      aggregate(col("cv"), lit(0L), (a, x) => a + abs(x)).as("centroid_l1"))
    stats.join(l1, "cid")
      .select(col("cid").as("cluster_id"), col("n_members"),
        col("wcss"), col("centroid_l1"))
      .orderBy(col("cluster_id"))
  }

  // ---------------------------------------------------------------- q123
  private val K = 8
  private val Iters = 3

  private def q123(s: SparkSession, dir: String): DataFrame =
    kmeans(quantized(s, dir), K, Iters)

  // Chained-CTE mirror: qv in long format (vec_id, pos, q), then per
  // iteration assignment (n×k distance sums + ROW_NUMBER argmin) and
  // update (grouped sums, `//` truncated mean, anti-join carry for empty
  // clusters). Every SUM is cast back to BIGINT immediately — DuckDB
  // SUM(BIGINT) is HUGEINT (the Multimodal.scala lesson).
  private val q123Sql: String = {
    val head =
      s"""WITH el AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |mx AS (SELECT vec_id, MAX(abs(x)) AS m FROM el GROUP BY vec_id),
         |qv AS (
         |  SELECT el.vec_id, pos, CAST(floor(x / (m / 127.0) + 0.5) AS BIGINT) AS q
         |  FROM el JOIN mx USING (vec_id) WHERE m > 0),
         |seeds AS (
         |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
         |  FROM (SELECT DISTINCT vec_id FROM qv ORDER BY vec_id LIMIT $K)),
         |c0 AS (SELECT cid, pos, q AS c FROM seeds JOIN qv USING (vec_id))""".stripMargin
    val rounds = (1 to Iters).map { i =>
      s"""d$i AS (
         |  SELECT qv.vec_id, c.cid, CAST(SUM((q - c.c) * (q - c.c)) AS BIGINT) AS dist
         |  FROM qv JOIN c${i - 1} c ON qv.pos = c.pos
         |  GROUP BY qv.vec_id, c.cid),
         |a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d$i) WHERE rn = 1),
         |u$i AS (
         |  SELECT cid, pos, CAST(SUM(q) AS BIGINT) AS s, COUNT(*) AS n
         |  FROM a$i JOIN qv USING (vec_id) GROUP BY cid, pos),
         |c$i AS (
         |  SELECT cid, pos, s // n AS c FROM u$i
         |  UNION ALL
         |  SELECT cid, pos, c FROM c${i - 1}
         |  WHERE cid NOT IN (SELECT DISTINCT cid FROM u$i))""".stripMargin
    }
    val tail =
      s"""dF AS (
         |  SELECT qv.vec_id, c.cid, CAST(SUM((q - c.c) * (q - c.c)) AS BIGINT) AS dist
         |  FROM qv JOIN c$Iters c ON qv.pos = c.pos
         |  GROUP BY qv.vec_id, c.cid),
         |aF AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM dF) WHERE rn = 1),
         |res AS (
         |  SELECT cid, COUNT(*) AS n_members, CAST(SUM(dist) AS BIGINT) AS wcss
         |  FROM aF GROUP BY cid),
         |l1 AS (SELECT cid, CAST(SUM(abs(c)) AS BIGINT) AS centroid_l1
         |       FROM c$Iters GROUP BY cid)
         |SELECT res.cid AS cluster_id, n_members, wcss, centroid_l1
         |FROM res JOIN l1 USING (cid) ORDER BY cluster_id""".stripMargin
    (head +: rounds :+ tail).mkString(",\n")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q123_kmeans", q123, Some(q123Sql)))
}
