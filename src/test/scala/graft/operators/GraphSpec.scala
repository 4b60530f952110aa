package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank semantics beyond the q117 value oracle: the distributed loop
  * must equal a sequential reference fold of the SAME integer recurrence,
  * and the declared conservation/sink invariants must hold on real data.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Init = 1000000000000L
  private val Base = 150000000000L
  private val LocalKnob = "SPARK_GRAFT_PR_LOCAL_EDGES"

  /** Pin the sub-bound local fast path off (knob=0) or on (knob absent →
    * default bound) around `body`, restoring the previous value. */
  private def withKnob[A](v: Option[String])(body: => A): A = {
    val saved = sys.props.get(LocalKnob)
    v match { case Some(x) => sys.props(LocalKnob) = x; case None => sys.props -= LocalKnob }
    try body
    finally saved match {
      case Some(x) => sys.props(LocalKnob) = x
      case None => sys.props -= LocalKnob
    }
  }

  /** Distributed superstep loop (fast path disabled). */
  private def prDistributed(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    withKnob(Some("0")) {
      import spark.implicits._
      Graph.pagerank(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

  /** Sequential reference: the exact integer recurrence, evaluated in plain
    * Scala maps (no Spark). */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var score = nodes.map(_ -> Init).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _) => ((score(u) / deg(u)) * 85L) / 100L }.sum
      }.toMap
      score = nodes.map(n => n -> (Base + in.getOrElse(n, 0L))).toMap
    }
    score
  }

  test("distributed loop equals the sequential integer recurrence") {
    // cycle + chord + sink: exercises in-degree 0, out-degree 0 (dangling),
    // and multi-in-edge accumulation in one graph
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(prDistributed(edges, 5) === refPagerank(edges, 5))
  }

  test("local fast path ≡ distributed loop ≡ sequential recurrence (3 graphs)") {
    import spark.implicits._
    val graphs = Seq(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L)), // cycle+chord+sink
      Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L)),       // bipartite (early exit)
      (0L until 40L).flatMap(i => Seq((i, (i + 1) % 40), (i, (i + 7) % 40)))
        .filter(e => e._1 != e._2))                          // dense ring
    for (edges <- graphs) {
      val fast = withKnob(None) {
        Graph.pagerank(edges.toDF("src", "dst"), iters = 6)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(fast === refPagerank(edges, 6), "fast path vs sequential reference")
      assert(fast === prDistributed(edges, 6), "fast path vs distributed loop")
    }
  }

  test("node with no in-edges holds exactly the base score") {
    assert(prDistributed(Seq((1L, 2L), (1L, 3L)), 3)(1L) === Base)
  }

  test("plan depth is constant in iters: each superstep materializes (iters=15 plans like iters=2)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L))
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      "Join".r.findAllIn(df.queryExecution.optimizedPlan.toString).size
    val (deep, shallow) = withKnob(Some("0")) {
      (Graph.pagerank(edges.toDF("src", "dst"), iters = 15),
        Graph.pagerank(edges.toDF("src", "dst"), iters = 2))
    }
    // every round eagerly localCheckpoints its in-mass, so the RETURNED
    // plan is always `nodes ⨝ LogicalRDD` — O(1) joins however large
    // iters is (no lineage-blowup mode)
    assert(joins(deep) <= joins(shallow),
      s"expected per-round materialization to bound plan depth: ${joins(deep)} vs ${joins(shallow)}")
    // and the values still equal the sequential recurrence across the rounds
    val got = deep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPagerank(edges, 15))
  }

  test("exact fixed-point early exit returns the same result as running all iterations") {
    import spark.implicits._
    // bipartite graph: sources have no in-edges, so scores are constant
    // from round 2 on — iters=50 must early-exit AND equal the 50-round
    // sequential recurrence bit for bit
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L))
    val got = Graph.pagerank(edges.toDF("src", "dst"), iters = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPagerank(edges, 50))
  }

  test("q117: mass never grows (floor losses + dangling evaporation only)") {
    val out = SparkEntry.queries("q117_pagerank")(spark, TestSpark.sf0001)
    val agg = out.agg(count(lit(1)).as("n"), sum(col("score")).as("total"),
      min(col("score")).as("mn")).collect()(0)
    val (n, total, mn) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(n > 0)
    assert(mn >= Base, "every node keeps at least the damping base")
    assert(total <= n * Init, "total mass must not exceed the initial mass")
  }

  /** Brute-force reference: count triangles by testing every node triple
    * against the edge set (fine at spec scale). */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if es((a, b)) && es((a, c)) && es((b, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def triOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("q133 core: per-node triangle counts equal brute force on random graphs (5 seeds)") {
    val rnd = new scala.util.Random(7)
    for (seed <- 1 to 5) {
      rnd.setSeed(seed * 1000L)
      val n = 30 + rnd.nextInt(20)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.15
      } yield (a, b)).toSeq
      assert(triOf(edges) === refTriangles(edges), s"seed $seed mismatch")
    }
  }

  test("q133 core: K4 yields 3 triangles per node; a star yields none") {
    val k4 = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    assert(triOf(k4.toSeq) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val star = (1L to 6L).map(i => (0L, i))
    assert(triOf(star) === Map.empty[Long, Long])
  }

  test("q133 guardrail is observable: a planted hot part is excluded AND counted") {
    import spark.implicits._
    // part 100: TriCap+1 buyers (hot — must be dropped, silently thinning
    // the graph unless the metric reports it); parts 200/201/202 build a
    // triangle among customers 1/2/3
    val hot = (1L to (Graph.TriCap + 1L)).map(c => (100L, c))
    val tri = Seq((200L, 1L), (200L, 2L), (201L, 2L), (201L, 3L), (202L, 1L), (202L, 3L))
    val df = Graph.coPurchaseTriangles((hot ++ tri).toDF("p", "c"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hot-part-only pairs (e.g. customers 4..21) contributed no edges
    assert(rows === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val m = df.queryExecution.observedMetrics("q133_guardrail")
    assert(m.getAs[Long]("n_excluded_parts") === 1L)
    assert(m.getAs[Int]("max_part_buyers") === Graph.TriCap + 1)
  }
}
