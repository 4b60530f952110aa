package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Alternating-star connected components: correctness against a driver-side
  * union-find oracle, and the round bound that motivates the algorithm —
  * a long chain (diameter ≫ log n) must converge in O(log n) rounds, where
  * plain min-label propagation would need one round per hop.
  *
  * The operator has a sub-`SPARK_GRAFT_CC_LOCAL_EDGES` single-task fast
  * path (r15); the distributed-loop tests pin the knob to 0 so the star
  * rounds stay exercised, and dedicated tests pin fast-path ≡ distributed.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val LocalKnob = "SPARK_GRAFT_CC_LOCAL_EDGES"

  private def withKnob[A](v: Option[String])(body: => A): A = {
    val saved = sys.props.get(LocalKnob)
    v match { case Some(x) => sys.props(LocalKnob) = x; case None => sys.props -= LocalKnob }
    try body
    finally saved match {
      case Some(x) => sys.props(LocalKnob) = x
      case None => sys.props -= LocalKnob
    }
  }

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
  }

  /** Distributed star rounds (fast path disabled). */
  private def run(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) =
    withKnob(Some("0")) {
      import spark.implicits._
      val (labels, rounds) =
        Dedup.connectedComponentsWithRounds(edges.toDF("a", "b"))
      (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }

  /** Default path (fast path active at spec scale). */
  private def runFast(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) =
    withKnob(None) {
      import spark.implicits._
      val (labels, rounds) =
        Dedup.connectedComponentsWithRounds(edges.toDF("a", "b"))
      (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }

  test("64-node chain: labels = component min, rounds = O(log n) not O(diameter)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = run(chain)
    assert(labels.size == 64)
    assert(labels.values.toSet == Set(0L), "every node labeled with the chain min")
    assert(rounds <= 16, s"star contraction must beat diameter 63, took $rounds rounds")
  }

  test("random graph matches a union-find oracle") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.tabulate(120)(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).filter(e => e._1 != e._2)
    val (labels, _) = run(edges)
    val expected = unionFind(80, edges)
    assert(labels == expected)
  }

  test("property: random graphs match union-find (6 seeds, varied density)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    for (seed <- 1 to 6) {
      val nNodes = 20 + seed * 15
      val nEdges = seed * 30
      val gen = Gen.listOfN(nEdges, Gen.zip(
        Gen.choose(0L, nNodes.toLong), Gen.choose(0L, nNodes.toLong)))
      val edges = gen.apply(params, Seed(seed.toLong)).get.filter(e => e._1 != e._2)
      val (labels, rounds) = run(edges)
      assert(labels == unionFind(nNodes.toLong, edges), s"seed $seed")
      assert(rounds <= 20, s"seed $seed took $rounds rounds")
    }
  }

  test("disjoint pairs and singleton-free output") {
    // components {1,2}, {5,9}, {7}-less: nodes appear only via edges
    val (labels, rounds) = run(Seq((2L, 1L), (9L, 5L), (5L, 9L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 9L -> 5L))
    assert(rounds <= 4)
  }

  test("fast path ≡ distributed rounds on random graphs (5 seeds) and runs 0 rounds") {
    val rnd = new scala.util.Random(7)
    for (seed <- 1 to 5) {
      rnd.setSeed(seed * 97L)
      val n = 30 + rnd.nextInt(60)
      val edges = Seq.tabulate(40 + rnd.nextInt(120))(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val (fast, fastRounds) = runFast(edges)
      val (dist, _) = run(edges)
      assert(fast == dist, s"seed $seed: fast path diverged from star rounds")
      assert(fastRounds == 0, s"seed $seed: expected the pre-loop switchover")
    }
  }

  test("mid-loop switchover: bound between initial and contracted edge count finishes locally") {
    // K40: 780 initial distinct edges, star fixpoint has 39. A bound of 300
    // forces ≥1 distributed round (780 > 300), then the first round's
    // contraction (a complete graph stars in one round) drops under the
    // bound BEFORE the convergence signature stabilizes — the local finish
    // runs mid-loop, and labels must still be the component min
    val k40 = for { a <- 0L until 40L; b <- (a + 1) until 40L } yield (a, b)
    val (labels, rounds) = withKnob(Some("300")) {
      import spark.implicits._
      val (l, r) = Dedup.connectedComponentsWithRounds(k40.toDF("a", "b"))
      (l.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap, r)
    }
    assert(labels.size == 40)
    assert(labels.values.toSet == Set(0L))
    assert(rounds >= 1, "bound below the initial count must run distributed rounds first")
  }
}
