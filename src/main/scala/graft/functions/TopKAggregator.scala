package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[TopKByScore]]: an ordering score and the id it ranks. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k buffer as parallel primitive arrays (product-encodable —
  * no kryo, no opaque binary state). Invariant: sorted by (score DESC,
  * id ASC), length ≤ k.
  */
case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Top-k-per-group as a PARTIAL AGGREGATE instead of a window sort — the
  * 100 TB formulation of `ROW_NUMBER() OVER (PARTITION BY g ORDER BY s
  * DESC) <= k`.
  *
  * Spark 4's own best plan for the window form (InferWindowGroupLimit)
  * already prunes to k per group map-side — but only AFTER fully sorting
  * every map partition by (group, score): the partial WindowGroupLimit
  * sits above a Sort of all input rows (see q8's plan), so a 100 TB scan
  * still pays an O(n log n) sort and its spill risk per map task for a
  * k-row answer. This aggregator removes the sort entirely: a ≤k bounded
  * buffer per group per map task (O(n log k), binary-insert, no spill),
  * k rows per (group × partition) across the wire, k-way bounded merge.
  * Skewed groups cost the same as uniform ones. Strict total order
  * (score DESC, id ASC) makes the result deterministic — ROW_NUMBER
  * semantics, not RANK (which is also why Spark cannot infer a group
  * limit when the rank filter is an aggregate the optimizer can't see).
  *
  * Usage: `udaf(new TopKByScore(k), Encoders.product[ScoredId])` applied
  * to the two field columns `(score, id)`, then `posexplode(t.ids)` to
  * re-flatten (cf. Relational q93).
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  /** keep the k best of the (already-sorted) buffer plus one candidate */
  override def reduce(b: TopKBuf, in: ScoredId): TopKBuf = {
    val n = b.ids.length
    if (n == k && !better(in.score, in.id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      // binary-search insertion keeps the buffer sorted without a re-sort
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(b.scores(mid), b.ids(mid), in.score, in.id)) lo = mid + 1
        else hi = mid
      }
      val m = math.min(n + 1, k)
      val ss = new Array[Double](m)
      val is = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, lo)
      System.arraycopy(b.ids, 0, is, 0, lo)
      ss(lo) = in.score
      is(lo) = in.id
      val tail = m - lo - 1
      if (tail > 0) {
        System.arraycopy(b.scores, lo, ss, lo + 1, tail)
        System.arraycopy(b.ids, lo, is, lo + 1, tail)
      }
      TopKBuf(ss, is)
    }
  }

  /** merge two sorted bounded buffers — ≤ 2k element scan */
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val m = math.min(a.ids.length + b.ids.length, k)
    val ss = new Array[Double](m)
    val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b.ids.length ||
        (i < a.ids.length && better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
      if (takeA) { ss(o) = a.scores(i); is(o) = a.ids(i); i += 1 }
      else { ss(o) = b.scores(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKBuf(ss, is)
  }

  override def finish(r: TopKBuf): TopKBuf = r

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
