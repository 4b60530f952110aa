package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[VectorMean]]: one embedding vector. */
case class VecIn(v: Array[Float])

/** Element-wise accumulation buffer: exact scaled-long component sums plus
  * the member count (product-encodable — no kryo, no opaque binary state).
  * `s` is empty until the first vector fixes the dimensionality.
  */
case class VecSumBuf(s: Array[Long], n: Long)

/** Element-wise vector mean as a PARTIAL AGGREGATE — the centroid step of
  * IVF/k-means without exploding vectors into (pos, value) rows.
  *
  * The explode formulation shuffles corpus × dims rows to compute nlist
  * centroids; at 100 TB that shuffle IS the job. This aggregator combines
  * map-side like any hash aggregate: each task keeps one dims-long buffer
  * per group, so the wire carries nlist × partitions buffers — independent
  * of corpus size — and the merge is a dims-length array add.
  *
  * Determinism: components accumulate as round(x·10^scale) LONGS — exact,
  * order-free sums (same contract as [[VectorFunctions.dotDec]]'s decimal
  * accumulation, in codegen-friendly integer arithmetic). The mean divides
  * once in double and narrows to float, so the result is identical for
  * every partitioning and merge order. Long range: |x|·10^9 ≲ 2^33 per
  * element leaves room for ~2^30 members per group before overflow —
  * beyond any real cell population; a production guard would shard groups
  * first.
  *
  * Usage: `udaf(new VectorMean(9), Encoders.product[VecIn])` applied to
  * the embedding column (cf. Similarity.refineCentroids).
  */
class VectorMean(scale: Int) extends Aggregator[VecIn, VecSumBuf, Array[Float]] {
  require(scale >= 0 && scale <= 12, s"scale out of range: $scale")
  private val factor = math.pow(10, scale)

  override def zero: VecSumBuf = VecSumBuf(Array.empty, 0L)

  override def reduce(b: VecSumBuf, in: VecIn): VecSumBuf = {
    val v = in.v
    val s = if (b.s.length == 0) new Array[Long](v.length) else b.s
    require(s.length == v.length,
      s"ragged vectors in one group: ${s.length} vs ${v.length}")
    var i = 0
    while (i < v.length) {
      s(i) += math.round(v(i).toDouble * factor)
      i += 1
    }
    VecSumBuf(s, b.n + 1)
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    if (a.s.length == 0) b
    else if (b.s.length == 0) a
    else {
      require(a.s.length == b.s.length,
        s"ragged vectors across groups: ${a.s.length} vs ${b.s.length}")
      val s = a.s
      var i = 0
      while (i < s.length) { s(i) += b.s(i); i += 1 }
      VecSumBuf(s, a.n + b.n)
    }
  }

  override def finish(r: VecSumBuf): Array[Float] = {
    val out = new Array[Float](r.s.length)
    var i = 0
    while (i < out.length) {
      out(i) = (r.s(i).toDouble / factor / r.n).toFloat
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
