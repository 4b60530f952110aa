package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning — [EXT]: the engine-facing wrapper around
  * Spark's own runtime-filter machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the codegen'd expressions behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
  * explicit operator for when the optimizer can't see the opportunity —
  * e.g. the filter is built in one job and applied in another, or the
  * build side is the output of a non-equi pipeline stage.
  *
  * The 100-TB shape: a semi-join whose "small" side has millions of keys
  * is too big to broadcast as rows, but its bloom filter is a few MB —
  * build it with one distributed aggregate, ship the bytes, and drop
  * non-matching rows of the big side BEFORE the shuffle the exact join
  * needs. Bloom filters have no false negatives, so prefilter + exact
  * confirm-join returns exactly the semi-join answer; the false-positive
  * rate only costs shuffled bytes (fpp ~ 3% at the default sizing).
  *
  * `mightContain` requires the filter as a CONSTANT (Spark's analyzer
  * rejects a non-foldable bloom side) — the collect-then-literal round
  * trip here is the same driver hop Spark's `InjectRuntimeFilter` takes
  * via its scalar subquery.
  */
object BloomFilters {

  /** Aggregate Column: serialized bloom filter over `xxhash64(key)`.
    * `numBits` < 0 (the default) sizes at 8 bits/key (~2% false positives,
    * the same ratio Spark's runtime-filter default sizing targets); pass
    * explicitly when the key-cardinality estimate is off or shuffle bytes
    * are worth trading against filter size.
    */
  def bloomAgg(key: Column, numItems: Long, numBits: Long = -1L): Column = {
    val bits = if (numBits > 0) numBits else 8L * numItems
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      ColumnBridge.expression(lit(numItems)),
      ColumnBridge.expression(lit(bits))).toAggregateExpression())
  }

  /** Build the filter bytes from the build side (one distributed agg +
    * a single-row collect — the scalar-subquery hop).
    */
  def build(buildSide: DataFrame, key: Column, numItems: Long,
      numBits: Long = -1L): Array[Byte] =
    buildSide.agg(bloomAgg(key, numItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Predicate Column: `might_contain(filterBytes, xxhash64(key))` —
    * false ⇒ the key is definitely not in the build side.
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(filterBytes)),
      ColumnBridge.expression(xxhash64(key))))

  /** Predicate Column whose bloom side is a SCALAR SUBQUERY over the build
    * frame — fully LAZY: constructing it schedules no job, and the filter
    * build runs as a subquery stage of whatever query consumes the
    * predicate (exactly the plan shape Spark's `InjectRuntimeFilter` emits;
    * `BloomFilterMightContain` accepts a scalar subquery or a constant, by
    * design). Contrast [[mightContain]], whose `build` collects the bytes
    * in a separate driver-side job at construction time.
    *
    * `numItems` must still be a foldable literal, so the lazy form sizes
    * from a caller-supplied ESTIMATE rather than a count. Mis-sizing is
    * benign when the predicate is paired with an exact confirm join:
    * oversizing costs filter bytes, undersizing costs false-positive rate
    * (prefilter selectivity) — a bloom never false-negatives.
    */
  def mightContainLazy(buildSide: DataFrame, buildKey: Column, probeKey: Column,
      numItems: Long, numBits: Long = -1L): Column = {
    val bf = buildSide.agg(bloomAgg(buildKey, numItems, numBits).as("bf")).scalar()
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bf),
      ColumnBridge.expression(xxhash64(probeKey))))
  }

  /** Bloom-accelerated left-semi join: prefilter `big` with the build
    * side's bloom filter, then confirm with the exact semi-join (removes
    * the false positives). Same answer as `big.join(small, cond,
    * "left_semi")`, shuffling only the prefiltered survivors.
    */
  def semiJoin(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      numItems: Long, numBits: Long = -1L): DataFrame = {
    val bytes = build(small, smallKey, numItems, numBits)
    big.filter(mightContain(bytes, bigKey))
      .join(small, bigKey === smallKey, "left_semi")
  }
}
