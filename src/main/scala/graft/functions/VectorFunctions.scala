package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Everything is built from codegen'd higher-order functions (`zip_with`,
  * `aggregate`) — no UDF round-trips — so the similarity operators stay
  * inside whole-stage codegen.
  *
  * Cross-engine determinism: float dot products are order-sensitive in the
  * last ulp, and at cluster scale Spark's reduction order is not fixed. So
  * the hash-checked queries use [[dotDec]]: each elementwise product is
  * computed in DOUBLE, rounded to 9 decimals, and summed as DECIMAL(28,12) —
  * exact, order-free, and reproducible bit-for-bit in the DuckDB oracle.
  */
object VectorFunctions {

  private val DEC = DecimalType(28, 12)

  /** Exact decimal dot product (see class doc). */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => round(x.cast(DoubleType) * y.cast(DoubleType), 9).cast(DEC)),
      lit(0).cast(DEC),
      (acc, v) => (acc + v).cast(DEC))

  /** Exact decimal squared L2 norm. */
  def norm2Dec(a: Column): Column = dotDec(a, a)

  /** Cosine similarity in deterministic double math from the decimal parts. */
  def cosineDec(a: Column, b: Column): Column =
    dotDec(a, b).cast(DoubleType) /
      (sqrt(norm2Dec(a).cast(DoubleType)) * sqrt(norm2Dec(b).cast(DoubleType)))

  /** Cosine from a precomputed squared-norm pair (avoids recomputing norms
    * in pairwise joins — compute norms once per side, then join).
    */
  def cosineWithNorms(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast(DoubleType) / (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType)))

  /** Plain double cosine (fast path; NOT hash-checked — used by ANN scoring
    * and prefilters where the oracle is a recall/threshold property, not
    * value equality). Built on the codegen'd [[VectorDot]] expression.
    */
  def cosine(a: Column, b: Column): Column =
    VectorDot.dot(a, b) / (sqrt(VectorDot.dot(a, a)) * sqrt(VectorDot.dot(b, b)))

  /** Double cosine from a precomputed double squared-norm pair. */
  def cosineFast(dot: Column, n2a: Column, n2b: Column): Column =
    dot / (sqrt(n2a) * sqrt(n2b))
}
