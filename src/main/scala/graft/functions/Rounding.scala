package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-stable rounding for DOUBLE values.
  *
  * Spark's ROUND(double, n) rounds the double's exact decimal expansion
  * (BigDecimal HALF_UP); DuckDB rounds in floating point. When the true
  * value sits on a half boundary (easy with rational inputs: ratios of
  * counts land on .xxxx5 exactly) the two disagree in the last digit —
  * observed on the sf0.1 fixtures. `floor(x·10ⁿ + 0.5) / 10ⁿ` runs the
  * SAME double ops in both engines, so identical inputs give identical
  * outputs. Oracles must spell the same formula
  * (`floor(x * 1e n + 0.5) / 1e n`).
  *
  * Decimal-typed rounding (exact arithmetic) does not need this — only
  * rounds applied to computed doubles.
  */
object Rounding {
  def stable(c: Column, n: Int): Column = {
    val f = math.pow(10, n) // exact for n ≤ 15
    (floor(c * lit(f) + lit(0.5)).cast("double") / lit(f)).cast("double")
  }
}
