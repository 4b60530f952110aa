package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — [EXT]: multi-dimensional clustering for scan
  * pruning at 100 TB.
  *
  * Z-ordering interleaves the bits of several low-cardinality-bucketed
  * columns into one sort key; sorting (or range-partitioning) the table by
  * that key co-locates rows that are close in EVERY dimension, so min/max
  * footer stats prune parquet row groups for predicates on ANY prefix of
  * the dimensions — the trick behind Delta/Iceberg `ZORDER BY`. The z-value
  * itself is pure codegen'd bit arithmetic (no UDF, no shuffle); the layout
  * job is then `repartitionByRange(zval).sortWithinPartitions(zval)`.
  */
object Layout {

  /** Interleave the low `bits` bits of each column (column j's bit i lands
    * at position `i * n + j`). All inputs must already be bucketed to
    * non-negative ints below 2^bits; total bits must fit a long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 63,
      "need >=1 column, bits >= 1, and interleaved width fitting a signed long")
    val n = cols.size
    val parts = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    parts.reduce(_.bitwiseOR(_))
  }

  // ---------------------------------------------------------------- q70
  // Z-order lineitem on (partkey, suppkey) buckets and report the row count
  // per leading z-range — the histogram a layout job uses to verify that
  // the curve distributes rows evenly before writing range-partitioned
  // files. 10 bits per dimension, top 6 bits of the 20-bit z-value = 64
  // ranges. Bit arithmetic is identical in the oracle, so the result is
  // hash-checked end to end.
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val z = zValue(Seq(pmod(col("l_partkey"), lit(1024)),
      pmod(col("l_suppkey"), lit(1024))), bits = 10)
    Fixtures.lineitem(s, dir)
      .select(shiftright(z, 14).as("z_range"))
      .groupBy(col("z_range")).agg(count(lit(1)).as("n"))
      .orderBy(col("z_range"))
  }

  private val q70Sql = {
    // every term fully parenthesized: DuckDB (like Postgres) gives |, &,
    // << the SAME precedence, left-associative — an unparenthesized
    // `a << 1 | b << 3` chain would shift the accumulated OR again
    val terms = for {
      (c, j) <- Seq("l_partkey % 1024", "l_suppkey % 1024").zipWithIndex
      i <- 0 until 10
    } yield s"(((($c) >> $i) & 1) << ${i * 2 + j})"
    s"""WITH z AS (
       |  SELECT (${terms.mkString(" | ")}) >> 14 AS z_range FROM lineitem)
       |SELECT z_range, COUNT(*) AS n FROM z GROUP BY z_range ORDER BY z_range""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q70_zorder_ranges", q70, Some(q70Sql)))
}
