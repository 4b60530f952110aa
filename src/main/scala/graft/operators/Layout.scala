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

  // ---------------------------------------------------------------- q126
  // Deterministic hash-sharded training-shard MANIFEST — the artifact a
  // dataloader consumes: which shard holds which documents, in what order,
  // with counts for scheduling and an order fingerprint for integrity.
  //
  // Sharding is by md5-key HASH, not by global rank: rank-sharding needs a
  // total order (a global sort + a single-partition row_number — the exact
  // driver-bottleneck shape this engine bans), while hash-sharding is one
  // narrow map + one shard-keyed aggregate and still gives the two
  // properties a training run needs — (a) a document's shard never changes
  // under corpus growth (same stability argument as q64's md5 split), and
  // (b) within-shard read order (by md5 key) is a deterministic global
  // shuffle of the corpus, de-correlating neighboring source documents.
  // Shard sizes concentrate at n/NumShards (multinomial, ±√ relative) —
  // the manifest's n_docs/n_tokens columns are exactly what a scheduler
  // checks that against.
  //
  // Scale shape: per-doc key + token count are narrow map-side work; the
  // single shuffle is the 16-way shard aggregate. The ordered-id
  // fingerprint uses collect_list + array_sort per shard — bounded by
  // shard size; at 100 TB you shard to O(corpus/target-shard-bytes) shards
  // so the per-shard list stays bounded (and the fingerprint would move to
  // a streaming hash over the shard's file write, same value, no list).
  // All arithmetic is md5-parity, so the manifest — including the order
  // fingerprint — hash-matches the oracle end to end.
  private val NumShards = 16

  /** The manifest's shard assignment for a doc id — ONE copy of the
    * cross-engine-sensitive md5-prefix formula, shared by the manifest and
    * by [[graft.Pipeline]]'s corpus writer so written partitions and
    * manifest rows can never drift.
    */
  def shardKey(idCol: org.apache.spark.sql.Column, numShards: Int): org.apache.spark.sql.Column =
    (conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("long") % numShards).cast("int")

  /** Manifest over any (doc_id, text) corpus view; see q126 scaladoc. */
  def shardManifest(docs: DataFrame, numShards: Int = NumShards): DataFrame = {
    val key = md5(col("doc_id").cast("string"))
    docs
      .select(col("doc_id"), key.as("k"),
        size(graft.functions.TextFunctions.wsTokens(col("text"))).cast("long").as("nt"))
      .withColumn("shard", shardKey(col("doc_id"), numShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        min(col("k")).as("first_key"), max(col("k")).as("last_key"),
        graft.functions.TextFunctions.hash60(concat_ws(",",
          transform(array_sort(collect_list(struct(col("k"), col("doc_id")))),
            e => e.getField("doc_id").cast("string")))).as("order_fp"))
      .orderBy(col("shard"))
  }

  private def q126(s: SparkSession, dir: String): DataFrame =
    shardManifest(Fixtures.documents(s, dir))

  private val q126Sql =
    s"""WITH d AS (
       |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, k, nt,
       |    CAST(('0x' || substr(k, 1, 4))::BIGINT % $NumShards AS INT) AS shard
       |  FROM d)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
       |  MIN(k) AS first_key, MAX(k) AS last_key,
       |  ('0x' || substr(md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k, doc_id)), 1, 15))::BIGINT AS order_fp
       |FROM sh GROUP BY shard ORDER BY shard""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q70_zorder_ranges", q70, Some(q70Sql)),
    GraftQuery("q126_shard_manifest", q126, Some(q126Sql)))
}
