package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scala reference interleave: column j's bit i → position i*n + j. */
  private def zRef(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for { (v, j) <- vals.zipWithIndex; i <- 0 until bits }
      yield ((v >> i) & 1L) << (i * n + j)).reduce(_ | _)
  }

  test("zValue matches the reference interleave over the 2x10-bit domain sample") {
    import spark.implicits._
    val pairs = for (x <- 0 until 1024 by 31; y <- 0 until 1024 by 37)
      yield (x.toLong, y.toLong)
    val df = pairs.toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 10))
    val got = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- pairs)
      assert(got((x, y)) === zRef(Seq(x, y), 10), s"($x,$y)")
  }

  test("zValue is injective on the bucketed domain (distinct pairs → distinct keys)") {
    import spark.implicits._
    val pairs = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val distinctZ = pairs.toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 10).as("z"))
      .distinct().count()
    assert(distinctZ === pairs.size.toLong)
  }

  test("z-sorted layout keeps both dimensions clustered (range-stat pruning premise)") {
    import spark.implicits._
    // after sorting by z, any contiguous run of 64 rows spans at most a
    // small fraction of each dimension's domain — the property parquet
    // min/max pruning exploits. A lexicographic (x, y) sort would leave y
    // spanning the full domain inside every x-run.
    val pairs = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val sorted = pairs.toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 10))
      .orderBy(col("z")).collect()
    val worstYSpan = sorted.grouped(64).map { g =>
      g.map(_.getLong(1)).max - g.map(_.getLong(1)).min
    }.max
    assert(worstYSpan <= 16, s"z-order should bound per-chunk y-span, got $worstYSpan")
  }

  test("shard manifest covers the corpus, shards are stable, order fingerprint is deterministic") {
    val dir = graft.TestSpark.sf0001
    val m1 = graft.SparkEntry.queries("q126_shard_manifest")(spark, dir).collect()
    val nDocs = graft.Fixtures.documents(spark, dir).count()
    // complete partition of the corpus, no empty shards at fixture size
    assert(m1.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(m1.length === 16 && m1.forall(_.getAs[Long]("n_docs") > 0))
    // key ranges are internally consistent
    assert(m1.forall(r => r.getAs[String]("first_key") <= r.getAs[String]("last_key")))
    // deterministic: a rerun reproduces every manifest row incl. order_fp
    val m2 = graft.SparkEntry.queries("q126_shard_manifest")(spark, dir).collect()
    assert(m1.map(_.toString).toSeq === m2.map(_.toString).toSeq)
    // shard stability under corpus growth (the q64-split argument): a
    // manifest over HALF the corpus keeps every shard's key range inside
    // the full manifest's range for that shard — no doc moved shards, so
    // per-shard min/max keys can only shrink inward
    import org.apache.spark.sql.functions._
    val half = Layout.shardManifest(
      graft.Fixtures.documents(spark, dir).filter(col("doc_id") % 2 === 0))
      .select(col("shard"), col("first_key").as("f2"), col("last_key").as("l2"))
    val fullM = Layout.shardManifest(graft.Fixtures.documents(spark, dir))
      .select(col("shard"), col("first_key"), col("last_key"))
    assert(fullM.join(half, "shard")
      .filter(col("f2") < col("first_key") || col("l2") > col("last_key"))
      .isEmpty)
  }
}
