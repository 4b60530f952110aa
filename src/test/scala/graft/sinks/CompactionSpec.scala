package graft.sinks

import java.nio.file.Files
import graft.{Fixtures, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must shrink the file count to the byte-target plan while
  * leaving the table's contents bit-identical for readers.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet"))

  test("compaction reduces files to the byte target and preserves contents") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val events = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(16).write.parquet(dir)
    assert(parquetFiles(dir).size == 16)
    val before = events.orderBy("event_id").collect().toSeq

    val totalBytes = parquetFiles(dir).map(_.length).sum
    val n = Sinks.compact(spark, dir, targetBytes = totalBytes / 3)
    assert(n >= 3 && n <= 4, s"expected ~3 target files, planned $n")
    assert(parquetFiles(dir).size == n)
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles.exists(_.getName.contains(".compact.")),
      "staging dirs must be cleaned up after the swap")

    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before, "compaction must not change a single row")
  }

  test("partitioned layouts compact per leaf, preserving directories and pruning") {
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    val events = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(8).write.partitionBy("event_type").parquet(dir)
    val partDirs = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(partDirs.nonEmpty)
    val before = spark.read.parquet(dir)
      .orderBy("event_id").collect().toSeq

    Sinks.compact(spark, dir, targetBytes = Long.MaxValue) // 1 file per leaf
    val partDirsAfter = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(partDirsAfter.toSeq == partDirs.toSeq,
      "partition directories must survive compaction")
    for (p <- partDirsAfter)
      assert(parquetFiles(s"$dir/$p").size == 1, s"leaf $p should be one file")
    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before,
      "rows incl. the partition column must be unchanged")
  }

  test("re-run after a crash between the two swap renames restores the table") {
    // the crash window: rename(dir, old) succeeded, rename(tmp, dir) never
    // ran — the live dir is ABSENT and all data sits in the hidden .old
    val base = Files.createTempDirectory("graft-compact-crash").toString
    val dir = base + "/t"
    val events = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(4).write.parquet(dir)
    val before = events.orderBy("event_id").collect().toSeq
    assert(new java.io.File(dir).renameTo(new java.io.File(base + "/.t.compact.old")))
    new java.io.File(base + "/.t.compact.tmp").mkdirs() // stale staging too
    val n = Sinks.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(n == 1)
    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before, "recovered table must carry every pre-crash row")
    assert(!new java.io.File(base).listFiles.exists(_.getName.contains(".compact.")),
      "recovery must leave no staging dirs behind")
  }

  test("a partition stranded in .old by a crash is restored, not compacted as a phantom leaf") {
    val dir = Files.createTempDirectory("graft-compact-crashp").toString + "/t"
    val events = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(4).write.partitionBy("event_type").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    val parts = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("event_type=")).map(_.getName).sorted
    val victim = parts.head
    // crash window for one leaf: live partition dir gone, data in .old
    assert(new java.io.File(s"$dir/$victim")
      .renameTo(new java.io.File(s"$dir/.$victim.compact.old")))
    Sinks.compact(spark, dir, targetBytes = Long.MaxValue)
    val partsAfter = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(partsAfter.toSeq == parts.toSeq,
      s"stranded partition $victim must be restored into place")
    assert(!new java.io.File(dir).listFiles.exists(_.getName.contains(".compact.")),
      "no hidden staging dirs may survive — phantom-leaf hazard")
    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before, "no partition's rows may be lost across crash + re-run")
  }

  test("a compacted streaming-dedup index keeps gating correctly") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft-compact-idx").toString + "/idx"
    val batch0 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    graft.streaming.DedupStream.dedupBatch(batch0, indexDir, 0.8, batchId = 0L)
    // the long-lived index is exactly the table a compaction job maintains
    Sinks.compact(spark, s"$indexDir/sigs", targetBytes = Long.MaxValue)
    Sinks.compact(spark, s"$indexDir/shingles", targetBytes = Long.MaxValue)
    // near-identical doc in a later batch must still be flagged against
    // the compacted index (batch= partitions and their column survive)
    val batch1 = Seq((2L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val flagged = graft.streaming.DedupStream.dedupBatch(batch1, indexDir, 0.5, batchId = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.toSeq == Seq((2L, 1L)),
      "doc 2 must match corpus doc 1 through the compacted index")
  }
}
