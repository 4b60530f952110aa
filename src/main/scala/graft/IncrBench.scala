package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-pipeline bench (verdict-item runner): times
  * [[Pipeline.curateEpoch]] over N descending doc_id quarters of
  * `SPARK_GRAFT_SF_DIR`'s documents table — descending so later epochs
  * genuinely displace bag keepers and flip span verdicts (the hard,
  * corpus-global path, same delivery shape PipelineIncrSpec pins).
  *
  * Prints ONE JSON line `{"metric":"incr_epochs","epochs":[s,...],
  * "total":s,"docs":n,"sf":...}` — the per-epoch wall-times are the
  * number BASELINE.md tracks for the incremental rework (a full
  * per-epoch verdict recompute makes every epoch cost like epoch 0;
  * the delta-join design makes epochs 1..N batch-bound).
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Fixtures.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val nDocs = docs.count() // also warms footers/JIT
    val Array(q1, q2, q3) =
      docs.stat.approxQuantile("doc_id", Array(0.25, 0.5, 0.75), 0.001)
    val ranges: Seq[(Long, Long)] = Seq(
      (q3.toLong, Long.MaxValue), (q2.toLong, q3.toLong),
      (q1.toLong, q2.toLong), (Long.MinValue, q1.toLong))
    val out = java.nio.file.Files.createTempDirectory("graft-incrbench").toString
    val times = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      val chunk = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val t0 = System.nanoTime()
      Pipeline.curateEpoch(chunk, out, 16, i.toLong)
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"metric":"incr_epochs","epochs":[${
      times.map(t => f"$t%.3f").mkString(",")}],"total":${
      f"${times.sum}%.3f"},"docs":$nDocs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
