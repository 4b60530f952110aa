package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-pipeline bench (verdict-item runner): times
  * [[Pipeline.curateEpoch]] over the shape that discriminates a
  * delta-join epoch from a full per-epoch recompute — ONE large founding
  * epoch (the top 80% of doc_ids) followed by `SPARK_GRAFT_INCR_TAIL`
  * (default 8) SMALL descending slices of the remaining 20%. Descending
  * delivery makes the tail epochs genuinely displace bag keepers and flip
  * span verdicts (the hard, corpus-global path PipelineIncrSpec pins);
  * equal-sized epochs would hide the difference at bench scale, because a
  * recompute over a corpus only a few batches deep still costs about one
  * batch.
  *
  * `SPARK_GRAFT_INCR_SCALE=K` replicates the corpus K× with per-replica
  * token suffixes (every window fingerprint, bag, and doc id becomes
  * replica-unique, so the replicas neither dedup nor span-collide with
  * each other) — the knob that makes ACCUMULATED STATE, not per-epoch
  * fixed overhead, the dominant cost, i.e. the regime where a full
  * recompute's tail epochs grow toward founding time while the delta
  * fold stays flat.
  *
  * Prints ONE JSON line `{"metric":"incr_epochs","founding":s,
  * "tail":[s,...],"jobs":[n,...],"total":s,"docs":n,"sf":...}` — `jobs`
  * counts Spark jobs per epoch (founding first), the fixed-overhead
  * driver the round-11 verdict asked to make visible.
  *
  * `SPARK_GRAFT_INCR_REGATE=1` runs the whole sequence GATE-ON (a
  * 4-doc benchmark drawn from the corpus) and finishes with a
  * [[Pipeline.regate]] to a revised benchmark — the declared O(corpus)
  * revision pass — adding `"regate":s,"regate_jobs":n` to the line, so
  * its wall-clock can be compared against the founding epoch at each
  * corpus scale.
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tailN = sys.env.getOrElse("SPARK_GRAFT_INCR_TAIL", "8").toInt.max(1)
    val scale = sys.env.getOrElse("SPARK_GRAFT_INCR_SCALE", "1").toInt.max(1)
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Fixtures.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val docs =
      if (scale == 1) raw
      else raw
        .withColumn("r", explode(sequence(lit(0L), lit(scale - 1L))))
        .select((col("doc_id") * scale + col("r")).as("doc_id"),
          col("lang"), col("source"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("r"))), " ").as("text"))
        .localCheckpoint() // fix the replicated corpus once, off the plan
    val nDocs = docs.count() // also warms footers/JIT
    val cuts = docs.stat.approxQuantile("doc_id",
      (0 to tailN).map(i => 0.2 * i / tailN).toArray, 0.001).map(_.toLong)
    // founding epoch = [p20, inf); tail epochs walk the quantile cuts DOWN
    val ranges: Seq[(Long, Long)] =
      (cuts.last, Long.MaxValue) +:
        (tailN - 1 to 0 by -1).map(i =>
          (if (i == 0) Long.MinValue else cuts(i), cuts(i + 1)))
    val out = java.nio.file.Files.createTempDirectory("graft-incrbench").toString
    val jobsSeen = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobsSeen.incrementAndGet()
      })
    // onJobStart arrives on the async listener-bus thread — poll until
    // the counter goes quiet before reading an epoch's delta, or jobs
    // still queued on the bus would be attributed to NO epoch's window
    // capped: a pathological event trickle (a background job per poll
    // interval) skews the attribution instead of hanging the bench
    def drained(): Long = {
      var prev = -1L
      var spins = 0
      while (prev != jobsSeen.get && spins < 300) {
        prev = jobsSeen.get; Thread.sleep(100); spins += 1
      }
      jobsSeen.get
    }
    val regateOn = sys.env.get("SPARK_GRAFT_INCR_REGATE").contains("1")
    val bench1 =
      if (!regateOn) None
      else Some(docs.filter(size(split(col("text"), " ")) >= 8)
        .orderBy(col("doc_id")).limit(4)
        .select(col("doc_id"), col("text")).localCheckpoint())
    val runs = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      val chunk = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val j0 = drained()
      val t0 = System.nanoTime()
      Pipeline.curateEpoch(chunk, out, 16, i.toLong, bench1)
      ((System.nanoTime() - t0) / 1e9, drained() - j0)
    }
    val regateCell =
      if (!regateOn) ""
      else {
        val bench2 = spark.read.parquet(s"$out/corpus")
          .filter(size(split(col("text"), " ")) >= 8)
          .orderBy(col("doc_id").desc).limit(4)
          .select(col("doc_id"), col("text")).localCheckpoint()
        val j0 = drained()
        val t0 = System.nanoTime()
        Pipeline.regate(spark, out, bench2, ranges.size.toLong)
        val s = (System.nanoTime() - t0) / 1e9
        s""","regate":${f"$s%.3f"},"regate_jobs":${drained() - j0}"""
      }
    val times = runs.map(_._1)
    println(s"""{"metric":"incr_epochs","founding":${f"${times.head}%.3f"},"tail":[${
      times.tail.map(t => f"$t%.3f").mkString(",")}],"jobs":[${
      runs.map(_._2).mkString(",")}],"total":${
      f"${times.sum}%.3f"},"docs":$nDocs$regateCell,"sf":"$sfDir"}""")
    spark.stop()
  }
}
