package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): per-query empirical breakdown — job
  * count, stage count, task count, shuffle read/write bytes, and the
  * wall-clock of every job — for the queries selected by `SPARK_GRAFT_ONLY`.
  * This is the guide-§1 "where is the time actually going" measurement for
  * multi-job (iterative / checkpointing) queries where a plan dump alone
  * can't show the cost: each localCheckpoint / checkpoint / collect is its
  * own job, invisible in the final DataFrame's plan.
  *
  * Prints one line per job (duration, stages, tasks, shuffle R/W) and a
  * per-query total. Runs each query `SPARK_GRAFT_REPS` times (default 2) and
  * reports the LAST rep (warm caches, JIT) — the steady-state shape.
  */
object QueryProbe {
  private final class Acc extends SparkListener {
    case class Job(id: Int, t0: Long, var t1: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0,
        var shufR: Long = 0L, var shufW: Long = 0L, var desc: String = "")
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    private val stageToJob = new scala.collection.mutable.HashMap[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val j = Job(e.jobId, e.time)
      j.desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs(e.jobId) = j
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
        j.stages += 1
        j.tasks += si.numTasks
        j.shufR += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        j.shufW += si.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.tableNames.foreach(t => Fixtures.table(spark, sfDir, t).count())
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(o => o(n) || o(n.takeWhile(_ != '_'))) }
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      var t = 0.0
      (1 to reps).foreach { r =>
        spark.catalog.clearCache()
        acc.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        t = (System.nanoTime() - t0) / 1e9
      }
      // listener events are async: drain the bus before reading the
      // accumulator (a fixed sleep races on a loaded box — ADVICE r14).
      // waitUntilEmpty is private[spark], which is public at the bytecode
      // level; the sleep stays as a fallback if the internals move.
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case scala.util.control.NonFatal(_) => Thread.sleep(300) }
      println(f"== $name%s  wall=${t}%.3f s  jobs=${acc.jobs.size}%d")
      acc.jobs.values.foreach { j =>
        println(f"   job ${j.id}%4d  ${(j.t1 - j.t0) / 1000.0}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d  shufR=${j.shufR / 1024}%8d KiB shufW=${j.shufW / 1024}%8d KiB  ${j.desc.take(60)}%s")
      }
    }
    spark.stop()
  }
}
