package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): writes `.explain("formatted")` for every
  * declared query to `$SPARK_GRAFT_PLAN_DIR/<name>_<SPARK_GRAFT_PLAN_TAG>.txt`
  * so plan-shape claims in OPTIMIZATION_r*.md are checkable without running
  * Spark. `SPARK_GRAFT_ONLY` filters queries exactly like Bench. Building a
  * DataFrame runs any eager work inside the operator (localCheckpoint loops,
  * SignalStore materialization), so the dump doubles as a smoke run; the
  * plan written is the final returned DataFrame's initial physical plan
  * (AQE `isFinalPlan=false`), which is where Exchange counts, join
  * strategies, and PushedFilters live.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default to a scratch dir, NOT a round's committed artifact dir — a
    // forgotten env var must not silently mix new dumps into a past round's
    // record (ADVICE r14)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/dev")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(o => o(n) || o(n.takeWhile(_ != '_'))) }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch {
        case e if scala.util.control.NonFatal(e) =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
