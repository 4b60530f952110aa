ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fs2kafkastreamsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run output goes raw to stdout — without this, sbt prefixes every
// line with "[info] ", which breaks the driver's parse of Bench's JSON line
// (BENCH_r01/r02 both show "parsed": null with the line visible in "tail").
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---------------------------------------------------------------------------
// Parallel forked test groups. One sequential JVM ran the full suite in
// ~55 min wall-clock (measured r15 round open) — dominated by the pipeline
// convergence suites — which is why the round-14 driver verify recorded
// tests_ok=false with no failing test: the run was cut off, not red.
// TestSpark sessions are local[8], so TEST_GROUPS (default 6) forked JVMs
// use the 32-core box instead of idling 24 cores; suites are split across
// groups deterministically (explicit pins for the measured-heavy suites,
// name-hash round-robin for the rest). Each group is its own JVM: no shared
// SparkSession, sys.props, or warehouse state across groups, and the only
// managed-table writer (BucketingSpec) lands in exactly one group.
// TEST_GROUPS=1 restores the sequential run.
val testGroupCount = sys.env.getOrElse("TEST_GROUPS", "6").toInt
// the measured-heavy suites, one per group (times from the r15 round-open
// sequential run); everything else hashes
val pinnedTestGroups: Map[String, Int] = Map(
  "graft.PipelineIncrSpecCommit"   -> 0, // ~405 s of the measured 1436 s
  "graft.PipelineIncrSpecState"    -> 1, // ~560 s
  "graft.PipelineIncrSpecRegate"   -> 2, // ~465 s
  "graft.PipelineIncrPropSpec"     -> 3, // PropSpec total was 487 s, 3-way split
  "graft.PipelineIncrPropGateSpec" -> 4,
  "graft.PipelineIncrPropFoldSpec" -> 5,
  "graft.QueriesSmokeSpec"         -> 3, // 118 s
  "graft.PlanSpec"                 -> 4, // 47 s
  "graft.PipelineSpec"             -> 5,
  "graft.streaming.Scd2StreamSpec" -> 3, // 48 s
  "graft.streaming.StreamingSessionSpec" -> 4, // 41 s
  "graft.streaming.StreamingEmbedDedupSpec" -> 5, // 35 s
  "graft.operators.SemDedupSpec"   -> 3, // 35 s
  "graft.functions.VectorMeanSpec" -> 4, // 33 s
  "graft.sinks.MaterializedViewSpec" -> 5, // 26 s
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = (Test / forkOptions).value
  if (testGroupCount <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(fo)))
  else {
    def groupOf(name: String): Int =
      pinnedTestGroups.getOrElse(name,
        math.abs(name.hashCode.toLong % testGroupCount).toInt)
    tests.groupBy(t => groupOf(t.name)).toSeq.sortBy(_._1).map { case (i, ts) =>
      Tests.Group(s"group-$i", ts, Tests.SubProcess(fo))
    }
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
