package graft

/** Ad-hoc plan probe (not a test): `Test/runMain graft.PlanProbe qname`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = Engine.session(8, "plan-probe")
    s.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(s, TestSpark.sf0001)
        .queryExecution.executedPlan.toString)
    }
    s.stop()
  }
}
