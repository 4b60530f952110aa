package graft

/** Scratch scan (not a test): list queries whose physical plan contains a
  * nested-loop or cartesian join. `Test/runMain graft.JoinScan`. */
object JoinScan {
  def main(args: Array[String]): Unit = {
    val s = Engine.session(8, "join-scan")
    s.sparkContext.setLogLevel("ERROR")
    for ((n, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(s, TestSpark.sf0001).queryExecution.executedPlan.toString
        val tags = Seq(
          if (p.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (p.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None).flatten
        if (tags.nonEmpty) println(s"JOINSCAN $n ${tags.mkString(",")}")
      } catch { case e: Throwable => println(s"JOINSCAN $n ERROR ${e.getMessage}") }
    }
    s.stop()
  }
}
