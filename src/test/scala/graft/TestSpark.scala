package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Engine-configured: UTC, AQE,
  * RocksDB state store, nanosAsLong).
  */
object TestSpark {
  lazy val spark: SparkSession = Engine.session(cores = 8, appName = "graft-test")
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
