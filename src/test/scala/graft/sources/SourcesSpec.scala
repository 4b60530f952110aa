package graft.sources

import graft.{Fixtures, TestSpark}
import graft.operators.LatestByKey
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format coverage: the same changelog through parquet, CSV and
  * JSON-lines scans must materialize the same latest-by-key table.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val base = Fixtures.events(spark, TestSpark.sf0001)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private def latest(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Double, Long)] =
    LatestByKey.materialize(df, "user_id", "event_id", Seq("event_type", "value"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3))))
      .toMap

  test("csv scan materializes the same table as parquet") {
    val dir = Files.createTempDirectory("graft-csv").toString
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Sources.csvBatch(spark, dir, base.schema)
    assert(latest(back) == latest(base))
  }

  test("json scan materializes the same table as parquet") {
    val dir = Files.createTempDirectory("graft-json").toString
    base.write.mode("overwrite").json(dir)
    val back = Sources.jsonBatch(spark, dir, base.schema)
    assert(latest(back) == latest(base))
  }

  test("csv error channel quarantines malformed rows without dropping good ones") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csv-err").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      java.util.Arrays.asList(
        "event_id,user_id,value",
        "1,10,3.5",
        "2,eleven,oops,extra", // malformed: non-numeric key + arity
        "3,12,7.25"))
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val rows = Sources.csvBatchWithErrors(spark, dir, schema)
      .collect().map(r => (Option(r.get(0)), Option(r.get(3)))).toSeq
    assert(rows.count(_._2.isEmpty) == 2, "both well-formed rows parse clean")
    val bad = rows.filter(_._2.isDefined)
    assert(bad.size == 1 && bad.head._2.get.toString.contains("eleven"),
      "the malformed raw line must be preserved in the error channel")
  }

  test("orc scan materializes the same table as parquet, with pushdown intact") {
    val dir = Files.createTempDirectory("graft-orc").toString
    base.write.mode("overwrite").orc(dir)
    val back = Sources.orcBatch(spark, dir)
    assert(latest(back) == latest(base))
    // same pushdown contract as the parquet scans PlanSpec pins
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("user_id"),
      s"ORC scan must push the key filter:\n${plan.take(600)}")
  }

  test("kafka source builders construct without a broker (plan-time only)") {
    // No connector jar in this image: building the reader must not throw
    // until .load() resolves the format. Subscription variants compile and
    // carry the right options; the load() failure names the missing source.
    val ex = intercept[Exception] {
      Sources.kafkaStream(spark, "localhost:9092",
        Subscription.Topics(List("t1", "t2")), maxOffsetsPerTrigger = Some(1000))
    }
    assert(ex.getMessage.toLowerCase.contains("kafka"))
  }
}
