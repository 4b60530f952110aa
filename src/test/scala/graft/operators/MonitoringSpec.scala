package graft.operators

import java.nio.file.Files
import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Observed metrics must equal what a separate aggregation scan would
  * compute — batch and per-micro-batch — while riding the existing plan.
  */
class MonitoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batch observation equals a direct aggregate, with no extra scan") {
    val events = Fixtures.events(spark, TestSpark.sf0001)
    val (df, obs) = Monitoring.observed(events, "quality",
      Seq(count(lit(1)).as("rows"),
        sum(col("value").cast("decimal(18,4)")).as("sv"),
        count(when(col("event_type").isNull, 1)).as("null_types")))
    val written = df.write.format("noop").mode("overwrite")
    written.save() // the action the metrics ride on
    val row = obs.get
    val direct = events.agg(count(lit(1)), sum(col("value").cast("decimal(18,4)")),
      count(when(col("event_type").isNull, 1))).collect().head
    assert(row("rows") == direct.getLong(0))
    assert(row("sv") == direct.getDecimal(1))
    assert(row("null_types") == direct.getLong(2))
  }

  test("streaming observation sums across micro-batches to the batch totals") {
    val replayDir = Files.createTempDirectory("graft-obs-replay").toString
    val ckpt = Files.createTempDirectory("graft-obs-ckpt").toString
    val events = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(4).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema
    val stream = Monitoring.observedStream(
      Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1),
      "ingest", Seq(count(lit(1)).as("rows")))
    val q = stream.writeStream.format("noop")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    val observed = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingest")))
      .map(_.getAs[Long]("rows")).sum
    assert(observed == events.count(),
      "per-batch observed row counts must add up to the corpus size")
  }
}
