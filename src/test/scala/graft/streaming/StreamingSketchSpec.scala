package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable sketches in Structured Streaming: an HLL sketch aggregation
  * over a replayed stream must converge to the batch answer — the merge
  * path exercised across micro-batch boundaries (state-store sketch buffer
  * merged with each batch's partial) is exactly the cross-partition /
  * cross-day merge a 100 TB rollup relies on. At fixture cardinality the
  * sketch is in exact mode, so estimates must EQUAL the batch run, not just
  * approximate it.
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming HLL distinct-user estimates equal the batch sketch per event type") {
    val replayDir = Files.createTempDirectory("graft-sketch").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // several files → several micro-batches → state-store sketch merges
    ev.repartition(4).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema

    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val agg = stream.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(col("event_type"), hll_sketch_estimate(col("sk")).cast("long").as("est"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sketch_out").start()
    q.processAllAvailable()
    val streamed = spark.table("sketch_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()

    val batch = Fixtures.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).cast("long").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming theta sketch estimates equal the batch run (exact mode)") {
    val replayDir = Files.createTempDirectory("graft-theta").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(4).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema

    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val agg = stream.groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
      .select(col("event_type"), theta_sketch_estimate(col("sk")).as("est"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("theta_out").start()
    q.processAllAvailable()
    val streamed = spark.table("theta_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()

    val batch = Fixtures.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"))
      .agg(theta_sketch_estimate(theta_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
