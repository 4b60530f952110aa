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

  test("streaming frequent-items top-k equals the batch heavy hitters (exact regime)") {
    val replayDir = Files.createTempDirectory("graft-topk").toString
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text", "lang")
    docs.repartition(4).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema

    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val agg = stream
      .select(explode(split(col("text"), " ")).as("term"))
      .agg(call_function("approx_top_k", col("term"), lit(10), lit(1024)).as("tk"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("topk_out").start()
    q.processAllAvailable()
    val streamed = spark.table("topk_out")
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()

    val batch = Fixtures.documents(spark, TestSpark.sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity ≫ vocabulary → sketch counts are exact; the top-10 SETS must
    // match (no boundary tie at rank 10 in the fixtures)
    assert(streamed === batch)
  }

  test("a pre-built bloom filter gates a stream in-flight (contamination drop)") {
    import graft.functions.BloomFilters
    val replayDir = Files.createTempDirectory("graft-bloomgate").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(4).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema

    // "benchmark" side: the static blocklist whose members must not pass
    val blocked = Fixtures.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "error").select(col("event_id")).distinct()
    val bytes = BloomFilters.build(blocked, col("event_id"), 10000L, 80000L)

    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .filter(!BloomFilters.mightContain(bytes, col("event_id")))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("bloomgate_out").start()
    q.processAllAvailable()
    val passed = spark.table("bloomgate_out")
      .select(col("event_id"))
      .collect().map(_.getLong(0)).toSet
    q.stop()

    val blockedSet = blocked.collect().map(_.getLong(0)).toSet
    assert(passed.intersect(blockedSet).isEmpty,
      "no blocklisted event may pass the gate (bloom has no false negatives)")
    assert(passed.nonEmpty,
      "the gate must not drop everything (false-positive rate is bounded)")
  }
}
