package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.operators.LatestByKey
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming enrichment join (reference A23 in its native form: per-element
  * table lookup against a materialized table,
  * ReadOnlyTableSpec.scala:77-79): a click stream joined per micro-batch
  * against the static latest-by-key view must produce the batch q5 answer.
  */
class StreamingEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-static enrichment join equals batch enrichment") {
    val replayDir = Files.createTempDirectory("graft-enrich").toString
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
      .repartition(3).write.mode("overwrite").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema

    val table = LatestByKey.table(spark, TestSpark.sf0001).scan
      .select(col("user_id"), col("last_value"))
    val clicks = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"))
    val enriched = clicks.join(table, Seq("user_id"), "left")

    val acc = scala.collection.concurrent.TrieMap.empty[Long, Option[Double]]
    val q = enriched.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          acc(r.getAs[Long]("event_id")) =
            if (r.isNullAt(r.fieldIndex("last_value"))) None
            else Some(r.getAs[Double]("last_value")))
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val batch = graft.SparkEntry.queries("q5_enrich_join")(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(acc.size == batch.size)
    batch.foreach { case (eid, v) =>
      val got = acc(eid).map(x => math.rint(x * 100) / 100)
      assert(got == v, s"event $eid")
    }
  }
}
