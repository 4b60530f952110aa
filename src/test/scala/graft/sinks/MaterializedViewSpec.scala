package graft.sinks

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import graft.streaming.{Event, LatestByKeyStream, LatestRow}
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end materialized-view maintenance: changelog stream →
  * transformWithState latest fold → foreachBatch `upsertView` → a
  * key-hash-partitioned parquet snapshot that always equals the batch
  * answer. This is the reference's "changelog → queryable table" story with
  * the table persisted OUTSIDE the state store, queryable by any reader.
  */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("foreachBatch-maintained view equals the batch latest-by-key fold") {
    import spark.implicits._
    val replayDir = Files.createTempDirectory("graft-mv-replay").toString
    val ckpt = Files.createTempDirectory("graft-mv-ckpt").toString
    val viewPath = Files.createTempDirectory("graft-mv").toString + "/view"
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value").as[Event]
      .repartition(4)
      .write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
      .as[Event]
    val q = LatestByKeyStream.latestTable(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[LatestRow], _: Long) =>
        if (!ds.isEmpty)
          Sinks.upsertView(ds.toDF(), viewPath, "user_id", "last_event_id", 8)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val view = Sinks.readView(spark, viewPath)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("last_event_type"), r.getAs[Long]("last_event_id")))).toMap
    val batch = Fixtures.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"), col("event_id")).as("et"),
        max(col("event_id")).as("id"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(view === batch)
  }

  test("upsertView is idempotent and leaves untouched buckets' files alone") {
    import spark.implicits._
    val viewPath = Files.createTempDirectory("graft-mv2").toString + "/view"
    def rows(xs: (Long, String, Long)*) =
      xs.toSeq.toDF("user_id", "last_event_type", "last_event_id")
    // seed: keys spread over buckets
    Sinks.upsertView(rows((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 1L)),
      viewPath, "user_id", "last_event_id", 8)
    val before = new java.io.File(viewPath).listFiles().filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.lastModified())).toSet).toMap
    // update ONLY key 1 — exactly key 1's bucket may change
    val delta = rows((1L, "z", 9L))
    Sinks.upsertView(delta, viewPath, "user_id", "last_event_id", 8)
    val after = new java.io.File(viewPath).listFiles().filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.lastModified())).toSet).toMap
    val changed = before.keySet.filter(k => before(k) != after.getOrElse(k, Set.empty))
    assert(changed.size <= 1, s"only key 1's bucket may be rewritten, got $changed")
    // last-write-wins applied
    val v1 = Sinks.readView(spark, viewPath).filter(col("user_id") === 1)
      .collect().map(r => (r.getAs[String]("last_event_type"), r.getAs[Long]("last_event_id")))
    assert(v1.toSeq === Seq(("z", 9L)))
    // idempotent: reapplying the same delta changes nothing
    Sinks.upsertView(delta, viewPath, "user_id", "last_event_id", 8)
    val again = Sinks.readView(spark, viewPath)
      .collect().map(_.toString).sorted
    assert(again.length === 4)
    val v1b = Sinks.readView(spark, viewPath).filter(col("user_id") === 1)
      .collect().map(r => (r.getAs[String]("last_event_type"), r.getAs[Long]("last_event_id")))
    assert(v1b.toSeq === Seq(("z", 9L)))
  }
}
