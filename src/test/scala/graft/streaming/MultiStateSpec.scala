package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** A24 — column families: one StatefulProcessor with TWO named state
  * variables (the reference's PolyKVStore.scala:85-106 named handles over
  * one RocksDB). Asserts the streamed result equals the batch twin AND that
  * the state-store reader exposes each variable independently.
  */
class MultiStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(): Seq[Event] = {
    import spark.implicits._
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value").as[Event]
      .collect().toSeq
  }

  test("two state variables fold together and read back per variable") {
    import spark.implicits._
    val all = events()
    val replayDir = Files.createTempDirectory("graft-ms-replay").toString
    val ckpt = Files.createTempDirectory("graft-ms-ckpt").toString
    all.toDS().repartition(2).write.mode("append").parquet(replayDir)

    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[Event]
    val acc = TrieMap.empty[Long, ProfileRow]
    val q = LatestByKeyStream.profileTable(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[ProfileRow], _: Long) =>
        ds.collect().foreach(r => acc(r.user_id) = r)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    // batch twin
    val expected = all.groupBy(_.user_id).map { case (k, es) =>
      val last = es.maxBy(_.event_id)
      k -> ProfileRow(k, last.event_type, last.event_id,
        es.size.toLong, es.map(e => math.round(e.value * 100)).sum)
    }
    assert(acc.size == expected.size)
    expected.foreach { case (k, exp) => assert(acc(k) == exp, s"key $k") }

    // per-column-family reads: each state variable scans independently
    val latestState = spark.read.format("statestore")
      .option("stateVarName", "latest").load(ckpt)
      .selectExpr("key.value AS user_id", "value.last_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val statsState = spark.read.format("statestore")
      .option("stateVarName", "stats").load(ckpt)
      .selectExpr("key.value AS user_id", "value.n_events", "value.sum_cents")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(latestState.size == expected.size)
    assert(statsState.size == expected.size)
    expected.foreach { case (k, exp) =>
      assert(latestState(k) == exp.last_event_id, s"latest CF key $k")
      assert(statsState(k) == ((exp.n_events, exp.sum_cents)), s"stats CF key $k")
    }
  }

  test("MapState column family: per-user event-type counts match the batch pivot") {
    import spark.implicits._
    val all = events()
    val replayDir = Files.createTempDirectory("graft-mc-replay").toString
    val ckpt = Files.createTempDirectory("graft-mc-ckpt").toString
    all.toDS().repartition(2).write.mode("append").parquet(replayDir)

    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[Event]
    val acc = TrieMap.empty[(Long, String), Long]
    val q = LatestByKeyStream.typeCounts(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: Dataset[TypeCount], _: Long) =>
        ds.collect().foreach(r => acc((r.user_id, r.event_type)) = r.n)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val expected = all.groupBy(e => (e.user_id, e.event_type))
      .map { case (k, es) => k -> es.size.toLong }
    assert(acc.toMap == expected)

    // the map-state column family materializes one entry per (key, map-key)
    val state = spark.read.format("statestore")
      .option("stateVarName", "type_counts").load(ckpt)
    assert(state.count() == expected.size.toLong)
  }
}
