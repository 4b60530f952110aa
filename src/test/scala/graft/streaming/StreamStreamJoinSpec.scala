package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream–stream inner join with a watermarked range condition (SURVEY
  * §2.B Joins: the engine capability the reference's lookup-join lacks):
  * click events joined to the same user's purchases within the following
  * 30 minutes. Both sides carry watermarks so the join state is bounded —
  * Spark evicts buffered rows once the watermark passes the range bound,
  * which is what lets this run forever at 100 TB stream rates.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked stream-stream range join equals the batch range join") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def side(kind: String, stream: Boolean) = {
      val src = if (stream) Sources.fileStream(spark, dir, schema, maxFilesPerTrigger = 2)
      else spark.read.parquet(dir)
      src.filter(col("event_type") === kind)
        .select(col("user_id").as(s"${kind}_user"), col("ts").as(s"${kind}_ts"),
          col("event_id").as(s"${kind}_id"))
    }
    def joined(stream: Boolean) = {
      val clicks0 = side("click", stream)
      val purchases0 = side("purchase", stream)
      val (clicks, purchases) =
        if (stream) (clicks0.withWatermark("click_ts", "1 hour"),
          purchases0.withWatermark("purchase_ts", "1 hour"))
        else (clicks0, purchases0)
      clicks.join(purchases,
        col("click_user") === col("purchase_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("purchase_id"))
    }

    val q = joined(stream = true).writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    q.processAllAvailable()
    val streamed = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()

    val batch = joined(stream = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce at least one click→purchase pair")
    // append-mode stream-stream join emits matches as both sides arrive;
    // every batch match within the watermark horizon must be present
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("left-outer stream-stream join emits unmatched rows after watermark passes") {
    val dir = Files.createTempDirectory("graft-ssj-outer").toString
    val ev = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(2).write.mode("append").parquet(dir)
    // sentinel pushes the watermark far past every click's join horizon so
    // unmatched clicks are finalized and emitted with a null purchase side
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 24 * 3600 * 1000L)
    import spark.implicits._
    Seq((999999L, sentinelTs, 999999L, "click", 0.0),
        (999998L, sentinelTs, 999999L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def sides(stream: Boolean) = {
      val src = if (stream) Sources.fileStream(spark, dir, schema, maxFilesPerTrigger = 2)
      else spark.read.parquet(dir)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("purchase_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
      (clicks, purchases)
    }
    val cond = col("click_user") === col("purchase_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")

    val (sc, sp) = sides(stream = true)
    val q = sc.withWatermark("click_ts", "1 hour")
      .join(sp.withWatermark("purchase_ts", "1 hour"), cond, "left_outer")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_out").start()
    q.processAllAvailable()
    val streamed = spark.table("ssj_outer_out")
      .filter(col("click_id") =!= 999999L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()

    val (bc, bp) = sides(stream = false)
    val batch = bc.join(bp, cond, "left_outer")
      .select(col("click_id"), col("purchase_id"))
      .filter(col("click_id") =!= 999999L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(batch.exists(_._2 == -1L), "fixture must contain unmatched clicks")
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("flatMapGroupsWithState fallback reproduces the latest-by-key fold") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val replayDir = Files.createTempDirectory("graft-fmgws").toString
    val ckpt = Files.createTempDirectory("graft-fmgws-ckpt").toString
    val all = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value").as[Event]
    all.repartition(2).write.mode("append").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 2)
      .as[Event]

    val folded = stream.groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestRow, LatestRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[LatestRow]) =>
          var cur = state.getOption.orNull
          rows.foreach { e =>
            if (cur == null || e.event_id > cur.last_event_id)
              cur = LatestRow(key, e.event_type, e.value, e.event_id)
          }
          if (cur == null) Iterator.empty
          else { state.update(cur); Iterator.single(cur) }
      }
    val acc = scala.collection.concurrent.TrieMap.empty[Long, LatestRow]
    val q = folded.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[LatestRow], _: Long) =>
        ds.collect().foreach(r => acc(r.user_id) = r)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val expected = all.collect().groupBy(_.user_id).map { case (k, es) =>
      val last = es.maxBy(_.event_id)
      k -> LatestRow(k, last.event_type, last.value, last.event_id)
    }
    assert(acc.size == expected.size)
    expected.foreach { case (k, exp) => assert(acc(k) == exp, s"key $k") }
  }
}
