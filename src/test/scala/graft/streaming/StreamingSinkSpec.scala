package graft.streaming

import graft.{Fixtures, TestSpark}
import graft.sinks.Sinks
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink path (reference A12): stream → parquet sink with checkpoint, then
  * re-read and compare — the reference's own produce-then-consume test
  * shape (RecordStreamSpec.scala:30-51, multiset equality).
  */
class StreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file stream through parquet sink round-trips the event multiset") {
    val replayDir = Files.createTempDirectory("graft-sink-in").toString
    val outDir = Files.createTempDirectory("graft-sink-out").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val input = Fixtures.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "value")
    input.repartition(3).write.mode("overwrite").parquet(replayDir)
    val schema = spark.read.parquet(replayDir).schema

    val q = Sinks.parquet(
      Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1),
      outDir, ckpt).start()
    q.awaitTermination()

    val back = spark.read.parquet(outDir)
    assert(back.count() == input.count())
    // multiset equality via sorted event ids + content hash
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(md5(concat_ws("|", col("event_id"), col("user_id"),
        col("event_type"), col("value")))).collect().map(_.getString(0)).sorted.toSeq
    assert(sig(back) == sig(input))
  }
}
