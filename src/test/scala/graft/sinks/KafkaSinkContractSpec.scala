package graft.sinks

import graft.TestSpark
import graft.functions.BinaryRecordDecode
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka writer's column contract, pinned (reference
  * `Producer.toProducerRecord`, Producer.scala:22-35): key/value bytes,
  * per-row topic/partition routing, typed headers. No broker in the image,
  * so the contract is verified by schema pinning + a write-then-re-read of
  * the projected records (the reference's own tests assert produce results
  * by re-consuming, RecordStreamSpec.scala:30-51).
  */
class KafkaSinkContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // a realistic record set: the kafka-test log re-keyed for producing
  private def records = Sources.kafkaTestBatch(spark, "in", 2, 6)

  test("kafkaRecords projects exactly the writer's column contract") {
    val out = Sinks.kafkaRecords(records,
      key = col("key"), value = col("value"),
      topic = concat(lit("out-"), col("partition")),
      partition = Some(col("partition")),
      headers = Some(array(struct(lit("src").as("key"),
        col("key").as("value")))))
    // nullability is sink-irrelevant; names + types are the contract
    assert(out.schema.fields
      .map(f => f.name -> f.dataType.sql.replace(" NOT NULL", "")).toSeq == Seq(
      "key" -> "BINARY",
      "value" -> "BINARY",
      "topic" -> "STRING",
      "partition" -> "INT",
      "headers" -> "ARRAY<STRUCT<key: STRING, value: BINARY>>"),
      out.schema.treeString)
  }

  test("string key/value are cast to the wire bytes; topics route per row") {
    val src = records.select(
      col("key").cast("string").as("k_str"), col("value"), col("partition"))
    val out = Sinks.kafkaRecords(src, key = col("k_str"), value = col("value"),
      topic = when(col("partition") === 0, lit("t0")).otherwise(lit("t1")))
    val rows = out.collect()
    assert(rows.forall(_.get(0).isInstanceOf[Array[Byte]]), "key is BINARY")
    val topics = rows.map(_.getString(2)).toSet
    assert(topics == Set("t0", "t1"), "per-row dynamic routing")
  }

  test("malformed headers mapping is rejected at build time, not at the broker") {
    val ex = intercept[IllegalArgumentException] {
      Sinks.kafkaRecords(records, col("key"), col("value"), lit("t"),
        headers = Some(array(struct(lit(1).as("key"), lit(2).as("value")))))
    }
    assert(ex.getMessage.contains("headers"))
  }

  test("non-string topic is rejected at build time") {
    val ex = intercept[IllegalArgumentException] {
      Sinks.kafkaRecords(records, col("key"), col("value"), topic = col("partition"))
    }
    assert(ex.getMessage.contains("topic"))
  }

  test("projected records survive a write-and-re-read bit-for-bit (A12 re-consume check)") {
    val dir = Files.createTempDirectory("graft-kafka-sink").toString
    val out = Sinks.kafkaRecords(records,
      key = col("key"), value = col("value"), topic = lit("out"),
      partition = Some(col("partition")))
    out.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // the value bytes still decode with the record codec — nothing was
    // stringified or re-encoded on the way through the sink projection
    val decodedBack = back
      .select(col("partition"), col("key").cast("string").cast("long").as("uid"),
        BinaryRecordDecode.decode(col("value")).as("r"))
      .select(col("partition"), col("uid"), col("r.i"), col("r.k"), col("r.bla"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getInt(3), r.getBoolean(4)))
      .toSet
    val original = records
      .select(col("partition"), col("key").cast("string").cast("long").as("uid"),
        BinaryRecordDecode.decode(col("value")).as("r"))
      .select(col("partition"), col("uid"), col("r.i"), col("r.k"), col("r.bla"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getInt(3), r.getBoolean(4)))
      .toSet
    assert(decodedBack == original && original.nonEmpty)
  }

  test("kafka writer builder resolves options without a broker; start() names the missing jar") {
    val projected = Sinks.kafkaRecords(
      Sources.kafkaTestStream(spark, "in", 2, 6),
      key = col("key"), value = col("value"), topic = lit("out"))
    val writer = Sinks.kafka(projected, "localhost:9092", "out",
      Files.createTempDirectory("graft-kafka-ckpt").toString)
    val ex = intercept[Exception] { writer.start() }
    assert(ex.getMessage.toLowerCase.contains("kafka"),
      s"failure must name the kafka format: ${ex.getMessage}")
  }
}
