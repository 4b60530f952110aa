package graft.operators

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing contracts: schema of the media table, frame-sample
  * shapes, and the batched mapPartitions decode path (the slot a real codec
  * plugs into).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("blobs table has binary media + typed metadata struct") {
    val b = Multimodal.blobs(Fixtures.documents(spark, TestSpark.sf0001))
    val schema = b.schema
    assert(schema("media").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "n_bytes"))
    val row = b.select(col("media"), col("meta.n_bytes")).head()
    assert(row.getAs[Array[Byte]](0).length == row.getLong(1),
      "n_bytes metadata matches actual blob length (ASCII fixture text)")
  }

  test("frame-sample yields fixed-width frames from the blob head") {
    val b = Multimodal.blobs(Fixtures.documents(spark, TestSpark.sf0001))
      .filter(col("meta.n_bytes") >= 64)
    val f = b.select(col("doc_id"), Multimodal.frames(col("media"), 4, 16).as("fr"))
      .select(col("doc_id"), explode(col("fr")).as("frame"))
    val lengths = f.select(length(col("frame"))).distinct().collect().map(_.getInt(0))
    assert(lengths.toSeq == Seq(16), "all frames are exactly 16 bytes")
    assert(f.count() == b.count() * 4)
  }

  test("resize stub truncates blobs") {
    val b = Multimodal.blobs(Fixtures.documents(spark, TestSpark.sf0001))
    val n = b.select(length(Multimodal.resizeStub(col("media"), 32)).as("l"))
      .agg(max(col("l"))).head().getInt(0)
    assert(n <= 32)
  }

  test("audio window energies equal direct 32-byte window sums (block-overlap decomposition)") {
    // q82 computes each overlapping window as the sum of two adjacent
    // 16-byte block sums — verify against the naive per-window sum on a
    // locally computed reference for real fixture docs.
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
      .filter(col("n_chars") >= 32)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.SparkEntry.queries("q82_audio_windows")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got.keySet === docs.keySet)
    for ((id, text) <- docs) {
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val usable = (bytes.length / 16) * 16
      val wins = (0 to usable - 32 by 16).map(st => bytes.slice(st, st + 32).map(_.toLong).sum)
      assert(got(id)._1 === wins.length.toLong, s"doc $id window count")
      assert(got(id)._2 === wins.sum, s"doc $id total energy")
    }
  }

  test("batched mapPartitions decode emits one decoded row per blob") {
    import spark.implicits._
    val rows = Multimodal.blobs(Fixtures.documents(spark, TestSpark.sf0001))
      .select(col("doc_id"), col("media")).as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeBatched(rows)
    assert(decoded.count() == rows.count())
    val r = decoded.head()
    assert(r.n_bytes > 0 && r.f0 >= 0.0 && r.f0 <= 1.0)
  }
}
