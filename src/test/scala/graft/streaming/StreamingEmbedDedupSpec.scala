package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import graft.{Fixtures, SparkEntry, TestSpark}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming embedding near-dup gate must equal a sequential reference
  * simulation of its contract over the same batch boundaries: flag iff
  * bucket-related (q106's OR-LSH candidate relation) with exact cosine ≥ τ
  * to (a) an ACCEPTED vector from an earlier batch, or (b) a smaller-id
  * vector in the same batch. The relation ground truth IS q106's
  * value-oracled pair set, so the batch query oracles the stream.
  */
class StreamingEmbedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeOrderedReplay(replayDir: String, ranges: Seq[(Int, Int)]): Unit = {
    val vecs = Fixtures.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val base = System.currentTimeMillis() - 1000000
    for (((lo, hi), i) <- ranges.zipWithIndex) {
      val tmp = Files.createTempDirectory("graft-edd-part").toString
      vecs.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.toString.endsWith(".parquet")).get
      val dst = Paths.get(replayDir, f"f$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base + i * 10000))
    }
  }

  /** Sequential reference over the gate's contract. */
  private def simulate(pairCos: Map[(Long, Long), Double],
      ranges: Seq[(Int, Int)]): Map[Long, (Long, Double)] = {
    def related(x: Long, y: Long) =
      pairCos.contains((math.min(x, y), math.max(x, y)))
    var accepted = Set.empty[Long]
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    for ((lo, hi) <- ranges) {
      val ids = (lo.toLong until hi.toLong).toSeq
      val flagged = ids.flatMap { d =>
        val causes = accepted.filter(a => related(a, d)) ++
          ids.filter(e => e < d && related(e, d))
        if (causes.nonEmpty) {
          val c = causes.min
          Some(d -> (c, pairCos((math.min(c, d), math.max(c, d)))))
        } else None
      }
      expected ++= flagged
      accepted ++= ids.filterNot(flagged.map(_._1).toSet)
    }
    expected.toMap
  }

  test("cross-batch embedding gate equals the sequential reference simulation") {
    val replayDir = Files.createTempDirectory("graft-edd-replay").toString
    val indexDir = Files.createTempDirectory("graft-edd-index").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-edd-ckpt").toString
    val ranges = Seq((0, 100), (100, 200), (200, 300), (300, 400), (400, 500))
    writeOrderedReplay(replayDir, ranges)

    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = EmbedDedupStream.start(stream, indexDir, ckpt, 0.45)
    q.processAllAvailable()
    q.stop()

    val pairCos = SparkEntry.queries("q106_embed_dedup_lsh")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = simulate(pairCos, ranges)
    assert(expected.nonEmpty, "vacuous fixture: no cross-batch near-dups")

    val got = spark.read.parquet(s"$indexDir/dups")
      .select(col("vec_id"), col("matched_vec"), col("cos_sim"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected)

    // survivors ∪ flagged = everything; the index holds survivors only
    val indexed = spark.read.parquet(s"$indexDir/vecs")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(indexed.intersect(expected.keySet).isEmpty)
    assert(indexed.size + expected.size == 500)

    // idempotent re-delivery: re-running the LAST batch with its original
    // batch id must leave the flagged stream byte-identical (the overwrite
    // partition contract)
    val lastBatch = Fixtures.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 400 && col("vec_id") < 500)
    EmbedDedupStream.dedupBatch(lastBatch, indexDir, 0.45, batchId = 4)
    val again = spark.read.parquet(s"$indexDir/dups")
      .select(col("vec_id"), col("matched_vec"), col("cos_sim"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == expected)
  }

  test("compacting the bucket index mid-stream leaves gating identical") {
    // the index grows one file set per epoch — the standing maintenance job
    // is Sinks.compact between triggers (same contract as the text gate's
    // compaction spec): run the first batches, compact buckets+vecs, resume
    // with the rest; flagged results must equal the uncompacted reference.
    val replayDir = Files.createTempDirectory("graft-edd-creplay").toString
    val indexDir = Files.createTempDirectory("graft-edd-cindex").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-edd-cckpt").toString
    val ranges = Seq((0, 100), (100, 200), (200, 300), (300, 400), (400, 500))
    val schema = Fixtures.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding")).schema

    writeOrderedReplay(replayDir, ranges.take(3))
    val s1 = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q1 = EmbedDedupStream.start(s1, indexDir, ckpt, 0.45)
    q1.processAllAvailable(); q1.stop()

    graft.sinks.Sinks.compact(spark, s"$indexDir/buckets", targetBytes = Long.MaxValue)
    graft.sinks.Sinks.compact(spark, s"$indexDir/vecs", targetBytes = Long.MaxValue)

    writeOrderedReplay(replayDir, ranges) // adds the last two batch files
    val s2 = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q2 = EmbedDedupStream.start(s2, indexDir, ckpt, 0.45)
    q2.processAllAvailable(); q2.stop()

    val pairCos = SparkEntry.queries("q106_embed_dedup_lsh")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = simulate(pairCos, ranges)
    val got = spark.read.parquet(s"$indexDir/dups")
      .select(col("vec_id"), col("matched_vec"), col("cos_sim"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected)
  }
}
