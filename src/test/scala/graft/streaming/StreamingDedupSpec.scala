package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import graft.{Fixtures, SparkEntry, TestSpark}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming near-dup gate must equal a sequential reference
  * simulation of its contract over the same batch boundaries: flag iff
  * (a) related to an ACCEPTED doc from an earlier batch, or (b) related to
  * a smaller-id doc in the same batch. "Related" ground truth comes from
  * the exact n-gram jaccard pairs (q19), which the LSH candidate stage
  * provably recovers in full on these fixtures (DedupSpec q17 ≡ q19).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeOrderedReplay(replayDir: String, ranges: Seq[(Int, Int)]): Unit = {
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val base = System.currentTimeMillis() - 1000000
    for (((lo, hi), i) <- ranges.zipWithIndex) {
      val tmp = Files.createTempDirectory("graft-dedup-part").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.toString.endsWith(".parquet")).get
      val dst = Paths.get(replayDir, f"f$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      // spaced mod-times force oldest-first processing order
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base + i * 10000))
    }
  }

  test("cross-batch gate equals the sequential reference simulation") {
    val replayDir = Files.createTempDirectory("graft-dedup-replay").toString
    val indexDir = Files.createTempDirectory("graft-dedup-index").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val ranges = Seq((0, 100), (100, 200), (200, 300), (300, 400), (400, 500))
    writeOrderedReplay(replayDir, ranges)

    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = DedupStream.start(stream, indexDir, ckpt, 0.8)
    q.processAllAvailable()
    q.stop()

    // reference simulation off the exact pairs (with each pair's jaccard,
    // to pin that the emitted jac belongs to the emitted matched_doc)
    val pairJac = SparkEntry.queries("q19_dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def related(x: Long, y: Long) =
      pairJac.contains((math.min(x, y), math.max(x, y)))
    var accepted = Set.empty[Long]
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    for ((lo, hi) <- ranges) {
      val ids = (lo.toLong until hi.toLong).toSeq
      val flagged = ids.flatMap { d =>
        val causes = accepted.filter(a => related(a, d)) ++
          ids.filter(e => e < d && related(e, d))
        if (causes.nonEmpty) {
          val c = causes.min
          Some(d -> (c, pairJac((math.min(c, d), math.max(c, d)))))
        } else None
      }
      expected ++= flagged
      accepted ++= ids.filterNot(flagged.map(_._1).toSet)
    }

    val got = spark.read.parquet(s"$indexDir/dups")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("matched_doc"), r.getAs[Double]("jac")))).toMap
    assert(got == expected.toMap,
      s"missing ${expected.toMap.toSet -- got.toSet}, extra ${got.toSet -- expected.toMap.toSet}")

    // index holds exactly the accepted docs (survivors), never a flagged one
    val indexed = spark.read.parquet(s"$indexDir/sigs")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == accepted)
  }

  test("compacting the signature index mid-stream leaves gating identical") {
    // the index grows one file set per epoch — the standing maintenance job
    // is Sinks.compact between triggers. Run the stream over the first
    // batches, stop at the checkpoint, compact sigs+shingles, resume with
    // more batches: flagged results must equal the uncompacted single-run
    // reference (cross-batch gate sees the same corpus through the swap).
    val replayDir = Files.createTempDirectory("graft-dedup-creplay").toString
    val indexDir = Files.createTempDirectory("graft-dedup-cindex").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-dedup-cckpt").toString
    val ranges = Seq((0, 100), (100, 200), (200, 300), (300, 400), (400, 500))
    val schema = Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).schema

    writeOrderedReplay(replayDir, ranges.take(3))
    val s1 = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q1 = DedupStream.start(s1, indexDir, ckpt, 0.8)
    q1.processAllAvailable(); q1.stop()

    def parquetCount(d: java.io.File): Int =
      d.listFiles.map(f => if (f.isDirectory) parquetCount(f)
        else if (f.getName.endsWith(".parquet")) 1 else 0).sum
    val sigFilesBefore = parquetCount(new java.io.File(s"$indexDir/sigs"))
    graft.sinks.Sinks.compact(spark, s"$indexDir/sigs", targetBytes = Long.MaxValue)
    graft.sinks.Sinks.compact(spark, s"$indexDir/shingles", targetBytes = Long.MaxValue)

    writeOrderedReplay(replayDir, ranges) // adds the last two batch files
    val s2 = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q2 = DedupStream.start(s2, indexDir, ckpt, 0.8)
    q2.processAllAvailable(); q2.stop()

    // reference: the gate replayed sequentially with no compaction
    val pairJac = SparkEntry.queries("q19_dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def related(x: Long, y: Long) =
      pairJac.contains((math.min(x, y), math.max(x, y)))
    var accepted = Set.empty[Long]
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    for ((lo, hi) <- ranges) {
      val ids = (lo.toLong until hi.toLong).toSeq
      val flagged = ids.flatMap { d =>
        val causes = accepted.filter(a => related(a, d)) ++
          ids.filter(e => e < d && related(e, d))
        if (causes.nonEmpty) {
          val c = causes.min
          Some(d -> (c, pairJac((math.min(c, d), math.max(c, d)))))
        } else None
      }
      expected ++= flagged
      accepted ++= ids.filterNot(flagged.map(_._1).toSet)
    }
    val got = spark.read.parquet(s"$indexDir/dups")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("matched_doc"), r.getAs[Double]("jac")))).toMap
    assert(got == expected.toMap,
      s"gating diverged across compaction: missing ${expected.toMap.toSet -- got.toSet}, " +
        s"extra ${got.toSet -- expected.toMap.toSet}")
    assert(sigFilesBefore > 1, "fixture must exercise a real multi-file compaction")
  }

  test("re-running a batch id overwrites its partition instead of double-appending") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft-dedup-idem").toString + "/idx"
    val batch = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    DedupStream.dedupBatch(batch, indexDir, 0.8, batchId = 0L)
    val once = spark.read.parquet(s"$indexDir/sigs").count()
    DedupStream.dedupBatch(batch, indexDir, 0.8, batchId = 0L) // re-delivery
    assert(spark.read.parquet(s"$indexDir/sigs").count() == once)
  }
}
