package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import graft.{Fixtures, TestSpark}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming span gate must equal a sequential reference simulation of
  * its contract over the same batch boundaries: a window is duplicated iff
  * its fp is in the accepted index from earlier batches or owned by a
  * smaller-id doc in the same batch; a doc is flagged iff its duplicated
  * fraction ≥ τ. The gating/ownership/threshold logic is simulated
  * independently on plain Scala collections; the per-window fingerprint
  * values come from the operator's own `Curation.windowFps` (they are
  * opaque match-only ids — xxhash64 over token-slice arrays — and
  * re-deriving Spark's internal array hash in plain Scala would pin an
  * implementation detail, not the contract).
  */
class StreamingSpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Tau = 0.5

  /** (doc_id → window-fp set) for every doc, computed once via the
    * operator's fingerprint pass.
    */
  private def allWindowFps(texts: Map[Long, String]): Map[Long, Set[Long]] = {
    import spark.implicits._
    val df = texts.toSeq.toDF("doc_id", "text")
    val m = graft.operators.Curation.windowFps(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupMap(_._1)(_._2).map { case (d, fps) => d -> fps.toSet }
    texts.keysIterator.map(d => d -> m.getOrElse(d, Set.empty[Long])).toMap
  }

  private def writeOrderedReplay(replayDir: String, ranges: Seq[(Int, Int)]): Unit = {
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val base = System.currentTimeMillis() - 1000000
    for (((lo, hi), i) <- ranges.zipWithIndex) {
      val tmp = Files.createTempDirectory("graft-span-part").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.toString.endsWith(".parquet")).get
      val dst = Paths.get(replayDir, f"f$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base + i * 10000))
    }
  }

  test("cross-batch span gate equals the sequential reference simulation") {
    val replayDir = Files.createTempDirectory("graft-span-replay").toString
    val indexDir = Files.createTempDirectory("graft-span-index").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-span-ckpt").toString
    val ranges = Seq((0, 100), (100, 200), (200, 300), (300, 400), (400, 500))
    writeOrderedReplay(replayDir, ranges)

    val schema = spark.read.parquet(replayDir).schema
    val stream = Sources.fileStream(spark, replayDir, schema, maxFilesPerTrigger = 1)
    val q = SpanDedupStream.start(stream, indexDir, ckpt, Tau)
    q.processAllAvailable()
    q.stop()

    // reference simulation on plain Scala collections
    val texts = Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fpsByDoc = allWindowFps(texts)
    var acceptedFps = Set.empty[Long]
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((lo, hi) <- ranges) {
      val ids = (lo.toLong until hi.toLong).filter(texts.contains).sorted
      val wins = ids.map(d => d -> fpsByDoc(d)).toMap
      val minOwner = wins.toSeq.flatMap { case (d, fps) => fps.map(_ -> d) }
        .groupMapReduce(_._1)(_._2)(math.min)
      val flaggedIds = ids.filter { d =>
        val fps = wins(d)
        if (fps.isEmpty) false
        else {
          val nDup = fps.count(f => acceptedFps(f) || minOwner(f) < d)
          nDup.toDouble / fps.size >= Tau
        }
      }
      for (d <- flaggedIds) {
        val fps = wins(d)
        expected(d) = (fps.size.toLong,
          fps.count(f => acceptedFps(f) || minOwner(f) < d).toLong)
      }
      acceptedFps ++= ids.filterNot(flaggedIds.toSet).flatMap(wins)
    }

    val got = spark.read.parquet(s"$indexDir/flags")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_win"), r.getAs[Long]("n_dup")))).toMap
    assert(got == expected.toMap,
      s"missing ${expected.toMap.toSet -- got.toSet}, extra ${got.toSet -- expected.toMap.toSet}")
    assert(got.nonEmpty, "fixture must exercise the gate (known dup docs exist)")

    // the index holds exactly the accepted docs' fingerprints
    val gotIdxFps = spark.read.parquet(s"$indexDir/fps")
      .select("fp").distinct().collect().map(_.getLong(0)).toSet
    assert(gotIdxFps == acceptedFps,
      "accepted-fp index must match the reference's accepted set")
  }

  test("re-delivered batch rewrites its partition idempotently") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft-span-idem").toString + "/idx"
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    SpanDedupStream.gateBatch(docs, indexDir, Tau, 0L)
    val flags1 = spark.read.parquet(s"$indexDir/flags").collect().toSet
    val fps1 = spark.read.parquet(s"$indexDir/fps").count()
    SpanDedupStream.gateBatch(docs, indexDir, Tau, 0L) // retry of batch 0
    val flags2 = spark.read.parquet(s"$indexDir/flags").collect().toSet
    val fps2 = spark.read.parquet(s"$indexDir/fps").count()
    assert(flags1 == flags2 && fps1 == fps2,
      "a re-delivered batch must rewrite, not double-append")
  }
}
