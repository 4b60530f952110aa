package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end curation run's three artifacts must be mutually
  * consistent and agree with the oracle-verified queries they compose:
  * corpus ≡ the q139-kept doc set, manifest ≡ q126's manifest recomputed
  * over the corpus as written, report ≡ q139 — and a re-run is idempotent.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("curate writes a corpus/manifest/report that agree with q139/q126 and each other") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val run = Pipeline.curate(spark, dir, out)

    // counts: in = corpus size, kept = written docs, tokens match report
    val q139 = SparkEntry.queries("q139_curation_funnel_v2")(spark, dir).collect()
    assert(run.docsIn === Fixtures.documents(spark, dir).count())
    assert(run.docsKept === q139.map(_.getLong(3)).sum)
    assert(run.tokensKept === q139.map(_.getLong(4)).sum)
    assert(run.docsKept > 0 && run.docsKept < run.docsIn,
      "fixture must exercise both keep and drop")

    // corpus: exactly the kept doc ids, with text and the manifest's shard key
    val corpus = spark.read.parquet(run.corpusPath)
    assert(corpus.count() === run.docsKept)
    val keptIds = graft.operators.Curation.funnelVerdicts(spark, dir)
      .filter(col("kept")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(corpus.select(col("doc_id")).collect().map(_.getLong(0)).toSet === keptIds)

    // manifest rows describe the corpus AS WRITTEN: recompute from the
    // written files and compare value-for-value (incl. the order fp)
    val manifest = spark.read.parquet(run.manifestPath)
      .orderBy(col("shard")).collect().map(_.toString).toSeq
    val recomputed = graft.operators.Layout
      .shardManifest(corpus.select(col("doc_id"), col("text")))
      .collect().map(_.toString).toSeq
    assert(manifest === recomputed)
    // and the written Hive partitions match the manifest's doc counts
    val partCounts = corpus.groupBy(col("shard")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    spark.read.parquet(run.manifestPath).collect().foreach { r =>
      assert(partCounts(r.getInt(0)) === r.getLong(1), s"shard ${r.getInt(0)}")
    }

    // report parquet ≡ the oracle-verified q139 rows
    val report = spark.read.parquet(run.reportPath)
      .orderBy(col("lang"), col("source")).collect().map(_.toString).toSeq
    assert(report === q139.map(_.toString).toSeq)

    // idempotent overwrite: second run produces identical artifacts
    // (materialize BEFORE the re-run — overwrite replaces the files the
    // first DataFrame's scan listed)
    val corpusRows = corpus.orderBy(col("doc_id")).collect().map(_.toString).toSeq
    val again = Pipeline.curate(spark, dir, out)
    assert(again === run)
    val corpus2 = spark.read.parquet(run.corpusPath)
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    assert(corpus2 === corpusRows)
  }

  test("curate with a benchmark drops exactly the contaminated docs and reports them") {
    // the opt-in q104 gate, one-shot: the gated corpus equals the ungated
    // corpus minus the docs sharing a window with the benchmark, and the
    // report's docs_contaminated counts every flagged doc (kept or not)
    val bench = Fixtures.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 8)
      .orderBy(col("doc_id")).limit(3).localCheckpoint()
    val contaminated = graft.operators.Curation
      .contaminatedIds(spark, dir, bench)
      .collect().map(_.getLong(0)).toSet
    assert(contaminated.size >= 3,
      "a benchmark drawn from the corpus must at least flag itself")
    val plain = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-pipeline-nogate").toString)
    val gated = Pipeline.curate(spark, dir,
      Files.createTempDirectory("graft-pipeline-gate").toString,
      benchmark = Some(bench))
    def ids(path: String): Set[Long] = spark.read.parquet(path)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids(gated.corpusPath) === ids(plain.corpusPath) -- contaminated,
      "the gate must remove exactly the contaminated docs")
    assert(gated.docsIn === plain.docsIn)
    val report = spark.read.parquet(gated.reportPath)
    assert(report.columns.contains("docs_contaminated"))
    assert(report.agg(sum(col("docs_contaminated"))).head().getLong(0)
      === contaminated.size.toLong,
      "docs_contaminated must count every flagged doc, kept or dropped")
    assert(Pipeline.validateCorpus(spark,
      gated.corpusPath.stripSuffix("/corpus")).isEmpty)
  }

  test("curate on an empty corpus returns zero counts and writes empty artifacts") {
    val emptyDir = Files.createTempDirectory("graft-pipeline-empty").toString
    Fixtures.documents(spark, dir).limit(0)
      .write.parquet(s"$emptyDir/documents.parquet")
    val out = Files.createTempDirectory("graft-pipeline-empty-out").toString
    val run = Pipeline.curate(spark, emptyDir, out)
    assert(run === Pipeline.CurationRun(0L, 0L, 0L,
      s"$out/corpus", s"$out/manifest", s"$out/report"))
    assert(spark.read.parquet(run.manifestPath).isEmpty)
    assert(spark.read.parquet(run.reportPath).isEmpty)
    // auditing the all-dropped run must return an empty diff, not throw on
    // schema inference over the fileless corpus dir
    assert(Pipeline.validateCorpus(spark, out).isEmpty)
  }

  test("validateCorpus passes on an intact run and flags exactly a lost shard") {
    val out = Files.createTempDirectory("graft-pipeline-val").toString
    val run = Pipeline.curate(spark, dir, out)
    assert(Pipeline.validateCorpus(spark, out).isEmpty,
      "intact corpus must validate clean")
    // lose one populated shard's files (the post-copy corruption case)
    val shardDirs = Files.list(java.nio.file.Paths.get(run.corpusPath))
      .toArray.map(_.toString).filter(_.contains("shard=")).sorted
    assert(shardDirs.nonEmpty)
    val victim = shardDirs.head
    val victimShard = victim.split("shard=").last.toInt
    Files.walk(java.nio.file.Paths.get(victim)).toArray
      .map(_.asInstanceOf[java.nio.file.Path]).sortBy(-_.getNameCount)
      .foreach(Files.delete)
    val bad = Pipeline.validateCorpus(spark, out).collect()
    assert(bad.map(_.getInt(0)).toSeq === Seq(victimShard))
    // the stored side survives; the recomputed side misses the shard
    assert(bad.head.getStruct(1) != null)
  }
}
