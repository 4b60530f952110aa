package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algorithmic contracts of the dedup family beyond the value oracles:
  * LSH candidate recall, banded-simhash exactness, cross-algorithm
  * agreement on the planted near-duplicates.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhash-LSH result equals the exact n-gram jaccard result") {
    val lsh = SparkEntry.queries("q17_dedup_minhash_lsh")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q19_dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact,
      s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("banded simhash join equals unbanded all-pairs at hamming <= 4") {
    val banded = SparkEntry.queries("q18_dedup_simhash")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sims = Dedup.simhash(Fixtures.documents(spark, TestSpark.sf0001))
    val a = sims.select(col("doc_id").as("a"), col("sim").as("sa"))
    val b = sims.select(col("doc_id").as("b"), col("sim").as("sb"))
    val allPairs = a.join(b, col("a") < col("b"))
      .filter(expr("bit_count(sa ^ sb) <= 4"))
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == allPairs)
  }

  test("simhash near-dup pairs agree with jaccard near-dup pairs") {
    val sim = SparkEntry.queries("q18_dedup_simhash")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = SparkEntry.queries("q19_dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // different definitions; on planted ~0.97-jaccard dups they overlap heavily
    val overlap = sim.intersect(jac).size.toDouble / math.max(jac.size, 1)
    info(f"simhash∩jaccard overlap = $overlap%.2f (|sim|=${sim.size}, |jac|=${jac.size})")
    assert(overlap >= 0.6)
  }

  test("exactDedupByHash keeps one representative per distinct text") {
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
    val deduped = Dedup.exactDedupByHash(docs)
    assert(deduped.count() == docs.select("text").distinct().count())
    assert(deduped.agg(sum("dupes")).collect().head.getLong(0) == docs.count())
  }
}
