package graft.operators

import graft.{Fixtures, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("stratified sample keeps ~10% of en and ~50% of the rest, deterministically") {
    val rows = SparkEntry.queries("q67_stratified_sample")(spark, dir).collect()
    for (r <- rows) {
      val (lang, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(kept <= total)
      val target = if (lang == "en") 0.10 else 0.50
      // md5 buckets are uniform; at fixture sizes allow wide tolerance
      assert(math.abs(kept.toDouble / total - target) < 0.25,
        s"$lang: kept $kept of $total, target $target")
    }
    val again = SparkEntry.queries("q67_stratified_sample")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("sequence packing preserves every document; bins are valid start-offset buckets") {
    // Only assert TRUE invariants of bin = floor(start_offset / budget):
    // a doc longer than the budget legally skips bins (no contiguity), and
    // fill level depends on doc-length distribution (no near-budget bound) —
    // fixture-dependent asserts on those would break on regenerated data.
    val packed = SparkEntry.queries("q68_seq_packing")(spark, dir)
    val nDocs = packed.agg(sum(col("n_docs"))).head().getLong(0)
    assert(nDocs === Fixtures.documents(spark, dir).count())
    // every lang starts at bin 0 (first doc's start offset is 0)...
    assert(packed.groupBy(col("lang")).agg(min(col("bin")).as("mn"))
      .filter(col("mn") =!= 0).isEmpty)
    // ...and the max bin is bounded by the lang's total tokens / budget
    val bad = packed.groupBy(col("lang"))
      .agg(max(col("bin")).as("mx"), sum(col("sum_tokens")).as("tot"))
      .filter(col("mx") > col("tot") / lit(256))
    assert(bad.isEmpty)
  }

  test("repetition fractions are in (0,1] and top_word_frac ≥ 1/n_tokens") {
    val rep = SparkEntry.queries("q66_repetition")(spark, dir)
    assert(rep.filter(col("top_word_frac") <= 0 || col("top_word_frac") > 1 ||
      col("dup_word_frac") < 0 || col("dup_word_frac") >= 1 ||
      col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).isEmpty)
  }
}
