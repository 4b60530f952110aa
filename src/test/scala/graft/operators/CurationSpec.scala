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

  test("sequence packing preserves every document and fills bins to the budget") {
    val packed = SparkEntry.queries("q68_seq_packing")(spark, dir)
    val nDocs = packed.agg(sum(col("n_docs"))).head().getLong(0)
    assert(nDocs === Fixtures.documents(spark, dir).count())
    // bins are contiguous 0..max per lang (no gaps: each bin's start offset
    // is the previous cumulative total)
    val bad = packed.groupBy(col("lang"))
      .agg(max(col("bin")).as("mx"), count(lit(1)).as("c"))
      .filter(col("mx") =!= col("c") - 1)
    assert(bad.isEmpty)
    // every bin except a lang's last holds at least the budget's worth of
    // starts: sum_tokens ≥ budget − (last doc spillover) is loose; the
    // sharp invariant is that a NEW bin only opens once the previous bin's
    // start offsets passed the budget — equivalently each non-final bin's
    // cumulative token span ≥ 256.
    val spans = packed.withColumn("is_last",
        col("bin") === max(col("bin")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .filter(!col("is_last"))
    assert(spans.filter(col("sum_tokens") < lit(256) - lit(100)).isEmpty,
      "non-final bins should be near the token budget")
  }

  test("repetition fractions are in (0,1] and top_word_frac ≥ 1/n_tokens") {
    val rep = SparkEntry.queries("q66_repetition")(spark, dir)
    assert(rep.filter(col("top_word_frac") <= 0 || col("top_word_frac") > 1 ||
      col("dup_word_frac") < 0 || col("dup_word_frac") >= 1 ||
      col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).isEmpty)
  }
}
