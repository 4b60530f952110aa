package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PSI drift and PMI collocation semantics beyond the value oracles. */
class DriftPmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("psi: identical distributions score exactly zero in every bin") {
    import spark.implicits._
    // both windows hold the same bin mix (2:1) — p == q ⇒ (p−q)·ln(p/q) = 0
    val df = Seq(
      ("a", true), ("a", true), ("b", true),
      ("a", false), ("a", false), ("b", false)).toDF("bin", "base")
    val got = Profile.psi(df, "bin", col("base"))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(got === Map("a" -> 0.0, "b" -> 0.0))
  }

  test("psi: a bin empty on one side reports NULL, not ±infinity") {
    import spark.implicits._
    val df = Seq(("a", true), ("b", false)).toDF("bin", "base")
    val rows = Profile.psi(df, "bin", col("base")).collect()
    assert(rows.forall(_.isNullAt(5)), "one-sided bins must yield NULL psi")
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
  }

  test("q121: shares are exact count ratios and sum to ~1 per window") {
    val out = SparkEntry.queries("q121_drift_psi")(spark, TestSpark.sf0001)
      .collect()
    assert(out.nonEmpty)
    val (sp, sq) = (out.map(_.getDouble(3)).sum, out.map(_.getDouble(4)).sum)
    assert(math.abs(sp - 1.0) < 5e-6 * out.length, s"sum(p)=$sp")
    assert(math.abs(sq - 1.0) < 5e-6 * out.length, s"sum(q)=$sq")
    out.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    }
  }

  test("q122: emitted PMI equals the formula over emitted counts and corpus totals") {
    val docs = graft.Fixtures.documents(spark, TestSpark.sf0001)
    val nUni = docs.select(explode(split(col("text"), " ")).as("w")).count()
    val nBi = docs
      .select((greatest(size(split(col("text"), " ")) - 1, lit(0))).as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    val out = SparkEntry.queries("q122_pmi_collocations")(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty && out.length <= 20)
    val pmis = out.map(_.getDouble(5))
    assert(pmis.toSeq === pmis.sortBy(-_).toSeq, "top-20 must be pmi-descending")
    out.foreach { r =>
      val (cxy, cx, cy) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cxy >= 5, "min-support filter")
      val expect = math.log(cxy.toDouble / nBi) -
        math.log(cx.toDouble / nUni) - math.log(cy.toDouble / nUni)
      val rounded = math.floor(expect * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getDouble(5) - rounded) < 1e-9,
        s"pmi mismatch for ${r.getString(0)} ${r.getString(1)}")
    }
  }
}
