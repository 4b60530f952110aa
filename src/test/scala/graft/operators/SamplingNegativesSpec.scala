package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for q113 (quality-weighted sampling) and q114
  * (hard-negative mining). Both are fully DuckDB-value-oracled; these pin
  * the semantic properties a value hash can't express.
  */
class SamplingNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("q113: keep counts are bounded, p stays clamped, and sampling actually thins") {
    import spark.implicits._
    val rows = SparkEntry.queries("q113_weighted_sample")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, kept, avgP) =>
      assert(kept >= 0 && kept <= n)
      assert(avgP >= 0.05 && avgP <= 0.95)
    }
    val (tot, keptTot) = (rows.map(_._3).sum, rows.map(_._4).sum)
    assert(keptTot > 0 && keptTot < tot,
      s"sampler must neither keep everything nor drop everything ($keptTot/$tot)")
    // deterministic md5 coin: a re-run is bit-identical
    val again = SparkEntry.queries("q113_weighted_sample")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(again == rows)
  }

  test("q132: DSIR scores rank the target domain above the pool and resampling thins") {
    import spark.implicits._
    val rows = SparkEntry.queries("q132_dsir_resample")(spark, dir)
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    // every pool document is scored exactly once
    assert(rows.map(_._1).distinct.size === rows.size)
    // the importance ratio must on average prefer the declared target
    // domain (its tokens define the target LM) over the rest of the pool
    val (tgt, rest) = rows.partition(_._2 == "src0")
    assert(tgt.nonEmpty && rest.nonEmpty)
    def meanLr(xs: Seq[(Long, String, Long, Long, Boolean)]) =
      xs.map(r => r._4.toDouble / r._3).sum / xs.size
    assert(meanLr(tgt) > meanLr(rest),
      "target-domain docs must score higher per token than the pool")
    // resampling thins but never empties
    val kept = rows.count(_._5)
    assert(kept > 0 && kept < rows.size, s"kept $kept of ${rows.size}")
    // deterministic: md5 coin + integer-scaled scores, bit-identical re-run
    val again = SparkEntry.queries("q132_dsir_resample")(spark, dir)
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(again == rows)
  }

  test("q134: weighted reservoir equals a sequential Efraimidis-Spirakis reference") {
    import spark.implicits._
    val got = SparkEntry.queries("q134_weighted_reservoir")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size === 50)
    assert(got.forall(_._3 <= 0.0), "ln(u)/w priorities are non-positive")
    // independent sequential reference: same md5 coin, same priority, same
    // rounded ordering — over the corpus collected outside the operator
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(id: Long): Double = {
      val d = md.digest(s"esam:$id".getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h + 1L) / 4294967296.0
    }
    val ref = graft.Fixtures.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, String)].collect()
      .map { case (id, text) =>
        val w = text.split(" ", -1).length
        val pri = math.floor(math.log(coin(id)) / w * 1e9 + 0.5) / 1e9
        (id, w.toLong, pri)
      }
      .sortBy(r => (-r._3, r._1)).take(50).toSeq
    assert(got === ref)
  }

  test("q114: every hard negative has a different label than its query") {
    import spark.implicits._
    val labels = graft.Fixtures.embeddings(spark, dir)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = SparkEntry.queries("q114_hard_negatives")(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (q, _, n, _) =>
      assert(labels(q) != labels(n), s"neighbor $n shares label with query $q")
    }
    // hard negatives are a subset of the unrestricted ranking: each query's
    // best hard negative scores no higher than its best unrestricted
    // neighbor from q21 (equality iff q21's best already crosses labels)
    val brute = SparkEntry.queries("q21_ann_brute")(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
      .filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    got.filter(_._2 == 1).foreach { case (q, _, _, c) =>
      assert(c <= brute(q), s"hard negative for $q outranks the global best")
    }
  }
}
