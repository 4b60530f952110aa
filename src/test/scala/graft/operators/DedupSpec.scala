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

  test("prefix-filtered containment equals the full posting-list containment") {
    // The pigeonhole argument says the prefix probe has NO false negatives;
    // this pins it empirically — q86 must be row-identical to q83, not just
    // row-count-identical.
    val full = SparkEntry.queries("q83_containment")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = SparkEntry.queries("q86_containment_prefix")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == full,
      s"prefix filter missed ${full -- prefix}, extra ${prefix -- full}")
  }

  test("theta-sketch jaccard verify equals the exact jaccard (exact regime)") {
    // Below the 4096-entry nominal every per-doc sketch is in exact mode, so
    // the sketch intersection/union sizes ARE the set sizes and the jaccard
    // must match q17 bit-for-bit (values included, not just pairs).
    val exact = SparkEntry.queries("q17_dedup_minhash_lsh")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val theta = SparkEntry.queries("q87_theta_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(theta == exact,
      s"theta verify missed ${exact -- theta}, extra ${theta -- exact}")
  }

  test("keep-best representative is the quality argmax of its group") {
    val kept = SparkEntry.queries("q88_dedup_keep_best")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // groups come from pairs, so every group has >= 2 members
    assert(kept.nonEmpty && kept.forall(_._4 >= 2))
    // cross-check against the group labels + per-doc quality: the kept doc
    // must have the group's max rounded quality, with min-id tiebreak
    val groups = SparkEntry.queries("q39_dedup_groups")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))) // (doc_id, grp)
    val quality = SparkEntry.queries("q24_quality_score")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = groups.groupBy(_._2).map { case (grp, members) =>
      val best = members.map(_._1).minBy(id => (-quality(id), id))
      grp -> (best, quality(best), members.size.toLong)
    }
    val got = kept.map(k => k._1 -> (k._2, k._3, k._4)).toMap
    assert(got == expected)
  }

  test("exactDedupByHash keeps one representative per distinct text") {
    val docs = Fixtures.documents(spark, TestSpark.sf0001)
    val deduped = Dedup.exactDedupByHash(docs)
    assert(deduped.count() == docs.select("text").distinct().count())
    assert(deduped.agg(sum("dupes")).collect().head.getLong(0) == docs.count())
  }

  test("incremental dedup equals the cross-split restriction of the exact pairs") {
    val mx = Fixtures.documents(spark, TestSpark.sf0001)
      .agg(max(col("doc_id"))).collect().head.getLong(0)
    val split = math.floor(mx * 0.8).toLong
    val exact = SparkEntry.queries("q19_dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // orient each cross-split exact pair as (new, corpus); argmax on the
    // rounded jaccard with corpus-id tie-break — the q92 contract
    val cross = exact.flatMap { case (a, b, j) =>
      if (a < split && b >= split) Some((b, a, j))
      else if (b < split && a >= split) Some((a, b, j))
      else None
    }
    assert(cross.nonEmpty, "fixture must contain cross-split near-dups")
    val expected = cross.groupBy(_._1).map { case (n, g) =>
      val w = g.minBy(t => (-t._3, t._2))
      (n, w._2, w._3)
    }.toSet
    val got = SparkEntry.queries("q92_incremental_dedup")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing ${expected -- got}, extra ${got -- expected}")
  }

  test("leakage split never separates a near-dup pair across splits") {
    val split = SparkEntry.queries("q94_leakage_split")(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = SparkEntry.queries("q19_dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs)
      assert(split(a) == split(b), s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
    // and it is a real split, not one bucket
    assert(split.values.toSet.size > 1)
  }

  test("q137 bag fingerprint collapses reordered token multisets, not distinct ones") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a b b c"), ("en", "c b a b"), // same multiset, different order
      ("en", "a b c c"),                    // different multiset
      ("de", "x y"), ("de", "x y"))         // exact dup: both counts collapse
      .toDF("lang", "text")
    val got = Dedup.bowCounts(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("en") === ((3L, 3L, 2L)), "reordered pair must share one bag")
    assert(got("de") === ((2L, 1L, 1L)))
  }

  test("q135 cohesion flags CC chaining: the chained pair audits below the merge threshold") {
    import spark.implicits._
    // planted chain: A ≈ B and B ≈ C pass jaccard ≥ 0.8, but A vs C —
    // edited at BOTH ends — falls below it; CC still merges all three
    val base = (1 to 100).map(i => s"t$i")
    val a = ((1 to 7).map(i => s"A$i") ++ base.drop(7)).mkString(" ")
    val b = base.mkString(" ")
    val c = (base.take(93) ++ (1 to 7).map(i => s"C$i")).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val sh = Dedup.shinglesOf(docs).localCheckpoint()
    val jacs = Dedup.verifyJaccard(sh, None, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jacs((1L, 2L)) >= 0.8 && jacs((2L, 3L)) >= 0.8, s"chain legs too weak: $jacs")
    assert(jacs((1L, 3L)) < 0.8, s"chain ends must NOT be direct dups: $jacs")
    val pairs = Dedup.verifyJaccard(sh, Some(Dedup.minhashCandidates(sh)), 0.8)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val labels = Dedup.connectedComponents(pairs)
    val coh = Dedup.clusterCohesion(sh, labels).collect()
    assert(coh.length === 1, "all three docs must chain into one cluster")
    val r = coh.head
    assert(r.getLong(1) === 3 && r.getLong(2) === 3, "3 docs, 3 audited pairs")
    assert(r.getLong(3) < 800000L,
      s"the A-C pair must audit below the 0.8 threshold (min_j6 ${r.getLong(3)})")
    assert(r.getLong(4) > r.getLong(3), "avg above min: the legs are genuine dups")
  }
}
