package graft.operators

import graft.TestSpark
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the per-run shared-signal cache: one materialization per
  * (signal, dir), values ≡ the direct per-query derivation, and graceful
  * re-persist (never silent per-query recompute) after a global cache
  * clear — the failure mode that would quietly re-introduce the ~5×
  * corpus re-tokenization the store exists to remove.
  */
class SignalStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("consumers share ONE cached frame instance per (signal, dir)") {
    val a = SignalStore.winFps(spark, dir)
    val b = SignalStore.winFps(spark, dir)
    assert(a eq b, "second access must return the same cached DataFrame")
    assert(a.storageLevel != StorageLevel.NONE, "the shared frame must be persisted")
  }

  test("winFps values equal the direct windowFps derivation") {
    val shared = SignalStore.winFps(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Curation.windowFps(graft.Fixtures.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shared.nonEmpty && shared === direct)
  }

  test("clearCache degrades to recompute-once: the store re-persists on next access") {
    SignalStore.tokens(spark, dir).count() // ensure materialized
    spark.catalog.clearCache()
    val t = SignalStore.tokens(spark, dir)
    assert(t.storageLevel != StorageLevel.NONE,
      "after a global cache clear the accessor must re-persist, not run uncached")
  }
}
