package graft.operators

import java.sql.Timestamp
import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel/retention semantics beyond the value oracles: stage ordering is
  * strict and earliest-completion, and cohort offsets are first-event
  * anchored.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (u, t, tp) => (u, ts(t), tp) }.toDF("user_id", "ts", "event_type")
  }

  test("stage k counts only events strictly after the earliest stage k-1") {
    val events = ev(
      // u1: full funnel in order
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // u2: click BEFORE the view — must not reach stage 2
      (2L, "2024-01-02 09:00:00", "click"),
      (2L, "2024-01-02 10:00:00", "view"),
      // u3: click at the SAME instant as the view — strict >, not reached
      (3L, "2024-01-03 08:00:00", "view"),
      (3L, "2024-01-03 08:00:00", "click"),
      // u4: view only
      (4L, "2024-01-04 07:00:00", "view"))
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_view" -> 4L, "2_click" -> 1L, "3_purchase" -> 1L))
  }

  test("earliest-completion: a later re-view does not reopen the funnel") {
    // click is after the SECOND view but before nothing else; the funnel
    // anchors at the EARLIEST view, so the click still counts (it is after
    // min(view)) — and a purchase before the click must not count.
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 12:00:00", "purchase"), // before the click: stage 3 not reached
      (1L, "2024-01-01 13:00:00", "view"),
      (1L, "2024-01-01 14:00:00", "click"))
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_view" -> 1L, "2_click" -> 1L))
  }

  test("retention anchors at each user's first active week") {
    val events = ev(
      // u1 first active week 0; active weeks 0 and 2
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-16 10:00:00", "click"),
      // u2 first active week 1; active weeks 1,2
      (2L, "2024-01-09 10:00:00", "view"),
      (2L, "2024-01-17 10:00:00", "view"),
      // two events same week count once
      (2L, "2024-01-18 10:00:00", "error"))
    val got = Funnel.retention(events, epoch = "2024-01-01", maxOffset = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("q118: stage user counts are non-increasing down the funnel") {
    val out = SparkEntry.queries("q118_funnel")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Seq("1_view", "2_click", "3_purchase").map(out.getOrElse(_, 0L))
    assert(counts === counts.sorted.reverse, s"funnel must narrow: $counts")
  }

  test("q119: k=0 row equals cohort size and every offset row is bounded by it") {
    val out = SparkEntry.queries("q119_retention")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = out.keys.map(_._1).toSet
    cohorts.foreach { c =>
      val size = out((c, 0L)) // every cohort member is by definition active at k=0
      out.filter(_._1._1 == c).foreach { case ((_, k), users) =>
        assert(users <= size, s"cohort $c offset $k has $users > cohort size $size")
      }
    }
  }
}
