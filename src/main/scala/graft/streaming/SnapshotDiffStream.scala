package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Changelog record for the snapshot-diff fold (full event stream, not just
  * one type — q142's input shape).
  */
case class SnapEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
    value: Double)

/** Per-key snapshot state: the argmax-(ts, event_id) observation. */
case class SnapState(ts_millis: Long, event_id: Long, value: Double)

/** Per-key classification update emitted each epoch the key is touched. */
case class SnapDiffRow(user_id: Long, status: String, value_delta: Double)

/** Streaming twin of q142's snapshot diff (`LatestByKey.snapshotDiff`):
  * maintains BOTH point-in-time states per key — `s1` = latest observation
  * strictly before the baseline cutoff, `s2` = latest overall — as two
  * named ValueStates on one handle (the A24 column-family layout, like
  * [[ProfileProcessor]]), and emits the key's added/changed/unchanged
  * classification + value delta on every touched epoch. Where the batch
  * form answers "did the rebuilt table converge?" after the fact from one
  * full scan, this maintains the same reconciliation CONTINUOUSLY over the
  * live changelog — the always-on migration/replay audit. The corpus-level
  * report is one tiny aggregate over the latest per-key rows (the spec
  * runs exactly the batch tail-aggregate over them and matches q142).
  *
  * Fold is order-insensitive (argmax by (ts, event_id), both monotone
  * tie-broken), so replay/restart converge — no ordering contract needed,
  * unlike the SCD2 fold whose OUTPUT depends on arrival order.
  */
class SnapshotDiffProcessor(cutoffMillis: Long)
    extends StatefulProcessor[Long, SnapEvent, SnapDiffRow] {
  @transient private var s1: ValueState[SnapState] = _
  @transient private var s2: ValueState[SnapState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    s1 = getHandle.getValueState[SnapState]("baseline",
      Encoders.product[SnapState], TTLConfig.NONE)
    s2 = getHandle.getValueState[SnapState]("current",
      Encoders.product[SnapState], TTLConfig.NONE)
  }

  private def newer(a: SnapState, t: Long, id: Long): Boolean =
    a == null || t > a.ts_millis || (t == a.ts_millis && id > a.event_id)

  override def handleInputRows(key: Long, rows: Iterator[SnapEvent],
      timerValues: TimerValues): Iterator[SnapDiffRow] = {
    var base = if (s1.exists()) s1.get() else null
    var cur = if (s2.exists()) s2.get() else null
    var touched = false
    rows.foreach { e =>
      val t = e.ts.getTime
      if (t < cutoffMillis && newer(base, t, e.event_id))
        base = SnapState(t, e.event_id, e.value)
      if (newer(cur, t, e.event_id))
        cur = SnapState(t, e.event_id, e.value)
      touched = true
    }
    if (!touched || cur == null) Iterator.empty
    else {
      if (base != null) s1.update(base)
      s2.update(cur)
      val status =
        if (base == null) "added"
        else if (base.value != cur.value) "changed"
        else "unchanged"
      val delta = cur.value - (if (base == null) 0.0 else base.value)
      Iterator.single(SnapDiffRow(key, status, delta))
    }
  }
}

object SnapshotDiffStream {
  /** Fold a (streaming or batch) changelog into the per-key snapshot-diff
    * update stream against the given baseline cutoff (epoch millis in the
    * session's UTC clock — the same instant q142's timestamp literal
    * denotes). Update mode: one classification row per touched key per
    * epoch; the latest row per key is the current reconciliation verdict.
    */
  def diff(events: Dataset[SnapEvent], cutoffMillis: Long): Dataset[SnapDiffRow] = {
    implicit val enc = Encoders.product[SnapDiffRow]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new SnapshotDiffProcessor(cutoffMillis),
        TimeMode.None(), OutputMode.Update())
  }
}
