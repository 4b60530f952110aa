package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Changelog record for the SCD2 fold (`ts` is the event time that opens a
  * validity interval; `event_id` plays the Kafka offset — unique and
  * monotone per key, FIXTURES.md).
  */
case class Scd2Event(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
    value: Double)

/** One validity interval of the type-2 dimension. `valid_to == null` marks
  * the open (current) row; a closed row is FINAL — it is never revised by
  * later input.
  */
case class Scd2Row(event_id: Long, user_id: Long, valid_from: java.sql.Timestamp,
    value: Double, valid_to: java.sql.Timestamp, is_current: Boolean)

/** Streaming SCD type-2 interval maintenance — the HISTORY-PRESERVING form
  * of the reference's changelog fold (`Tables.persistent.*`,
  * /root/reference/src/main/scala/com/iravid/fs2/kafka/streams/
  * Tables.scala:110-139): where [[LatestValueProcessor]] keeps only the
  * last write per key (q4's table), this keeps the OPEN validity interval
  * per key and, on each update, closes it (`valid_to` = the new row's
  * `valid_from`, emitted once, final) and opens the successor — completing
  * the latest(q4) / history(q141) / snapshot(q142) triad. State per key is
  * O(1): one open interval, NOT the interval history — the history lives in
  * the emitted stream (the downstream SCD2 table), exactly like a CDC
  * changelog feeding a warehouse dimension.
  *
  * Ordering contract: offset order is authority for REPLAY detection (a
  * row with `event_id` at or below the open interval's is an at-least-once
  * re-delivery and is skipped — [[LatestValueProcessor]]'s idempotence
  * rule; throwing there would abort every replayed epoch), and event time
  * (ts, event_id) orders the intervals, exactly as batch q141 sorts. The
  * contract therefore requires ts monotone in offset per key (true of any
  * producer stamping time at send; FIXTURES.md data satisfies it). A row
  * that VIOLATES it — new by offset but older by event time than the open
  * interval — cannot be folded without revising already-emitted final
  * rows, so it fails loudly instead of being silently dropped (batch q141
  * would place it differently; silence would mask the divergence). Within
  * a micro-batch rows are sorted by (ts, event_id), so intra-batch arrival
  * order never matters. Scd2StreamSpec pins streaming ≡ batch q141 after
  * full replay and after a mid-stream checkpoint restart, plus the loud
  * out-of-order failure.
  */
class Scd2Processor extends StatefulProcessor[Long, Scd2Event, Scd2Row] {
  @transient private var open: ValueState[Scd2Event] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[Scd2Event]("open",
      Encoders.product[Scd2Event], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Scd2Event],
      timerValues: TimerValues): Iterator[Scd2Row] = {
    val ordered = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    // under the contract (ts monotone in offset) the event-time sort is
    // also offset-ascending; a descending offset here is the intra-batch
    // form of the violation the fold below detects across batches
    ordered.iterator.sliding(2).withPartial(false).foreach { w =>
      if (w(0).event_id > w(1).event_id)
        throw new IllegalStateException(
          s"out-of-order changelog for key $key: events ${w(0).event_id} and " +
            s"${w(1).event_id} arrive with event time regressing against " +
            "offset order; the SCD2 fold requires ts monotone in offset per key")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
    var cur = if (open.exists()) open.get() else null
    var touched = false
    ordered.foreach { e =>
      if (cur == null || e.event_id > cur.event_id) {
        // new by OFFSET. It must also be new by event time, or the fold
        // would have to revise an already-final closed row — contract
        // violation, fail loudly (see scaladoc).
        if (cur != null && e.ts.getTime < cur.ts.getTime)
          // equal ts with a higher offset is a legal tie (orders by offset)
          throw new IllegalStateException(
            s"out-of-order changelog for key $key: event ${e.event_id} at " +
              s"${e.ts} is newer by offset but older by event time than the " +
              s"open interval (${cur.event_id} at ${cur.ts}); the SCD2 fold " +
              "requires ts monotone in offset per key")
        if (cur != null) // close the open interval; this row is final
          out += Scd2Row(cur.event_id, key, cur.ts, cur.value, e.ts,
            is_current = false)
        cur = e
        touched = true
      } else {
        // offset ≤ open ⇒ a re-delivery of an already-folded row, which
        // must carry ts ≤ the open interval's; a NEWER ts at an old offset
        // is the converse contract violation — fail loudly, don't mask it
        if (e.ts.getTime > cur.ts.getTime)
          throw new IllegalStateException(
            s"out-of-order changelog for key $key: event ${e.event_id} at " +
              s"${e.ts} re-delivers an offset at/below the open interval " +
              s"(${cur.event_id}) with a NEWER event time than ${cur.ts}; " +
              "the SCD2 fold requires ts monotone in offset per key")
      }
    }
    if (!touched) Iterator.empty
    else {
      open.update(cur)
      out += Scd2Row(cur.event_id, key, cur.ts, cur.value, null,
        is_current = true)
      out.iterator
    }
  }
}

object Scd2Stream {
  /** Fold a (streaming or batch) purchase changelog into the SCD2 interval
    * update stream. Update mode: per touched key per epoch, the newly
    * closed rows (final) plus the current open row (superseded by the next
    * epoch's emission for the same event_id).
    */
  def intervals(events: Dataset[Scd2Event]): Dataset[Scd2Row] = {
    implicit val enc = Encoders.product[Scd2Row]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Update())
  }
}
