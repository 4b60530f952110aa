package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Event record for the streaming anomaly gate (full stream, q140's input
  * shape; `ts` event time, `event_id` the per-type-monotone offset).
  */
case class AnomEvent(event_id: Long, event_type: String, ts: java.sql.Timestamp,
    value: Double)

/** Trailing-window state per event type: the last `win` integer cents in
  * arrival order, their RUNNING sum and sum-of-squares (so the 3σ test is
  * O(1) per event — add the newcomer, subtract the evicted head), plus the
  * (ts, event_id) high-water mark for idempotent replay. O(win) state per
  * key — the streaming analogue of the batch ROWS frame.
  *
  * Schema note: adding the running sums was a STATE-SCHEMA change; a
  * checkpoint written by a pre-running-sums build does not restart against
  * this encoder (transformWithState schema compatibility) — restart such a
  * job from a fresh checkpoint and replay, like any stateful-schema
  * migration.
  */
case class AnomTrail(cents: Seq[Long], s: Long, q: Long, last_ts: Long,
    last_id: Long)

/** A flagged 3σ outlier — identical columns to batch q140's output. */
case class AnomFlag(event_id: Long, event_type: String, cents: Long,
    dev2: Long, bound: Long)

/** Streaming twin of q140's rolling z-score anomaly detection: per event
  * type, the trailing-AnomWin integer-cent window rides a ValueState and
  * each arriving event is tested with the same exact-integer 3σ predicate
  * (n·x − S)² > 9·(n·Q − S²) BEFORE being appended (the batch frame
  * excludes the current row, so an outlier cannot mask itself) — flags
  * stream out the moment the event arrives instead of waiting for a batch
  * recompute.
  *
  * Ordering contract = the SCD2 fold's: offset order detects REPLAYS (a
  * row with `event_id` at or below the high-water mark is an at-least-once
  * re-delivery, skipped idempotently), event time (ts, event_id) orders
  * the window — so the contract requires ts monotone in offset per key,
  * and a row that is new by offset but regresses in event time FAILS
  * LOUDLY (its trailing window would differ from batch q140's; a silent
  * drop would mask the divergence). Within a micro-batch rows sort by
  * (ts, event_id) first. AnomalyStreamSpec pins streaming ≡ batch q140
  * after multi-batch replay and after a mid-stream restart with
  * overlapping re-delivery, plus the loud out-of-order failure.
  *
  * Scale note: streaming state parallelism is |event types| — the SAME
  * ceiling the batch per-type window had, but here it is inherent to the
  * per-key ordered-stream semantics (a key's window is a sequential fold),
  * not a plan choice; the batch side scales past it with position chunks
  * (`TimeSeries.rollingAnomaly`) because it sees all rows at once.
  */
class RollingAnomalyProcessor(win: Int)
    extends StatefulProcessor[String, AnomEvent, AnomFlag] {
  @transient private var trail: ValueState[AnomTrail] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    trail = getHandle.getValueState[AnomTrail]("trail",
      Encoders.product[AnomTrail], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[AnomEvent],
      timerValues: TimerValues): Iterator[AnomFlag] = {
    val ordered = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    // intra-batch contract check (see Scd2Processor): under ts-monotone-in-
    // offset the event-time sort is also offset-ascending
    ordered.iterator.sliding(2).withPartial(false).foreach { w =>
      if (w(0).event_id > w(1).event_id)
        throw new IllegalStateException(
          s"out-of-order events for type $key: ${w(0).event_id} and " +
            s"${w(1).event_id} arrive with event time regressing against " +
            "offset order; the anomaly fold requires ts monotone in offset per key")
    }
    var st = if (trail.exists()) trail.get()
             else AnomTrail(Vector.empty, 0L, 0L, Long.MinValue, Long.MinValue)
    var buf = st.cents.toVector
    var s = st.s
    var q = st.q
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomFlag]
    var touched = false
    ordered.foreach { e =>
      val t = e.ts.getTime
      if (e.event_id > st.last_id) { // new by offset
        if (t < st.last_ts) // equal ts with a higher offset is a legal tie
          throw new IllegalStateException(
            s"out-of-order events for type $key: event ${e.event_id} at ${e.ts} " +
              s"is newer by offset but older by event time than the high-water " +
              s"mark (${st.last_id}); the anomaly fold requires ts monotone " +
              "in offset per key")
        val c = math.floor(e.value * 100 + 0.5).toLong
        if (buf.length == win) {
          val dev = win * c - s
          val bound = 9L * (win * q - s * s)
          if (dev * dev > bound)
            out += AnomFlag(e.event_id, key, c, dev * dev, bound)
          val evicted = buf.head
          buf = buf.tail :+ c
          s += c - evicted
          q += c * c - evicted * evicted
        } else {
          buf = buf :+ c
          s += c
          q += c * c
        }
        st = AnomTrail(buf, s, q, t, e.event_id)
        touched = true
      } else {
        // a true re-delivery carries ts ≤ the high-water mark; a NEWER ts
        // at an old offset is the converse contract violation — fail loudly
        if (t > st.last_ts)
          throw new IllegalStateException(
            s"out-of-order events for type $key: event ${e.event_id} at " +
              s"${e.ts} re-delivers an offset at/below the high-water mark " +
              s"(${st.last_id}) with a NEWER event time; the anomaly fold " +
              "requires ts monotone in offset per key")
      }
    }
    if (touched) trail.update(st)
    out.iterator
  }
}

object AnomalyStream {
  /** Attach the gate to a (streaming or batch) typed event stream. Update
    * mode; emits only flagged events (flags are FINAL — the trailing
    * window of an event never changes once it has arrived in order).
    */
  def flags(events: Dataset[AnomEvent], win: Int): Dataset[AnomFlag] = {
    implicit val enc = Encoders.product[AnomFlag]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.event_type)
      .transformWithState(new RollingAnomalyProcessor(win),
        TimeMode.None(), OutputMode.Update())
  }
}
