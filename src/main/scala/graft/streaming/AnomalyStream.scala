package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Event record for the streaming anomaly gate (full stream, q140's input
  * shape; `ts` event time, `event_id` the per-type-monotone offset).
  */
case class AnomEvent(event_id: Long, event_type: String, ts: java.sql.Timestamp,
    value: Double)

/** Trailing-window state per event type: the last `win` integer cents in
  * arrival order plus the (ts, event_id) high-water mark for idempotent
  * replay. O(win) state per key — the streaming analogue of the batch ROWS
  * frame.
  */
case class AnomTrail(cents: Seq[Long], last_ts: Long, last_id: Long)

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
  * Ordering contract = the SCD2 fold's: per-key offset order is authority
  * (within a micro-batch rows sort by (ts, event_id); rows at or before
  * the state's high-water mark are at-least-once re-deliveries and are
  * skipped idempotently). AnomalyStreamSpec pins streaming ≡ batch q140
  * after replay and after a mid-stream restart with overlapping
  * re-delivery.
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
    var st = if (trail.exists()) trail.get()
             else AnomTrail(Vector.empty, Long.MinValue, Long.MinValue)
    var buf = st.cents.toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomFlag]
    var touched = false
    ordered.foreach { e =>
      val t = e.ts.getTime
      val fresh = t > st.last_ts || (t == st.last_ts && e.event_id > st.last_id)
      if (fresh) {
        val c = math.floor(e.value * 100 + 0.5).toLong
        if (buf.length == win) {
          val s = buf.sum
          val q = buf.map(x => x * x).sum
          val dev = win * c - s
          val bound = 9L * (win * q - s * s)
          if (dev * dev > bound)
            out += AnomFlag(e.event_id, key, c, dev * dev, bound)
        }
        buf = (buf :+ c).takeRight(win)
        st = AnomTrail(buf, t, e.event_id)
        touched = true
      } // else: re-delivered row, already folded — skip (idempotence)
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
