package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Timestamped changelog record for event-time stateful processing. */
case class TimedEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** One closed session (gap-based), session_window-compatible. */
case class SessionSummary(user_id: Long, session_start: java.sql.Timestamp,
    n: Long, sv: Double)

/** Custom gap-sessionizer on the raw stateful surface: `ListState` buffers
  * the key's events, an EVENT-TIME TIMER at (last event + gap) closes the
  * key's sessions when the watermark passes it. This completes the stateful
  * API demonstrated by the engine — ValueState ([[LatestValueProcessor]]),
  * MapState ([[TypeCountsProcessor]]), ListState + timers (here) — i.e. the
  * `transformWithState` surface SURVEY §2.B commits to. Results must equal
  * the built-in `session_window` aggregation (q32); the spec pins that.
  *
  * Timer discipline: ONE timer per key, re-armed to lastTs + gap on every
  * input batch (deleting the stale one). When it fires, the watermark is ≥
  * lastTs + gap ≥ every buffered session's end + gap, so ALL buffered
  * sessions are closed: split the buffer on gaps ≥ `gapMs`, emit, clear.
  * (A production variant would also arm per-session-end timers to emit
  * early sessions of a still-active key sooner; the close condition — and
  * therefore the output — is identical.)
  *
  * State is O(open events per key) and is freed on close; at scale this is
  * hash-partitioned RocksDB state like every other processor here.
  */
class SessionTimerProcessor(gapMs: Long)
    extends StatefulProcessor[Long, TimedEvent, SessionSummary] {
  @transient private var buf: ListState[TimedEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[TimedEvent]("session_buf",
      Encoders.product[TimedEvent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
      timerValues: TimerValues): Iterator[SessionSummary] = {
    var maxTs = Long.MinValue
    rows.foreach { e =>
      buf.appendValue(e)
      maxTs = math.max(maxTs, e.ts.getTime)
    }
    if (maxTs != Long.MinValue) {
      // deadline from the FULL buffer, not just this batch: an out-of-order
      // (but non-late) batch with an earlier max would otherwise pull the
      // timer before lastBufferedTs + gap and close open sessions early
      var bufMax = maxTs
      buf.get().foreach(e => bufMax = math.max(bufMax, e.ts.getTime))
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(bufMax + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
    val events = buf.get().toArray.sortBy(e => (e.ts.getTime, e.event_id))
    buf.clear()
    if (events.isEmpty) return Iterator.empty
    val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
    var start = 0
    var i = 1
    def close(lo: Int, hi: Int): Unit = {
      val es = events.slice(lo, hi)
      // session_window's aggregate shape: DECIMAL(18,4) sum rounded to 2 dp
      val sv = es.map(e => BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      sessions += SessionSummary(key, es.head.ts, es.length.toLong, sv)
    }
    while (i < events.length) {
      if (events(i).ts.getTime - events(i - 1).ts.getTime >= gapMs) {
        close(start, i); start = i
      }
      i += 1
    }
    close(start, events.length)
    sessions.iterator
  }
}

object SessionTimerStream {
  /** Sessionize a watermarked TimedEvent stream with a gap timeout. */
  def sessions(events: Dataset[TimedEvent], gapMs: Long): Dataset[SessionSummary] = {
    implicit val enc = Encoders.product[SessionSummary]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
