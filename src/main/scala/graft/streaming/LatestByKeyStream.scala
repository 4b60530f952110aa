package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Typed changelog record — the engine's decoded `ConsumerMessage` payload
  * (`event_id` plays the Kafka offset: unique and monotone per key-partition,
  * FIXTURES.md).
  */
case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)

/** Materialized latest-value row (the reference's table entry). */
case class LatestRow(user_id: Long, last_event_type: String, last_value: Double,
    last_event_id: Long)

/** Streaming latest-value-per-key table — the `transformWithState` twin of
  * the reference's `Tables.persistent.*` fold (/root/reference/src/main/
  * scala/com/iravid/fs2/kafka/streams/Tables.scala:110-139): per-key RocksDB
  * state (Engine.configure sets RocksDBStateStoreProvider, the analogue of
  * `KVStores.open`), last-write-wins by offset (`putAll` overwrite,
  * Table.scala:55-56,125), and state+progress committed atomically per epoch
  * (the checkpoint replaces the manual `commit(offset)`-then-Kafka-commit
  * two-step of Tables.scala:31-36 — strictly stronger: exactly-once per
  * epoch vs at-least-once).
  *
  * Scale: state is hash-partitioned by key across `shuffle.partitions` tasks,
  * each owning a RocksDB instance — the same layout as the reference's
  * per-partition stores (A15), managed by Spark. Replay determinism (A22):
  * the fold is order-insensitive (max by event_id), so restart-and-replay
  * from any checkpoint converges to the same table; StreamingLatestSpec
  * asserts this including a mid-stream restart.
  */
class LatestValueProcessor extends StatefulProcessor[Long, Event, LatestRow] {
  @transient private var latest: ValueState[LatestRow] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[LatestRow]("latest",
      Encoders.product[LatestRow], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[LatestRow] = {
    var cur = if (latest.exists()) latest.get() else null
    rows.foreach { e =>
      if (cur == null || e.event_id > cur.last_event_id)
        cur = LatestRow(key, e.event_type, e.value, e.event_id)
    }
    if (cur == null) Iterator.empty
    else { latest.update(cur); Iterator.single(cur) }
  }
}

/** Tombstone-aware variant: a configurable event_type deletes the key —
  * the reference's `Table.delete` (A21, streams/Table.scala:70-71) driven
  * by null-value/tombstone records.
  */
class LatestValueWithTombstoneProcessor(tombstoneType: String)
    extends StatefulProcessor[Long, Event, LatestRow] {
  @transient private var latest: ValueState[LatestRow] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[LatestRow]("latest",
      Encoders.product[LatestRow], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[LatestRow] = {
    var cur = if (latest.exists()) latest.get() else null
    var deleted = false
    rows.foreach { e =>
      if (cur == null || e.event_id > cur.last_event_id) {
        if (e.event_type == tombstoneType) {
          cur = LatestRow(key, e.event_type, e.value, e.event_id); deleted = true
        } else { cur = LatestRow(key, e.event_type, e.value, e.event_id); deleted = false }
      }
    }
    if (cur == null) Iterator.empty
    else if (deleted) { latest.clear(); Iterator.empty }
    else { latest.update(cur); Iterator.single(cur) }
  }
}

object LatestByKeyStream {
  /** Fold a (streaming or batch) typed changelog into the latest-by-key
    * update stream. Output mode Update: one row per touched key per epoch.
    */
  def latestTable(events: Dataset[Event]): Dataset[LatestRow] = {
    implicit val enc = Encoders.product[LatestRow]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new LatestValueProcessor, TimeMode.None(), OutputMode.Update())
  }
}
