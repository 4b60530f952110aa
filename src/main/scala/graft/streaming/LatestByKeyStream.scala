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

/** TTL variant of [[LatestValueProcessor]]: the state value expires
  * `ttlMillis` after its last write (processing time), so a key's memory
  * is bounded by its activity recency — the standard retention contract
  * for unbounded key spaces. After expiry `latest.get()` returns null and
  * the fold restarts from the incoming record (observable: a smaller
  * event_id wins again — TtlStateSpec).
  */
class LatestValueWithTtlProcessor(ttlMillis: Long)
    extends StatefulProcessor[Long, Event, LatestRow] {
  @transient private var latest: ValueState[LatestRow] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[LatestRow]("latest",
      Encoders.product[LatestRow],
      TTLConfig(java.time.Duration.ofMillis(ttlMillis)))

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

/** Per-user running stats — the second "column family". The value sum is
  * kept in exact long cents so streaming ≡ batch bit-for-bit (double
  * accumulation order would differ).
  */
case class UserStats(user_id: Long, n_events: Long, sum_cents: Long)

/** Combined profile row emitted per touched key per epoch. */
case class ProfileRow(user_id: Long, last_event_type: String, last_event_id: Long,
    n_events: Long, sum_cents: Long)

/** Multi-state-variable processor — the reference's `PolyKVStore` COLUMN
  * FAMILIES (/root/reference/src/main/scala/com/iravid/fs2/kafka/streams/
  * PolyKVStore.scala:85-106: one RocksDB store, many named handles) map to
  * multiple named state variables registered on one
  * `StatefulProcessorHandle`: each variable owns its own keyspace in the
  * same per-partition store and both commit atomically in the same epoch
  * (A24). The state-store reader exposes each variable independently by
  * `stateVarName` — the per-column-family scan.
  */
class ProfileProcessor extends StatefulProcessor[Long, Event, ProfileRow] {
  @transient private var latest: ValueState[LatestRow] = _
  @transient private var stats: ValueState[UserStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    latest = getHandle.getValueState[LatestRow]("latest",
      Encoders.product[LatestRow], TTLConfig.NONE)
    stats = getHandle.getValueState[UserStats]("stats",
      Encoders.product[UserStats], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[ProfileRow] = {
    var cur = if (latest.exists()) latest.get() else null
    var st = if (stats.exists()) stats.get() else UserStats(key, 0L, 0L)
    var touched = false
    rows.foreach { e =>
      if (cur == null || e.event_id > cur.last_event_id)
        cur = LatestRow(key, e.event_type, e.value, e.event_id)
      st = UserStats(key, st.n_events + 1, st.sum_cents + math.round(e.value * 100))
      touched = true
    }
    if (!touched) Iterator.empty
    else {
      latest.update(cur); stats.update(st)
      Iterator.single(ProfileRow(key, cur.last_event_type, cur.last_event_id,
        st.n_events, st.sum_cents))
    }
  }
}

/** One (user, event_type) count — MapState output row. */
case class TypeCount(user_id: Long, event_type: String, n: Long)

/** MapState processor — the reference's `PolyKVStore` column family IS a
  * key→value map (`KVStore[F, K, V]`, streams/KVStore.scala:5-27); Spark's
  * `MapState` is the direct analogue: a per-grouping-key map with per-entry
  * point access (get/put/iterator ≈ the store's get/put/scan, A18–A20
  * inside state). Emits the key's full map each epoch (Update mode).
  */
class TypeCountsProcessor extends StatefulProcessor[Long, Event, TypeCount] {
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("type_counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[TypeCount] = {
    var touched = false
    rows.foreach { e =>
      val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, cur + 1)
      touched = true
    }
    if (!touched) Iterator.empty
    else counts.iterator().map { case (t, n) => TypeCount(key, t, n) }
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

  /** Latest-table variant with per-value state TTL — the retention bound
    * that keeps streaming state finite at 100 TB: a key silent for longer
    * than `ttl` is evicted by the state store itself (RocksDB TTL
    * compaction, no per-key timers, no full-state sweeps), after which a
    * late-arriving record is folded as if the key were new. This is the
    * engine-native form of the reference's externally-managed store
    * lifecycle (PolyKVStore close/cleanup); TtlStateSpec pins the
    * behavioral contract both ways (expired → refold, NONE → ignore).
    */
  def latestTableWithTtl(events: Dataset[Event],
      ttl: java.time.Duration): Dataset[LatestRow] = {
    implicit val enc = Encoders.product[LatestRow]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new LatestValueWithTtlProcessor(ttl.toMillis),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Fold a typed changelog into the two-column-family profile table. */
  def profileTable(events: Dataset[Event]): Dataset[ProfileRow] = {
    implicit val enc = Encoders.product[ProfileRow]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Fold a typed changelog into per-user event-type counts (MapState). */
  def typeCounts(events: Dataset[Event]): Dataset[TypeCount] = {
    implicit val enc = Encoders.product[TypeCount]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
