package graft.operators

import graft.streaming.Event
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the latest-value-per-key fold (reference A17,
  * `Table.putAll` overwrite, streams/Table.scala:55-56) — the UDAF surface
  * of the capability matrix. The buffer is the current winner (offset,
  * type, value); `merge` keeps the higher offset, so the aggregation is
  * associative/commutative and Spark runs it partial+final like any
  * built-in. Usable as `ds.groupByKey(_.user_id).agg(LatestAggregator.toColumn)`.
  */
object LatestAggregator extends Aggregator[Event, (Long, String, Double), (String, Double, Long)] {
  override def zero: (Long, String, Double) = (Long.MinValue, null, 0.0)

  override def reduce(b: (Long, String, Double), e: Event): (Long, String, Double) =
    if (e.event_id > b._1) (e.event_id, e.event_type, e.value) else b

  override def merge(a: (Long, String, Double), b: (Long, String, Double)): (Long, String, Double) =
    if (a._1 >= b._1) a else b

  override def finish(b: (Long, String, Double)): (String, Double, Long) =
    (b._2, b._3, b._1)

  override def bufferEncoder: Encoder[(Long, String, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaDouble)
  override def outputEncoder: Encoder[(String, Double, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaDouble, Encoders.scalaLong)
}
