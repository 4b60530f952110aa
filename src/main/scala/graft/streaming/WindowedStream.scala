package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time windowed aggregation — beyond-reference capability (the
  * reference has no event-time at all, SURVEY.md §2.B) required by the
  * capability matrix. Watermark bounds state: windows older than the
  * watermark are finalized and evicted, so state size is O(active windows),
  * not O(stream length) — the property that makes this run forever at scale.
  */
object WindowedStream {

  /** Tumbling 1-hour window counts/sums over an event stream (streaming twin
    * of batch Q7 — StreamingWindowSpec asserts equivalence).
    */
  def hourlyStats(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sv"))

  /** Streaming exact dedup within the watermark horizon — the streaming
    * member of the dedup family (batch members live in operators.Dedup).
    */
  def dedupWithinWatermark(events: DataFrame, cols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(cols)
}
