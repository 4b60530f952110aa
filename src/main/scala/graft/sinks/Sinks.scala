package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Sink builders (reference A12).
  *
  * The reference's producer surfaces a per-record broker ack
  * (`ProducerResult`, client/Producer.scala:37-55); Spark replaces that with
  * epoch-commit semantics — the checkpoint's sink commit log marks a batch
  * durable, which is the property the reference actually uses acks for
  * (its own tests assert by re-consuming, RecordStreamSpec.scala:30-51).
  * Explicit partition/timestamp routing (Producer.produce args) becomes
  * `partition`/`timestamp` columns on the sink DataFrame.
  */
object Sinks {

  /** Kafka sink: expects key/value (binary or string) columns; `topic` may
    * instead be a per-row column for dynamic routing. Connector jar not in
    * this image — compile-checked wiring, see Sources scaladoc.
    */
  def kafka(df: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** Parquet file sink (append). */
  def parquet(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    df.writeStream.format("parquet").option("path", path)
      .option("checkpointLocation", checkpoint).trigger(trigger)

  /** Named in-memory table (tests / interactive). */
  def memory[T](ds: Dataset[T], name: String, outputMode: String): DataStreamWriter[T] =
    ds.writeStream.format("memory").queryName(name).outputMode(outputMode)

  /** foreachBatch escape hatch (reference users' `evalMap` analogue). */
  def foreachBatch[T](ds: Dataset[T])(f: (Dataset[T], Long) => Unit): DataStreamWriter[T] =
    ds.writeStream.foreachBatch(f)

  /** Hive-style partitioned parquet layout: one directory per partition
    * value, so a filter on the partition column prunes whole directories at
    * PLANNING time (PartitionFilters — zero I/O for excluded partitions).
    * The standard layout for 100 TB facts partitioned by date/tenant/lang;
    * pair with `spark.sql.files.maxPartitionBytes` so each surviving file
    * splits into right-sized tasks. PartitionedWriteSpec pins the pruning.
    */
  def writePartitioned(df: org.apache.spark.sql.DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table: co-locates data by key at WRITE time so
    * later joins/aggregations on the bucket key plan with NO exchange —
    * the pre-partitioning strategy for repeatedly-joined 100 TB facts
    * (pay one shuffle at ingest, skip it in every query after).
    */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // The in-memory catalog forgets tables across JVMs but their warehouse
    // directories survive; clear an orphaned location so CTAS can't refuse.
    if (!spark.catalog.tableExists(table)) {
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
