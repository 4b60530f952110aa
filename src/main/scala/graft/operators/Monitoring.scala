package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** In-flight data-quality metrics via Spark's observe() — the pipeline
  * monitoring surface. A 100 TB job cannot afford a second scan to learn
  * "how many rows / how many nulls / what value range did I just
  * process": observed metrics are accumulated BY the running plan itself
  * (zero extra scans, merged on the driver per action or per micro-batch)
  * and surface through `Observation.get` (batch) or
  * `StreamingQueryProgress.observedMetrics` (streaming).
  *
  * This is the engine-side analogue of the reference's consumer-loop
  * instrumentation hooks: counters ride the data path instead of being
  * derived by re-reading it.
  */
object Monitoring {

  /** Attach named metric expressions to a batch frame. The returned
    * [[Observation]] yields the metric row after the FIRST action on the
    * returned frame (blocking `get`).
    */
  def observed(df: DataFrame, name: String,
      metrics: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Attach metrics to a STREAMING frame; read them per micro-batch from
    * `StreamingQueryProgress.observedMetrics(name)`.
    */
  def observedStream(df: DataFrame, name: String,
      metrics: Seq[Column]): DataFrame =
    df.observe(name, metrics.head, metrics.tail: _*)
}
