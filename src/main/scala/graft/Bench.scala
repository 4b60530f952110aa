package graft
import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query runs `SPARK_GRAFT_REPS` times (default 3) and reports the
  * MEDIAN — a single GC/JIT/compilation hiccup must not become the round's
  * official number (r1 recorded a 21 s q13 that re-ran at 2 s). A query that
  * throws is reported in an `"errors"` map and excluded from the total
  * instead of being silently recorded as its time-to-failure.
  *
  * The record is SELF-DIAGNOSING: the line carries the 1-minute system load
  * average sampled before and after the run (`"load":[pre,post]`), and
  * BENCH_DETAIL.json carries each query's per-rep MIN next to its median.
  * Rationale: BENCH_r04's 401 s total was a contended-machine artifact (the
  * same queries re-ran at 66 s on an idle box) and nothing in the artifact
  * said so — with load + min, a contended run is evident on its face
  * (load ≫ core count; min ≪ median).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet footers, so the first timed
    // query doesn't absorb session startup cost.
    Fixtures.tableNames.foreach(t => Fixtures.table(spark, sfDir, t).count())
    SparkEntry.queries.get("q10_distinct").foreach(f => f(spark, sfDir).count())

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // Drop cached plans BEFORE the clock starts: operators that persist()
      // intermediates (PQ training, window fingerprints, LSH buckets)
      // register them in the CacheManager keyed by canonical plan, so rep 2
      // of the same query would silently read rep 1's InMemoryRelation and
      // the median would measure cache reads, not the operator. Clearing per
      // rep also stops cache entries accumulating across the 100+ query run.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop sink: fully computes every output column (count() would let
      // Catalyst prune the final projection and under-measure
      // projection-heavy queries).
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_ONLY=q99,q100 (full names or qNN prefixes) restricts the
    // run for targeted timing during development; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(o => o(n) || o(n.takeWhile(_ != '_'))) }

    val loadPre = systemLoad()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // name -> (median, min): the median is the official number; the min is
    // the contention tell (an idle machine has min ≈ median).
    val results = selected.flatMap { case (name, fn) =>
      try {
        val times = (1 to reps).map(_ => timeOnce(fn)).sorted
        // true median: even rep counts average the two middle values
        // (times(n/2) alone is the UPPER middle — a 2-rep run would report
        // the worse rep, the exact outlier the median exists to reject)
        val median =
          if (times.size % 2 == 1) times(times.size / 2)
          else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
        Some(name -> (median, times.head))
      } catch {
        // + StackOverflowError: fatal to the thread but local to the query
        // (deep Catalyst trees — see Bpe.mergePair's scaladoc); one query
        // must land in the errors map, not void the whole round's record.
        // True VM errors (OOM) still propagate.
        case e if scala.util.control.NonFatal(e) || e.isInstanceOf[StackOverflowError] =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          errors += name -> e.getClass.getSimpleName
          None
      }
    }
    val loadPost = systemLoad()
    println(renderJson(results.toSeq.map { case (k, (med, _)) => k -> med },
      errors.toSeq, reps, sfDir, loadPre, loadPost,
      contendedMins(results.toSeq)))
    // Full-name per-query detail as a repo artifact: the stdout line must
    // fit the harness's 2 kB tail window (short keys), so the readable
    // mapping is persisted here for humans and later rounds. A filtered
    // dev run must not clobber the full-inventory artifact.
    if (only.isEmpty) try {
      def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val detail = results.toSeq.sortBy(-_._2._1)
        .map { case (k, (med, mn)) =>
          "  " + jstr(k) + ": {\"median\": " + f3(med) + ", \"min\": " + f3(mn) + "}"
        }
        .mkString("{\n\"sf\": " + jstr(sfDir) + ", \"reps\": " + reps +
          ", \"load\": [" + f3(loadPre) + ", " + f3(loadPost) + "],\n\"queries\": {\n",
          ",\n", "\n}}\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_DETAIL.json"),
        detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(_) => () } // artifact is best-effort
    spark.stop()
  }

  /** 1-minute system load average (−1.0 where the platform can't report
    * it). On a 32-core box an idle run sits well under 32; a load far above
    * core count marks the record as contended.
    */
  private def systemLoad(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** The single JSON result line. Line LENGTH is load-bearing: the harness
    * captures only the last 2 000 chars of output (measured from
    * BENCH_r01–r03, whose `tail` field is exactly 2 000 chars and whose JSON
    * line start was cut off in every round), so with 80+ queries even 3-dp
    * full-name keys overflow and the round's performance record is voided.
    * Query keys are therefore shortened to their `qNN` prefix (the driver
    * contract's own example format, `{"q1":sec,…}`); a prefix shared by two
    * queries keeps the full names for just those entries. The full-name ↔
    * prefix mapping is the query inventory itself (COVERAGE.md).
    * BenchJsonSpec pins the whole-line budget against the real window.
    */
  private[graft] def shortKeys(names: Seq[String]): Map[String, String] = {
    val prefix = names.map(n => n -> n.takeWhile(_ != '_')).toMap
    val collide = prefix.values.groupBy(identity).collect {
      case (p, g) if g.size > 1 => p
    }.toSet
    prefix.map { case (n, p) => n -> (if (collide(p)) n else p) }
  }

  /** Per-query MIN for the queries whose median looks contention-inflated
    * (min ≪ median on a non-trivial query): an ADDITIVE `"mins"` key so the
    * driver's round-over-round comparison can discount a contended spike
    * without a second run (VERDICT r14 item 8 — the r13/r14 records both
    * carry multi-second medians whose same-tree mins were 3–6× lower). On an
    * idle run min ≈ median everywhere and the key is absent, so the line
    * length only grows when the record needs the tell; capped at 6 entries
    * (worst deltas first) to respect the 2 kB capture window, and
    * renderJson drops the key entirely if the line would overflow.
    */
  private[graft] def contendedMins(
      results: Seq[(String, (Double, Double))]): Seq[(String, Double)] =
    results.collect {
      case (k, (med, mn)) if med >= 0.5 && mn < 0.7 * med => (k, med - mn, mn)
    }.sortBy(-_._2).take(6).map { case (k, _, mn) => k -> mn }

  private[graft] def renderJson(results: Seq[(String, Double)],
      errors: Seq[(String, String)], reps: Int, sfDir: String,
      loadPre: Double = -1.0, loadPost: Double = -1.0,
      mins: Seq[(String, Double)] = Seq.empty): String = {
    val short = shortKeys(results.map(_._1) ++ errors.map(_._1))
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Per-query values at magnitude-adaptive precision (2 dp under 1 s,
    // 1 dp under 10 s, whole seconds above): with 130+ queries the line
    // must stay inside the harness's 2 kB tail window (BenchJsonSpec pins
    // the budget) and 100 ms resolution on a 10 s query is noise anyway;
    // the 3-dp medians AND mins live in BENCH_DETAIL.json.
    def fmt2(v: Double) = {
      val pat = if (v < 1.0) "%.2f" else if (v < 10.0) "%.1f" else "%.0f"
      String.format(java.util.Locale.ROOT, pat, Double.box(v))
    }
    val qs = results.map { case (k, v) => jstr(short(k)) + ":" + fmt2(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(short(k)) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    def line(withMins: Boolean): String = {
      val minsJson =
        if (!withMins || mins.isEmpty) ""
        else mins.map { case (k, v) => jstr(short.getOrElse(k, k)) + ":" + fmt2(v) }
          .mkString(""","mins":{""", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"load":[${fmt(loadPre)},${fmt(loadPost)}]$minsJson,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    }
    // the capture window is 2 000 chars minus ~100 of sbt epilogue; the
    // mins key is diagnostic and is the first thing to go if tight
    val full = line(withMins = true)
    if (full.length <= 1850) full else line(withMins = false)
  }
}
