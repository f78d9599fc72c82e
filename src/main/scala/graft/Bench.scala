package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1), prints ONE JSON line.
  *
  * Methodology: one warmup pass (JIT + codegen caches + parquet footers)
  * that is NOT counted, then 2 timed runs per query reporting the min —
  * steady-state throughput, not first-run compilation noise. The corpus at
  * sf0.1 is small enough that per-stage scheduling overhead dominates any
  * single cold run.
  *
  * The JSON stamps the host 1-min load average at start and end plus the
  * run count, so a recording taken under external contention (the r4
  * artifact carried 6-9x outliers traced to load-average-5 background
  * load) is self-identifying instead of needing forensic re-timing: a
  * loadavg far above SPARK_GRAFT_CPUS at either edge means the wall-clock
  * numbers are not comparable across sessions.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // optional comma-separated subset (fast iteration / error-path demos);
    // a subset recording never overwrites the full-suite BENCH_full.json
    val subset = sys.env.get("SPARK_GRAFT_BENCH_SUBSET")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = subset.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadAtStart = loadAvg()
    val spark = GraftSession.local(cpus, appName = "graft-bench")

    // A query that throws records -1.0 AND its name+message in `errors`
    // below — the round-5 lesson: a silent sentinel excluded from the
    // total let ann_recall_pq's sf0.1 assert failure hide inside five
    // consecutive "clean" recordings. The JSON line now carries
    // "errors":[...] and "n_errors"; a recording is only clean when
    // n_errors == 0, and BASELINE.md must not call it clean otherwise.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(160)
          -1.0
        }
      // ops persist reused intermediates (signatures, inverted lists);
      // clear between runs (outside the timed region) so timings measure
      // the op, not a cache of a previous identical plan, and the block
      // store doesn't grow 3x per query over the bench run
      spark.catalog.clearCache()
      // clearCache only covers CacheManager (SQL) entries — localCheckpoint
      // blocks (resolveClusters rounds, rangeNtileBucket's pinned range
      // table) live as raw persistent RDDs and otherwise accumulate until
      // driver GC triggers ContextCleaner; across a 50-query suite that
      // block-store growth inflated later queries ~2-3x (measured: the
      // whole-suite run degraded dedup_clusters 3.1s -> 20s while the
      // isolated run stayed flat)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      elapsed
    }

    // Warmup: exercise scan/shuffle/codegen paths once, uncounted.
    // SPARK_GRAFT_BENCH_WARMUP=0 skips the per-query warmup pass — the
    // decade-scale protocol (×100: a third full pass of a multi-hour
    // suite buys no signal; cold runs are stamped as such in BASELINE.md)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    spark.range(0, 2000000).selectExpr("sum(id * 2)").collect()
    if (warmup) {
      queries.foreach { case (name, fn) => once(name, fn) }
      errors.clear() // only timed-run failures count (warmup may race caches)
    }

    val results = queries.map { case (name, fn) =>
      val times = (1 to runsPerQuery).map(_ => once(name, fn)).filter(_ >= 0)
      if (times.nonEmpty) errors.remove(name) // a later run succeeded
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    // 3-decimal times keep the line compact (the driver truncates long
    // tails); total-first ordering means truncation can only ever eat
    // per-query detail, never the headline. The untruncated line is also
    // persisted to BENCH_full.json next to the repo for the record.
    def f3(v: Double): String = // ROOT locale: '.' decimal point always
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val loadAtEnd = loadAvg()
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, m) => s"${js(k)}:${js(m)}" }
      .mkString("{", ",", "}")
    val cond =
      s""""loadavg_start":${f3(loadAtStart)},"loadavg_end":${f3(loadAtEnd)},"runs_per_query":$runsPerQuery,"cpus":$cpus"""
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"errors":$errJson,"sf":"$sfDir",$cond,"queries":$qs}"""
    println(line)
    // The driver keeps only the TAIL of a too-long stdout line, so the
    // totals-first full line can arrive headless ("parsed": null in
    // BENCH_r05/r06). Emit a compact headline-only trailer AFTER the
    // per-query dump: whatever truncation happens upstream, the last
    // line always parses. The full line (with per-query times) is still
    // persisted untruncated to BENCH_full.json below.
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir",$cond}""")
    if (subset.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_full.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () } // best-effort: bench result already printed
    spark.stop()
  }
}
