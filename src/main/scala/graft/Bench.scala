package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** One bench session. Beyond the query-plan configs (shuffle
    * partitions = cores, partition-discovery threshold), the session
    * carries the anti-interference settings motivated by nine rounds
    * of full-run-vs-isolated drift (round-9 audit: five keys inflated
    * 2-6× in situ with ≤1.3 isolated noise — accumulated session
    * state, not host contention):
    *
    *  - `spark.cleaner.periodicGC.interval=1min`: shuffle files and
    *    broadcast blocks are only deleted when the DRIVER GCs the
    *    referencing objects; with a 128 GiB heap a full run's ~1300
    *    executions accumulate gigabytes of dead shuffle files that
    *    evict the parquet page cache. A 1-minute periodic GC keeps the
    *    cleaner draining continuously instead of in one late burst.
    *  - retained jobs/stages/tasks/executions cut to a few hundred:
    *    the AppStatusStore trims asynchronously ON THE LISTENER BUS —
    *    with defaults (1000 jobs / 1000 stages / 100k tasks) the trim
    *    work grows with run length and lands in whichever query is
    *    executing when the threshold trips. Small bounds make the
    *    trim cost constant and negligible.
    *  - `spark.sql.codegen.cache.maxEntries=2000` (default 100): a
    *    267-query surface compiles far more than 100 codegen classes,
    *    so with the default every query evicts its predecessors and
    *    Janino recompiles on each revisit (the isolated-rerun phase,
    *    spec suites). 2000 holds the whole surface.
    */
  private def mkSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // local mode: driver-side listing of a few hundred partition
      // dirs is microseconds; the default threshold (32) launches a
      // distributed file-listing JOB per partitioned-table read, a
      // fixed ~0.3 s tax that dwarfs the actual probe on persisted
      // index tables (cluster deployments want the default back)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      // If events.parquet ships the historical TIMESTAMP(NANOS) encoding,
      // surface it as a nanos long (graft.sources.Tables.events dispatches
      // on the actual type; this conf is a no-op for micros columns).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** warm-ups + timed reps for one query; returns (median, min, noise, err). */
  private def timeOne(spark: SparkSession, sfDir: String,
                      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                      warmups: Int, reps: Int): (Double, Double, Double, Option[String]) = {
    var err: Option[String] = None
    (1 to warmups).foreach { _ =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val samples = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        if (err.isEmpty) err =
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}") }
      (System.nanoTime() - t0) / 1e9
    }.sorted
    (samples(reps / 2), samples.head,
      if (samples.head > 0) samples.last / samples.head else 1.0, err)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var spark = mkSession(cpus)
    // Warm-up at the smallest SF: JIT-compiles every operator's code
    // paths (codegen, parquet reader, shuffle) so the timed pass below
    // measures steady-state throughput, not first-call compilation.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    // a failed query must be visible in the output, not benched as
    // "fast": its error is listed in the separate "errors" object; the
    // per-query timings stay non-negative so their semantics are
    // stable across rounds.
    //
    // Each query runs 3× and reports the MEDIAN: a shared host under
    // contention inflates single-shot wall time 10-80× (observed in
    // three consecutive driver rounds), and one noisy sample out of
    // three cannot move a median. The per-query max/min ratio is
    // published as "noise" so a contended run is visible as high
    // noise rather than a fake regression.
    val reps = 3
    // Every query gets 2 DISCARDED warm-up reps at the TARGET sf before
    // its timed reps (not just the sf0.001 JIT pass above): round-6
    // numbers showed a one-directional 2-4× drift on a cluster of
    // documents-side queries whose code had not changed — first-touch
    // effects (page cache, codegen cache eviction by the preceding
    // index builds, broadcast cleanup) land on rep 1 and a median of 3
    // cannot absorb two cold samples. The warm-ups also subsume the
    // old indexed-build-absorbing rep (*_indexed first-touch builds
    // happen inside warm-up, never in a timed rep).
    val warmups = 2
    // optional arg: comma-separated subset of query names (targeted
    // perf iteration; the driver runs the full surface with no args)
    val subset: Set[String] =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSet else Set.empty
    var sinceGc = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .map { case (name, fn) =>
        // untimed GC every 16 queries: drives the ContextCleaner (dead
        // shuffle files / broadcasts from the PREVIOUS queries) at a
        // steady cadence so the collection cost never lands inside a
        // later query's timed rep as one accumulated pause.
        sinceGc += 1
        if (sinceGc >= 16) { sinceGc = 0; System.gc() }
        val (median, min, noise, err) = timeOne(spark, sfDir, fn, warmups, reps)
        (name, median, min, noise, err)
      }

    // Isolated re-measurement (round-9 action item): any key whose
    // full-run noise exceeded 2.0 is re-run in a FRESH session at the
    // end — full-run noise has repeatedly turned out to be harness
    // interference, and publishing the isolated figure alongside the
    // in-situ one lets a reader separate plan cost from session state
    // without re-deriving it. Cap at 24 keys: if more than that are
    // noisy the whole run was contended and the per-key numbers are
    // meaningless anyway.
    val noisy = results.filter { case (_, _, _, n, err) => n > 2.0 && err.isEmpty }
      .sortBy { case (_, _, _, n, _) => -n }.take(24).map(_._1)
    val isolated: Map[String, Double] =
      if (noisy.isEmpty) Map.empty
      else {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        System.gc()
        spark = mkSession(cpus)
        val byName = SparkEntry.queries
        noisy.map { name =>
          val (median, _, _, _) = timeOne(spark, sfDir, byName(name), warmups, reps)
          name -> median
        }.toMap
      }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def jmap(m: Seq[(String, String)]): String =
      m.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v, _, _, _) => k -> v.toString })
    // per-query MIN alongside the median: min is the least-contended
    // sample (the closest this host gets to a clean measurement), so
    // median-vs-min separates real plan cost from scheduler noise
    val mins = jmap(results.map { case (k, _, m, _, _) => k -> m.toString })
    val ns = jmap(results.map { case (k, _, _, n, _) => k -> f"$n%.2f" })
    val errs = jmap(results.collect { case (k, _, _, _, Some(e)) => k -> jstr(e) })
    val iso = jmap(isolated.toSeq.sortBy(_._1).map { case (k, v) => k -> f"$v%.3f" })
    val total = results.map { case (_, v, _, _, _) => v }.sum
    val errKeys = results.collect { case (k, _, _, _, Some(_)) => jstr(k) }
      .mkString("[", ",", "]")
    val nErrs = results.count(_._5.isDefined)
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","errors":$errs,"noise":$ns,"min":$mins,"isolated":$iso,"queries":$qs,"errors_count":$nErrs,"error_keys":$errKeys}"""
    try {
      val w = new java.io.PrintWriter("BENCH_LATEST.json")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }
    // Two stdout lines. The FULL record first (also written whole to
    // BENCH_LATEST.json). LAST, a compact summary guaranteed under
    // 2000 chars: the driver's round artifact keeps only the final
    // 2000 chars of stdout and its `parsed` field has been null for
    // nine rounds because the full line never fit — so the line that
    // must parse is the one printed last. It carries the totals, every
    // error key, the isolated re-measurements, and the 12 slowest
    // keys; the complete per-key maps live one line up and in
    // BENCH_LATEST.json.
    println(full)
    val slowest = jmap(results.sortBy { case (_, v, _, _, _) => -v }.take(12)
      .map { case (k, v, _, _, _) => k -> f"$v%.3f" })
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"errors_count":$nErrs,"error_keys":$errKeys,"isolated":$iso,"queries":$slowest,"full":"BENCH_LATEST.json"}"""
    println(summary)
    spark.stop()
  }
}
