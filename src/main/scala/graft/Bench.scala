package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .map { case (name, fn) =>

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
      val median = samples(reps / 2)
      val noise = if (samples.head > 0) samples.last / samples.head else 1.0
      (name, median, samples.head, noise, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // per-query MIN alongside the median: min is the least-contended
    // sample (the closest this host gets to a clean measurement), so
    // median-vs-min separates real plan cost from scheduler noise
    val mins = results.map { case (k, _, m, _, _) => jstr(k) + ":" + m }
      .mkString("{", ",", "}")
    val ns = results.map { case (k, _, _, n, _) => jstr(k) + ":" + f"$n%.2f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v, _, _, _) => v }.sum
    // "queries" then "errors_count"/"error_keys" are the LAST keys: a
    // tail-capture that truncates the line's head loses the summary
    // fields, never the timings (round 4) — and round 5 lost the
    // mid-line "errors" object to the same truncation, so error
    // VISIBILITY now also lives at the tail as a count + key list
    // (small, bounded by the query count; full messages stay in the
    // head "errors" object and in BENCH_LATEST.json, which is always
    // written whole).
    val errKeys = results.collect { case (k, _, _, _, Some(_)) => jstr(k) }
      .mkString("[", ",", "]")
    val nErrs = results.count(_._5.isDefined)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","errors":$errs,"noise":$ns,"min":$mins,"queries":$qs,"errors_count":$nErrs,"error_keys":$errKeys}"""
    try {
      val w = new java.io.PrintWriter("BENCH_LATEST.json")
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
