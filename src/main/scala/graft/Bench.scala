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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      // the *_indexed gates build their persisted index on first touch
      // (ensureTable); that one-time build is ingest work, not the
      // probe being timed — left in rep 1 it turns the noise ratio
      // into a permanent build/probe ratio that masks real host
      // contention. One untimed warmup rep absorbs the build; other
      // queries skip it so the bench doesn't grow a 4th rep.
      if (name.endsWith("_indexed") || name == "split_from_index")
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
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
      (name, median, noise, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val ns = results.map { case (k, _, n, _) => jstr(k) + ":" + f"$n%.2f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v, _, _) => v }.sum
    // "queries" then "errors_count"/"error_keys" are the LAST keys: a
    // tail-capture that truncates the line's head loses the summary
    // fields, never the timings (round 4) — and round 5 lost the
    // mid-line "errors" object to the same truncation, so error
    // VISIBILITY now also lives at the tail as a count + key list
    // (small, bounded by the query count; full messages stay in the
    // head "errors" object and in BENCH_LATEST.json, which is always
    // written whole).
    val errKeys = results.collect { case (k, _, _, Some(_)) => jstr(k) }
      .mkString("[", ",", "]")
    val nErrs = results.count(_._4.isDefined)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","errors":$errs,"noise":$ns,"queries":$qs,"errors_count":$nErrs,"error_keys":$errKeys}"""
    try {
      val w = new java.io.PrintWriter("BENCH_LATEST.json")
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
