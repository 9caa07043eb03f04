package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-level timing of the MinHash LSH pair pipeline,
  * the containment pipeline and the media phash pipeline. Not part of
  * the query surface.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    println(s"[probe] n_docs = ${docs.count()}")
    // warm
    time("warm minhashLsh") { graft.operators.Dedup.minhashLsh(docs).count() }
    time("warm again") { graft.operators.Dedup.minhashLsh(docs).count() }
    // stages
    val norm = docs.select(col("doc_id"),
      graft.functions.TextAnalysis.normalizeWs(col("text")).as("nt"))
    time("scan+normalize only") {
      norm.write.format("noop").mode("overwrite").save()
    }
    val sigs = docs.select(col("doc_id"),
      graft.plans.HashExprs.minhashText(
        graft.functions.TextAnalysis.normalizeWs(col("text")), 5, 64,
        word = false).as("sig"))
    time("minhash signatures (noop)") {
      sigs.write.format("noop").mode("overwrite").save()
    }
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 8).map(j =>
        xxhash64(slice(col("sig"), j * 8 + 1, 8))): _*)))
      .toDF("doc_id", "band", "band_hash")
    time("bandTable (minhash signatures)") { bands.count() }
    time("bandTable again") { bands.count() }
    val repart = bands.repartition(col("band"), col("band_hash"))
    val cand = repart.as("x").join(repart.as("y"),
        Seq("band", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    time("candidates (band self-join + distinct)") {
      println(s"[probe] n_candidates = ${cand.count()}")
    }
    time("full minhashLsh (warm)") { graft.operators.Dedup.minhashLsh(docs).count() }
    time("dedup_containment (warm1)") { graft.operators.Dedup.containmentPairs(docs).count() }
    time("dedup_containment (warm2)") { graft.operators.Dedup.containmentPairs(docs).count() }
    val media = graft.operators.Multimodal.realisticMedia(docs)
    println(s"[probe] n_media = ${media.count()}")
    time("media combo (warm1)") {
      graft.operators.Multimodal.mediaNearDupWith(media, 2, combo = true).count()
    }
    time("media combo (warm2)") {
      graft.operators.Multimodal.mediaNearDupWith(media, 2, combo = true).count()
    }
    spark.stop()
  }
}
