package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-level timing of the incremental cluster merge
  * (dedup_cluster_incremental). Builds the corpus-minus-batch indexes
  * in a temp warehouse, then times each stage. Not part of the query
  * surface.
  */
object IncrProbe {
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
    val docs0 = graft.sources.Tables.documents(spark, sfDir)
    val docs = docs0.unionByName(
      docs0.filter(col("doc_id") % 13 =!= 0 && col("doc_id") % 101 === 7)
        .withColumn("doc_id", lit(13L) * (lit(1000000L) + col("doc_id"))))
    val batch = docs.filter(col("doc_id") % 13 === 0)
    val corpus = docs.filter(col("doc_id") % 13 =!= 0)
    spark.sql("DROP TABLE IF EXISTS g_probe_mh")
    spark.sql("DROP TABLE IF EXISTS g_probe_cl")
    time("build minhash index (ingest)") {
      graft.operators.Dedup.writeMinhashIndex(corpus, "g_probe_mh")
    }
    time("build cluster index (ingest)") {
      graft.operators.Dedup.writeClusterIndex(corpus, "g_probe_cl")
    }
    // warm
    time("warm full clusterIncremental") {
      graft.operators.Dedup.clusterIncremental(spark, "g_probe_mh", "g_probe_cl",
        batch, corpus).count()
    }
    time("minhashLshAgainstIndex(batch) warm") {
      graft.operators.Dedup.minhashLshAgainstIndex(spark, "g_probe_mh",
        batch, corpus).count()
    }
    time("minhashLsh(batch) warm") {
      graft.operators.Dedup.minhashLsh(batch).count()
    }
    time("incrementalEdges warm") {
      graft.operators.Dedup.incrementalEdges(spark, "g_probe_mh", "g_probe_cl",
        batch, corpus).count()
    }
    time("full clusterIncremental warm") {
      graft.operators.Dedup.clusterIncremental(spark, "g_probe_mh", "g_probe_cl",
        batch, corpus).count()
    }
    spark.stop()
  }
}
