package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time the stages of the near-dup clustering pipeline
  * separately (LSH pair generation vs label-propagation rounds) at a
  * given SF dir. Not part of the query surface.
  */
object ClusterProbe {
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
    // warm the parquet reader + sketch JIT
    time("warm lsh (run 1)") {
      graft.operators.Dedup.minhashLsh(docs).count()
    }
    val pairs = time("lsh pairs (run 2, warm)") {
      val p = graft.operators.Dedup.minhashLsh(docs).select("a", "b")
      println(s"[probe] n_pairs = ${p.count()}")
      p
    }
    time("clusterPairs total (warm)") {
      graft.operators.Dedup.clusterPairs(pairs, docs.select("doc_id")).count()
    }
    time("full minhashClusters (cold plan)") {
      graft.operators.Dedup.minhashClusters(docs).count()
    }
    spark.stop()
  }
}
