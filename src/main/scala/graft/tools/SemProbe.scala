package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-level timing of the semantic cluster family at a
  * given SF dir (codebook derivation, assignment, pair join, label
  * propagation). Not part of the query surface.
  */
object SemProbe {
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
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val n = vecs.count()
    println(s"[probe] n_embeddings = $n")
    // warm everything once
    time("warm semantic_clusters (run 1)") {
      graft.operators.Similarity.semanticClusters(vecs,
        graft.operators.Similarity.headCodebookSized(vecs)).count()
    }
    val cents = time("headCodebookSized (warm)") {
      graft.operators.Similarity.headCodebookSized(vecs)
    }
    println(s"[probe] k = ${cents.length}")
    val books = time("headTwoLevelBooks (warm)") {
      graft.operators.Similarity.headTwoLevelBooks(vecs)
    }
    println(s"[probe] grid = ${books.nFine}")
    time("semantic pair-edge count (flat, warm)") {
      val assigned = vecs.select(col("vec_id"), col("embedding"),
        graft.plans.HashExprs.nearestCentroid(col("embedding"), cents).as("list_id"))
      val a = assigned.select(col("list_id"), col("vec_id").as("a"), col("embedding").as("va"))
      val b = assigned.select(col("list_id"), col("vec_id").as("b"), col("embedding").as("vb"))
      val m = a.join(b, "list_id").filter(col("a") < col("b"))
        .filter(round(graft.plans.HashExprs.cosineSim(col("va"), col("vb")), 4) >= 0.35)
        .count()
      println(s"[probe] n_semantic_edges = $m")
    }
    time("semantic_clusters total (warm)") {
      graft.operators.Similarity.semanticClusters(vecs, cents).count()
    }
    time("semantic_clusters_twolevel total (warm)") {
      graft.operators.Similarity.semanticClustersTwoLevel(vecs, books).count()
    }
    time("semantic_weights total (warm)") {
      graft.operators.Similarity.semanticWeights(vecs, cents).count()
    }
    spark.stop()
  }
}
