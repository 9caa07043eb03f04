package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.sources.Tables

/** Diagnostic: recall@k of the IVF probe vs brute force, per nProbe.
  *
  * Usage: runMain graft.tools.IvfRecall [sfDir] [queryId] [k]
  *
  * Recall is what separates usable ANN from demo ANN — tune nProbe /
  * nCentroids on a corpus sample with this before shipping an index.
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val queryId = args.lift(1).map(_.toLong).getOrElse(0L)
    val k = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val truth = Similarity.bruteForceTopK(emb, queryId, k)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    for (nProbe <- Seq(1, 2, 3, 4, 6, 8, 12, 16)) {
      val got = Similarity.ivfTopK(emb, queryId, k, nCentroids = 16, nProbe = nProbe)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      val recall = (got & truth).size.toDouble / truth.size
      println(f"[ivf-recall] nProbe=$nProbe%2d recall@$k = $recall%.3f")
    }
    spark.stop()
  }
}
