package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-level timing of embedPcaPower. Not part of the
  * query surface.
  */
object PcaProbe {
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
    time("warm full embedPcaPower (run 1)") {
      graft.operators.Similarity.embedPcaPower(vecs).count()
    }
    time("full embedPcaPower (run 2, warm)") {
      graft.operators.Similarity.embedPcaPower(vecs).count()
    }
    val emb = vecs.select(col("embedding").cast("array<double>").as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist+materialize emb") { emb.count() }
    val d = time("head d") { emb.select(size(col("e"))).head().getInt(0) }
    val v0 = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    (1 to 3).foreach { i =>
      time(s"one fused step (iter $i)") {
        emb.select(graft.plans.SketchAggs.pcaPowerStep(col("e"), v0)).head()
      }
    }
    emb.unpersist()
    spark.stop()
  }
}
