package graft

import org.apache.spark.sql.functions._
import graft.plans.HashExprs
import graft.sources.Sinks

/** Specs for the compiled sketch expressions and their SQL surface. */
class HashExprsSpec extends SparkSpec {

  test("minhash signature estimates Jaccard and lanes are independent") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = a + " extra"
    val df = Seq((a, b)).toDF("a", "b").select(
      HashExprs.minhashText(col("a"), 5, 256, word = false).as("sa"),
      HashExprs.minhashText(col("b"), 5, 256, word = false).as("sb"),
      HashExprs.jaccardText(col("a"), col("b"), 5, word = false).as("j"))
    val row = df.head()
    val sa = row.getAs[scala.collection.Seq[Long]]("sa")
    val sb = row.getAs[scala.collection.Seq[Long]]("sb")
    val j = row.getAs[Double]("j")
    // distinct lane values — a degenerate permutation family collapses
    // every lane to the same min (the (a*h+b) mod-no-op failure mode)
    assert(sa.distinct.size > 200)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.size
    assert(math.abs(est - j) < 0.15, s"minhash estimate $est vs true $j")
  }

  test("jaccard_text matches a hand-computed shingle Jaccard") {
    import spark.implicits._
    // char 2-shingles: "abcd" -> {ab,bc,cd}; "bcde" -> {bc,cd,de}
    // intersection {bc,cd} = 2, union {ab,bc,cd,de} = 4 -> 0.5
    val j = Seq(("abcd", "bcde")).toDF("a", "b")
      .select(HashExprs.jaccardText(col("a"), col("b"), 2, word = false))
      .head().getDouble(0)
    assert(j === 0.5)
    // word 2-grams: "x y z" vs "x y w" -> {"x y","y z"} vs {"x y","y w"} -> 1/3
    val jw = Seq(("x y z", "x y w")).toDF("a", "b")
      .select(HashExprs.jaccardText(col("a"), col("b"), 2, word = true))
      .head().getDouble(0)
    assert(math.abs(jw - 1.0 / 3.0) < 1e-12)
  }

  test("simhash64 is deterministic and identical for identical token sets") {
    import spark.implicits._
    val out = Seq("a b c d e f", "a b c d e f", "q r s t u v")
      .toDF("t")
      .select(HashExprs.simhash64(split(col("t"), " ")).as("s"))
      .collect().map(_.getLong(0))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }

  test("cosine_sim handles float arrays, orthogonal and identical vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
                 (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
                 (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(HashExprs.cosineSim(col("a"), col("b")).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1.0, 0.0, 0.0))
  }

  test("sketch functions are callable from SQL via GraftExtensions") {
    val c = spark.sql("SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val j = spark.sql("SELECT jaccard_text('abcd', 'bcde', 2, false) AS j")
      .head().getDouble(0)
    assert(j === 0.5)
    val sig = spark.sql("SELECT minhash_text('hello world of spark', 5, 16, false) AS s")
      .head().getAs[scala.collection.Seq[Long]]("s")
    assert(sig.size === 16)
    val sh = spark.sql("SELECT simhash64(split('a b c', ' ')) AS h").head().getLong(0)
    assert(sh !== 0L)
  }

  test("partitioned sink writes per-period directories and prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val combined = operators.Rollups.combined(operators.Rollups.series(
      sources.Tables.orders(spark, sfDir), "o_custkey", "o_orderdate", "o_totalprice"))
    Sinks.writePartitioned(combined, dir, Seq("agg_type"))
    assert(new java.io.File(s"$dir/agg_type=month").isDirectory)
    val back = Sinks.readPartitioned(spark, dir).filter(col("agg_type") === "year")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("agg_type"))
    assert(back.count() > 0)
    assert(back.select("agg_type").distinct().head().getString(0) === "year")
  }
}
