package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.HashExprs

/** Corpus-level text operators — the cross-document statistics a
  * pre-training pipeline computes over the WHOLE corpus (vs the
  * per-document scan work in [[graft.functions.TextAnalysis]]).
  */
object Corpus {

  /** Corpus vocabulary: term frequency + document frequency, top-k
    * terms by tf. The classic map-side-combinable aggregation: explode
    * words → one hash aggregate keyed by word (partial aggregation
    * absorbs the token-count explosion before the shuffle, so the
    * exchange carries ≈ |vocab| × partitions rows, not corpus tokens);
    * the distinct doc_id count plans as a two-level aggregate the same
    * way. Top-k via TakeOrdered — no global sort.
    */
  def vocabTopK(documents: DataFrame, k: Int = 50): DataFrame =
    documents
      .select(col("doc_id"),
        explode(split(TextAnalysis.normalizeWs(col("text")), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(col("tf").desc, col("word"))
      .limit(k)

  /** Benchmark decontamination — flag corpus documents that share any
    * word n-gram with a held-out benchmark/eval set (here the
    * deterministic doc_id % benchMod == 0 slice stands in for the
    * benchmark). The standard pre-training hygiene step: a benchmark
    * document leaking into the training corpus inflates eval scores.
    *
    * Plan shape for 100 TB: benchmark n-gram sets are SMALL (eval
    * suites are millions of grams, not billions) — distinct them and
    * broadcast, so the corpus side is one scan + broadcast semi-join
    * with NO corpus shuffle; only the matched (doc, gram) pairs (a
    * tiny fraction) reach the final distinct + per-doc count.
    * Gram STRINGS, not hashes, cross the join so any engine can
    * reproduce the result ([[HashExprs.wordNgrams]]).
    */
  def decontaminate(documents: DataFrame, n: Int = 8, benchMod: Int = 10): DataFrame = {
    val grams = documents.select(col("doc_id"),
      explode(HashExprs.wordNgrams(TextAnalysis.normalizeWs(col("text")), n)).as("gram"))
    val bench = grams.filter(col("doc_id") % benchMod === 0).select("gram").distinct()
    grams.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), "gram")
      .select("doc_id", "gram").distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy("doc_id")
  }
}
