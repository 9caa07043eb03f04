package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextAnalysis
import graft.operators.{Dedup, TextPipeline}
import graft.sources.{Ingest, Sinks}

/** End-to-end pipeline composition: the reference's extract →
  * transform → load DAG rebuilt from library stages, asserting the
  * stages CHAIN (schemas line up, no stage breaks the next), not just
  * that each works alone.
  */
class PipelineSpec extends SparkSpec {

  test("ingest → clean → quality filter → content dedup → partitioned load → pruned read") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    val dir = Files.createTempDirectory("graft_pipe_in").toString
    val good = "the quick brown fox jumps over the lazy dog and keeps on running " * 3
    Files.write(java.nio.file.Paths.get(dir, "crawl.jsonl"), java.util.Arrays.asList(
      s"""{"doc_id": 1, "lang": "en", "text": "$good"}""",
      s"""{"doc_id": 2, "lang": "en", "text": "${good.toUpperCase}  "}""", // near-identical: case+ws
      s"""{"doc_id": 3, "lang": "de", "text": "$good again and again with more words to pass the filter"}""",
      """{"doc_id": 4, "lang": "en", "text": "too short"}""",
      """{"doc_id": 5, "lang": "en"""))                                    // malformed

    // extract: permissive ingest with quarantine
    val in = Ingest.jsonWithQuarantine(spark, dir, schema)
    assert(in.quarantined.count() === 1)

    // transform: clean text, then the quality keep/drop decision
    val cleaned = in.good.withColumn("text", TextAnalysis.cleanCol(col("text")))
    val kept = TextAnalysis.qualityFilter(cleaned, minQuality = 0.1, minWords = 10)
      .select("doc_id")
    val keptDocs = cleaned.join(kept, "doc_id")
    assert(keptDocs.count() === 3) // doc 4 dropped by word count

    // dedup: exact content dedup collapses 1 and 2 (case/ws variants)
    val canonical = Dedup.exact(keptDocs)
      .select(col("canonical_doc_id").as("doc_id"))
    val finalDocs = keptDocs.join(canonical, "doc_id")
    assert(finalDocs.count() === 2)
    assert(finalDocs.collect().map(_.getAs[Long]("doc_id")).toSet === Set(1L, 3L))

    // load: partitioned by lang, then a pruned point read
    val out = Files.createTempDirectory("graft_pipe_out").toString
    Sinks.upsertPartitions(finalDocs, out, Seq("lang"))
    val de = Sinks.readPartitioned(spark, out).filter(col("lang") === "de")
    assert(de.count() === 1)
    val plan = de.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"read must prune on the lang partition:\n$plan")

    // a delta batch arriving later: the re-crawled duplicate is not new
    val delta = TextPipeline.contentDelta(
      cleaned.filter(col("doc_id") === 2L), finalDocs)
    assert(delta.count() === 0)
  }

  test("tokenizer lifecycle: train → persist → load → encode → shard the epoch") {
    val docs = sources.Tables.documents(spark, sfDir)
    // train on the corpus, persist the model artifact
    val modelDir = Files.createTempDirectory("graft_pipe_bpe").toString + "/model"
    val trained = operators.Corpus.bpeTrain(docs, nMerges = 8)
    assert(trained.size === 8)
    operators.Corpus.writeBpeModel(spark, trained, modelDir)
    // a separate job loads the artifact and encodes the corpus
    val merges = operators.Corpus.loadBpeModel(spark, modelDir)
    val encoded = operators.Corpus.bpeEncodeDocs(docs, merges)
    val total = encoded.agg(sum("n_tokens")).head().getLong(0)
    val chars = docs.select(sum(length(
      TextAnalysis.normalizeWs(col("text"))))).head().getLong(0)
    assert(total > 0 && total < chars,
      "trained merges must compress below character count")
    // the encoded corpus shards into a written epoch whose row order
    // replays the permutation (writeShards consumes any doc_id frame)
    val epochDir = Files.createTempDirectory("graft_pipe_epoch").toString + "/e0"
    sources.Sinks.writeShards(
      encoded.withColumnRenamed("encoded", "text"), epochDir, numShards = 2)
    val back = spark.read.parquet(epochDir)
    assert(back.count() === docs.count())
    assert(back.columns.toSet === Set("doc_id", "text", "n_tokens", "shard", "pos"))
  }
}
