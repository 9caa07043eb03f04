package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — a training-data staple: the sample
  * must be reproducible across runs/engines (no `rand()`), cheap
  * (scan-only, no shuffle), and stratifiable (per-language / source
  * rates).
  */
object Sampling {

  /** Content-keyed hash bucket in [0, 100): the first 8 hex digits of
    * md5 of the key, mod 100. Keying on a stable id (not the row
    * position) makes the decision a pure function of the record, so
    * re-partitioning, re-ordering, or re-running never changes the
    * sample — and the same rule is trivially re-implementable in any
    * engine for verification.
    */
  def hashBucket(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100)
      .cast("int")

  /** Stratified deterministic sample of the documents table:
    * English docs at `enPct`%, everything else at `otherPct`% —
    * the keep decision is a per-row predicate (pushdown-friendly,
    * zero shuffles, no state), so it runs at scan speed on any
    * corpus size.
    */
  def stratified(documents: DataFrame, enPct: Int = 50, otherPct: Int = 20): DataFrame =
    documents
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") <
        when(col("lang") === "en", lit(enPct)).otherwise(lit(otherPct)))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")

  /** Resample the corpus toward a UNIFORM target language mix — the
    * domain/language re-weighting step of a pre-training data recipe
    * (down-sample the dominant language instead of up-weighting the
    * rare ones). Per-language keep-rates come from the ACTUAL counts:
    * rate_pct = min(100, ⌊100·N / (L·count_lang)⌋) for L languages —
    * the over-represented languages are thinned toward N/L docs each,
    * already-under-represented ones keep everything. The keep decision
    * is the same deterministic content-keyed bucket predicate as
    * [[stratified]].
    *
    * Scale shape: the only aggregation is the per-language count (L
    * rows — kilobytes at any corpus size), computed map-side-combined
    * and broadcast back; the corpus itself is one scan with a pushed
    * predicate. Integer percent rates, not fractional: the rate
    * compares against the 0-99 bucket, so the decision is exact
    * integer arithmetic in any engine.
    */
  /** Leakage-safe train/val/test split: the split is a deterministic
    * function of the near-dup CLUSTER id ([[Dedup.minhashClusters]]),
    * not the document id — so near-duplicates can never straddle
    * train and eval (the classic leakage trap: a test document's
    * near-copy in train inflates every metric). Documents without
    * near-dups are their own singleton cluster and split
    * independently; the bucket rule is the engine-reproducible md5
    * bucket shared by every sampler here.
    *
    * Scale shape: the clustering is the LSH pipeline (bucketed
    * candidate generation, edge-table label propagation); the split
    * assignment itself is a scan over the (doc, cluster) table.
    */
  def leakageSafeSplit(documents: DataFrame, trainPct: Int = 90,
                       valPct: Int = 5): DataFrame =
    Dedup.minhashClusters(documents).select("doc_id", "cluster_id")
      .withColumn("bucket", hashBucket(col("cluster_id")))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")

  /** [[leakageSafeSplit]] over the persisted cluster index
    * ([[Dedup.writeClusterIndex]]): the split becomes a pure scan of
    * the narrow assignment table — no LSH, no clustering, no shuffle
    * (the md5 bucket is a row-local projection). This is the form a
    * recurring split job takes once clustering runs at ingest.
    */
  def splitFromIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                     trainPct: Int = 90, valPct: Int = 5): DataFrame =
    Dedup.liveClusterRows(spark, table)
      .select("doc_id", "cluster_id")
      .withColumn("bucket", hashBucket(col("cluster_id")))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")

  /** Recency-weighted sampling — the freshness knob of a crawl
    * curation recipe: keep-rate decays with document age (15 points
    * per 30-day bucket, floored at 10%), so recent content dominates
    * without discarding the archive. Age comes from the ingest-time
    * `published` column ([[graft.sources.Ingest.withPublishedDate]]);
    * the keep decision is the deterministic md5 bucket. ALL integer
    * arithmetic (day diffs, truncating div) — bit-identical in any
    * engine, unlike months_between-style fractional ages.
    * Scan-only: predicate + projection, no shuffle, no state.
    *
    * The default asOf sits at the END of the stand-in published range
    * (2024-01-01..2024-12-30 — [[graft.sources.Ingest
    * .withPublishedDate]]) so days_old spans 1..365 and the gate
    * exercises every decay bucket (100, 85, … down to the 10% floor),
    * not just the floor branch. It must not precede any published
    * date: a negative days_old truncates toward zero in Spark's `div`
    * but floors in DuckDB's `//`, splitting the engines.
    */
  def recency(documents: DataFrame, asOf: String = "2024-12-31"): DataFrame =
    graft.sources.Ingest.withPublishedDate(documents)
      .withColumn("days_old",
        datediff(to_date(lit(asOf)), to_date(col("published"))))
      .withColumn("rate_pct",
        greatest(lit(10L), lit(100L) - expr("days_old div 30") * 15L))
      .filter(hashBucket(col("doc_id")) < col("rate_pct"))
      .select(col("doc_id"), col("published"), col("days_old").cast("long").as("days_old"),
        col("rate_pct"))
      .orderBy("doc_id")

  /** TOKEN-BUDGET data mixing — the recipe step that [[targetMix]]'s
    * doc-count flattening can't express: training mixes are specified
    * in TOKENS per language/domain, and long-doc languages would blow
    * a doc-count quota. Each language gets the same token budget,
    * `total_corpus_tokens div (2·L)` (a half-size corpus split evenly
    * across L languages); documents are admitted in deterministic
    * (md5 bucket, doc_id) order until the budget fills. A document is
    * kept iff the tokens BEFORE it are under budget — so the boundary
    * document overflows rather than truncates (training pipelines
    * trim the final sequence, not the selection), and every language
    * admits at least one document.
    *
    * Scale shape: the admission order needs a per-language PREFIX SUM,
    * which at 100 TB must not become one sequential window per
    * language (5 languages = 5-way parallelism forever). It runs as
    * the classic two-phase distributed scan: per-(lang, shard) token
    * sums (an L×100-row frame) get exclusive shard offsets from one
    * tiny window, broadcast back; each shard then computes a LOCAL
    * doc-order window and adds its offset — identical arithmetic to
    * the global window (integer sums decompose exactly), parallelism
    * = shard count. The one-row global budget aggregate is a
    * kilobyte reduce ([[graft.operators.Corpus.rarityScore]]'s stats
    * contract).
    */
  def tokenBudgetMix(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents.select(
      col("doc_id"), col("lang"),
      hashBucket(col("doc_id")).as("shard"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val shardSums = toks.groupBy("lang", "shard")
      .agg(sum("n_tokens").as("shard_tokens"))
    // budget off the SHARD SUMS, not a third corpus scan: the shard
    // sums partition the corpus exactly, so their total and lang set
    // are the corpus' own
    val budget = shardSums.agg(
      expr("sum(shard_tokens) div (2 * count(DISTINCT lang))").as("budget"))
    val wOff = Window.partitionBy("lang").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shardSums
      .withColumn("shard_offset", coalesce(sum("shard_tokens").over(wOff), lit(0L)))
      .select("lang", "shard", "shard_offset")
    val wLocal = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("local_before", coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      .join(broadcast(offsets), Seq("lang", "shard"))
      .crossJoin(broadcast(budget))
      .withColumn("tokens_before", col("shard_offset") + col("local_before"))
      .filter(col("tokens_before") < col("budget"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tokens_before"))
      .orderBy("doc_id")
  }

  /** FIXED-SIZE per-stratum sample — exactly `k` documents per
    * language (the eval-set / few-shot-pool recipe: a fixed budget
    * per stratum, not a rate). The "reservoir" is deterministic: the
    * k smallest (md5 hex, doc_id) keys per language — a pure function
    * of content, so re-runs, re-partitioning, and other engines pick
    * the same k documents (a true random reservoir is neither).
    *
    * Scale shape: an exact per-group top-k normally means one sort
    * per group key (5 languages = 5-task parallelism forever). This
    * runs the distributed top-k decomposition instead: per-(lang,
    * md5-shard) LOCAL top-k windows (100-way parallel within every
    * language), then the global per-lang window over the ≤ 100·k
    * shard winners — a constant-size frame at any corpus scale. The
    * two-level rank is exact because a language's global top-k is
    * contained in the union of its shards' top-ks.
    */
  def fixedK(documents: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = documents.select(col("doc_id"), col("lang"),
      md5(col("doc_id").cast("string")).as("hk"),
      hashBucket(col("doc_id")).as("shard"))
    val wShard = Window.partitionBy("lang", "shard").orderBy("hk", "doc_id")
    val wLang = Window.partitionBy("lang").orderBy("hk", "doc_id")
    keyed
      .withColumn("lrk", row_number().over(wShard)).filter(col("lrk") <= k)
      .withColumn("rk", row_number().over(wLang)).filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
      .orderBy("doc_id")
  }

  def targetMix(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the window runs over the L-row counts frame, not the corpus —
    // a single-partition window over kilobytes is free
    val w = Window.partitionBy()
    val rates = documents.groupBy("lang")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum("cnt").over(w))
      .withColumn("n_langs", count(lit(1)).over(w))
      .select(col("lang"),
        least(lit(100L), expr("(100 * total) div (n_langs * cnt)")).as("rate_pct"))
    documents.join(broadcast(rates), "lang")
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < col("rate_pct"))
      .select(col("doc_id"), col("lang"), col("rate_pct"))
      .orderBy("doc_id")
  }

  /** Temperature-flattened language mix (α = ½) — the PARTIAL
    * re-weighting between "keep the natural distribution" (α = 1) and
    * [[targetMix]]'s full flattening (α = 0): sampling weights
    * n_lang^α give per-doc keep rates ∝ n_lang^(α−1) = 1/√n_lang,
    * normalized so the SMALLEST language keeps 100% —
    * rate_pct = ⌊100·√(n_min/n_lang)⌋. The standard multi-domain
    * pre-training recipe (temperature sampling): dominant domains are
    * thinned, rare ones kept, without collapsing to uniform.
    *
    * α = ½ keeps the gate engine-exact without logarithms or pow():
    * n_min/n_lang is one IEEE division of exactly-representable
    * longs and sqrt is correctly rounded by spec in every IEEE
    * engine, so both sides compute bit-identical doubles and the
    * floor'd integer rate matches exactly. Scale shape is
    * [[targetMix]]'s: an L-row count aggregate broadcast back, the
    * corpus itself one scan with the deterministic md5-bucket
    * predicate.
    */
  def temperatureMix(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val rates = documents.groupBy("lang")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_min", min("cnt").over(w))
      .select(col("lang"),
        floor(lit(100d) * sqrt(col("n_min").cast("double") / col("cnt").cast("double")))
          .as("rate_pct"))
    documents.join(broadcast(rates), "lang")
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < col("rate_pct"))
      .select(col("doc_id"), col("lang"), col("rate_pct"))
      .orderBy("doc_id")
  }

  /** Deterministic epoch-shuffled training ORDER — the step after
    * curation and packing: training wants the corpus in a
    * pseudo-random order that is (a) reproducible bit-for-bit across
    * runs and engines (no `rand()`, no partition-order dependence),
    * (b) different per epoch, and (c) writable as a bounded number of
    * shard files whose concatenation IS the epoch order.
    *
    * The shuffle key is md5(seed ":" doc_id): a new seed is a fresh
    * independent permutation (epoch reshuffle), and the key is a pure
    * function of the record, so re-partitioning or re-running never
    * changes the order. `shard` is the key's top 32 bits mod
    * numShards, `pos` ranks the key within its shard — the global
    * epoch order is (shard asc, pos asc), materialized shard-by-shard
    * with NO global sort.
    *
    * Scale shape: one hash exchange on shard + a per-shard sort —
    * parallelism equals numShards, so a real run sizes numShards to
    * the cluster (thousands of shard files for 100 TB, keeping each
    * shard's sort in-memory); there is no single-partition stage and
    * nothing crosses the driver. A global row_number would serialize
    * the corpus through one partition — (shard, pos) is the
    * distributed total order that avoids it.
    */
  def trainShards(documents: DataFrame, numShards: Int = 8, seed: Int = 1): DataFrame =
    withShardOrder(documents.select("doc_id"), numShards, seed)
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")

  /** The shard/pos assignment itself, appended to whatever columns
    * `df` carries — ONE definition of the epoch-order key shared by
    * [[trainShards]] (the order table) and
    * [[graft.sources.Sinks.writeShards]] (the physical epoch write,
    * which needs the documents' payload columns alongside the order
    * WITHOUT a corpus self-join back onto the order table). Output
    * rows come out hash-partitioned by `shard` and sorted
    * (shard, pos) within each partition — exactly the layout a
    * shard-partitioned write needs, so no further exchange follows.
    */
  private[graft] def withShardOrder(df: DataFrame, numShards: Int,
                                    seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    df
      .withColumn("shuffle_key", md5(concat_ws(":", lit(seed), col("doc_id"))))
      .withColumn("shard",
        (conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long")
          % numShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("shuffle_key")
  }
}
