package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design for scale: every near-dup variant is
  * shingle/signature (per-row map, codegen'd higher-order functions)
  * → band/bucket explode → shuffle ON THE BUCKET KEY ONLY → pair join
  * within buckets → exact verify on candidates. The candidate
  * generation never compares all pairs — the only O(n²) work is inside
  * a bucket, and bucket sizes are bounded by the band width. No UDFs,
  * no driver-side state.
  */
object Dedup {

  /** Exact dedup by normalized-content hash: one shuffle on the
    * fingerprint. Output: one row per distinct content with the
    * canonical (min) doc and the duplicate count.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .agg(min("doc_id").as("canonical_doc_id"), count(lit(1)).as("dup_count"))
      .orderBy("canonical_doc_id")

  // ---------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------

  /** Mersenne-ish prime below 2^61; with 32-bit base hashes and
    * coefficients < 2^20, a*h+b < 2^52 — no long overflow (safe under
    * ANSI mode).
    */
  private val P = 2305843009213693951L

  /** Deterministic permutation coefficients (LCG, fixed seed). */
  private def perms(n: Int): Seq[(Long, Long)] = {
    var x = 88172645463325252L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    (0 until n).map(_ => ((next() & 0xFFFFFL) | 1L, next() & 0xFFFFFL))
  }

  /** Distinct character k-shingles of a normalized text column, via
    * substr over an index sequence (codegen'd, no UDF).
    */
  private[operators] def shingleArr(c: Column, k: Int): Column = {
    val norm = lower(regexp_replace(trim(c), "\\s+", " "))
    array_distinct(transform(
      sequence(lit(0), greatest(length(norm) - k, lit(0))),
      i => norm.substr(i + 1, lit(k))))
  }

  /** 32-bit-ish positive hashes of each shingle. */
  private def shingleHashes(sh: Column): Column =
    transform(sh, s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL)))

  /** MinHash signature: sig_i = min over shingle hashes of
    * (a_i*h + b_i) mod P. One nested higher-order expression — stays
    * columnar.
    */
  private def minhashSig(hashes: Column, numPerm: Int): Column = {
    val ab = perms(numPerm)
    array(ab.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(P))))
    }: _*)
  }

  /** Candidate pairs via LSH banding, verified with exact Jaccard on
    * the shingle sets. `bands` × `rowsPerBand` = numPerm.
    *
    * Plan shape: map (shingle+sig) → explode bands (bands× fanout on a
    * narrow projection only) → shuffle on (band, bandHash) via the
    * self-join → distinct pairs → join back to shingle sets → verify.
    */
  def minhashLsh(documents: DataFrame, k: Int = 5, numPerm: Int = 64,
                 bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numPerm / bands
    val docs = documents.select(col("doc_id"), shingleArr(col("text"), k).as("sh"))
      .withColumn("sig", minhashSig(shingleHashes(col("sh")), numPerm))
    val banded = docs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(j =>
        xxhash64(slice(col("sig"), j * rowsPerBand + 1, rowsPerBand))): _*)))
      .toDF("doc_id", "band", "band_hash")
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sets = docs.select(col("doc_id"), col("sh"))
    cand
      .join(sets.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sh_a"), "a")
      .join(sets.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "sh_b"), "b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** Exact pairwise n-gram Jaccard on LSH-generated candidates (the
    * verify stage exposed as its own operator, lower threshold).
    */
  def ngramJaccard(documents: DataFrame, k: Int = 3, threshold: Double = 0.2): DataFrame =
    minhashLsh(documents, k = k, numPerm = 64, bands = 32, threshold = threshold)

  // ---------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------

  /** 64-bit SimHash as a bit array: bit b = sign of sum over token
    * hashes of ±1 at position b. Expressed via SQL higher-order
    * functions (shiftright with a column shift amount needs expr()).
    */
  private val simhashBitsExpr =
    """transform(sequence(0, 63), b ->
      |  CASE WHEN aggregate(
      |    transform(split(trim(lower(text)), '\\s+'), w -> xxhash64(w)),
      |    0L,
      |    (acc, h) -> acc + CASE WHEN (h >> b) & 1 = 1 THEN 1L ELSE -1L END) > 0
      |  THEN 1 ELSE 0 END)""".stripMargin

  /** Near-dup pairs by SimHash: chunk banding with `maxHamming + 1`
    * chunks — by pigeonhole, a pair within hamming distance
    * `maxHamming` must agree exactly on ≥1 chunk, so recall is exact.
    * Hamming verify ≤ `maxHamming` on the full 64-bit signature.
    */
  def simhash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val docs = documents.select(col("doc_id"), expr(simhashBitsExpr).as("bits"))
    val numChunks = maxHamming + 1
    // split 64 bit positions into numChunks near-even contiguous runs
    val bounds = (0 to numChunks).map(c => c * 64 / numChunks)
    val chunked = docs.select(
      col("doc_id"), col("bits"),
      posexplode(array((0 until numChunks).map(c =>
        xxhash64(slice(col("bits"), bounds(c) + 1, bounds(c + 1) - bounds(c)))): _*)))
      .toDF("doc_id", "bits", "chunk", "chunk_hash")
    val cand = chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_hash") === col("y.chunk_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.bits").as("bits_a"), col("y.bits").as("bits_b"))
      .distinct()
    cand
      .withColumn("hamming",
        aggregate(zip_with(col("bits_a"), col("bits_b"),
          (x, y) => when(x === y, 0).otherwise(1)), lit(0), (acc, d) => acc + d))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------
  // Embedding cosine near-dup
  // ---------------------------------------------------------------

  /** Deterministic random hyperplanes (LCG, fixed seed) for
    * sign-random-projection LSH over embeddings.
    */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var x = 6364136223846793005L
    def next(): Double = {
      x = x * 2862933555777941757L + 3037000493L
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  private[operators] def dot(v: Column, plane: Seq[Double]): Column =
    aggregate(zip_with(v, array(plane.map(lit): _*),
      (x, y) => x.cast("double") * y), lit(0.0), (acc, z) => acc + z)

  /** Embedding-cosine near-dup pairs: sign-projection signature →
    * 4×4-bit bucket bands → pair join within buckets → exact cosine
    * verify ≥ `threshold`. Same LSH shape as MinHash: no all-pairs
    * comparison, shuffles only on bucket keys. Band width trades
    * recall vs bucket size: 4-bit bands give ~50% recall at cosine
    * ≈0.45 for 1/16 of the pairwise work; real near-dup corpora
    * (cosine ≥0.9) get >99% recall.
    */
  def embeddingNearDup(embeddings: DataFrame, dim: Int = 64,
                       threshold: Double = 0.35): DataFrame = {
    val planes = hyperplanes(16, dim)
    val bits = array(planes.map(p => when(dot(col("embedding"), p) >= 0, 1).otherwise(0)): _*)
    val docs = embeddings.select(col("vec_id"), col("embedding"), bits.as("bits"))
    val banded = docs.select(
      col("vec_id"), col("embedding"),
      posexplode(array((0 until 4).map(c =>
        xxhash64(slice(col("bits"), c * 4 + 1, 4))): _*)))
      .toDF("vec_id", "embedding", "band", "bucket")
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        col("x.embedding").as("va"), col("y.embedding").as("vb"))
      .distinct()
    val dotAB = aggregate(zip_with(col("va"), col("vb"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, z) => acc + z)
    val norm: Column => Column = v =>
      sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, z) => acc + z))
    cand
      .withColumn("cosine", round(dotAB / (norm(col("va")) * norm(col("vb"))), 4))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
      .orderBy("a", "b")
  }
}
