package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.HashExprs

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a single scan with the query
  * vector broadcast, per-partition TakeOrdered + driver merge of k
  * rows; zero shuffles of the embedding table. The per-row cosine is a
  * compiled expression ([[graft.plans.HashExprs.cosineSim]]), not an
  * interpreted higher-order function.
  *
  * Scale path: sign-random-projection LSH buckets (shared with
  * [[Dedup.embeddingNearDup]]) — probe only the query's bucket(s),
  * turning a full scan into a partition-pruned fraction.
  */
object Similarity {

  /** Cosine similarity between two array columns. */
  def cosine(a: Column, b: Column): Column = HashExprs.cosineSim(a, b)

  /** Brute-force cosine top-k against the embedding of `queryId`.
    * The 1-row query side is broadcast; the scan side never shuffles.
    */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-bucketed approximate top-k: a small deterministic codebook
    * (hash-sampled corpus vectors) partitions the corpus into inverted
    * lists; a probe scores only the `nProbe` lists nearest the query.
    *
    * At scale the assignment is computed once at ingest and the table
    * is PARTITIONED BY the list id, so a probe is a partition-pruned
    * read of nProbe/nCentroids of the data. The codebook is driver-side
    * metadata (kilobytes) like a broadcast-join build side; a trained
    * (k-means) codebook drops in without changing the plan shape.
    */
  /** Row field → double array regardless of float/double element type. */
  private def vecOf(row: org.apache.spark.sql.Row, field: String): Array[Double] =
    row.getAs[scala.collection.Seq[Any]](field)
      .map(_.asInstanceOf[Number].doubleValue()).toArray

  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // deterministic codebook: the nCentroids corpus vectors with the
    // smallest xxhash64(vec_id) — a uniform sample independent of id order
    val cents: Array[Array[Double]] = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCentroids)
      .collect()
      .map(vecOf(_, "embedding"))
    val assigned = embeddings.select(col("vec_id"), col("embedding"),
      HashExprs.nearestCentroid(col("embedding"), cents).as("list_id"))
    val qRows = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding")).take(1)
    if (qRows.isEmpty)
      // unknown queryId → empty result, matching bruteForceTopK
      return embeddings.filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos_sim"))
    val qVec = vecOf(qRows(0), "embedding")
    // nProbe centroids nearest the query (driver-side over the codebook)
    val probeLists = cents.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(qVec).map { case (x, y) => (x - y) * (x - y) }.sum)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    assigned
      .filter(col("list_id").isin(probeLists.toSeq: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: both the corpus and the query get
    * sign-projection band buckets; only rows sharing a band bucket with
    * the query are scored. On a cluster the bucket id is the partition
    * key, so a probe touches a fraction ~= 2/2^8 of the data.
    */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int, dim: Int = 64): DataFrame = {
    val bits = HashExprs.signProjBits(col("embedding"), Dedup.hyperplanes(16, dim))
    val withBuckets = embeddings.select(col("vec_id"), col("embedding"), bits.as("bits"))
      .select(col("vec_id"), col("embedding"),
        col("bits").bitwiseAND(lit(0xFFL)).as("b0"),
        shiftrightunsigned(col("bits"), 8).bitwiseAND(lit(0xFFL)).as("b1"))
    val q = withBuckets.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("b0").as("qb0"), col("b1").as("qb1"))
    withBuckets.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .filter(col("b0") === col("qb0") || col("b1") === col("qb1"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_embedding")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
