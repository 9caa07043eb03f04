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
}
