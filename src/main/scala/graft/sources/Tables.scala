package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the TPC-H-ish test corpus.
  *
  * All loads are plain declarative scans so Catalyst can push filters
  * and prune columns down to the parquet reader (verify with
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`). At 100 TB
  * each of these would be a partitioned table; nothing here assumes a
  * single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which the vectorized
    * parquet reader rejects; read it as a nanos long and convert to a
    * micros timestamp (integer division — nanos-since-epoch exceeds
    * double precision). The corpus' min inter-event gap is ~59 ms, so
    * micros truncation never reorders events.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true`, set at
    * session build time (Bench / Verify / Explain / the test base do) —
    * it is session-wide, so it is NOT set here as a read side effect;
    * fail fast with a pointer instead of a confusing reader error.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "Tables.events needs spark.sql.legacy.parquet.nanosAsLong=true; " +
        "set it on the SparkSession builder (session-wide by design)")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
