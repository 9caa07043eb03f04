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
  /** Schema-adaptive events loader. The corpus' `ts` column has shipped
    * in two physical encodings over time, and real upstream feeds drift
    * the same way — so dispatch on the type the scan actually reports
    * rather than assuming one:
    *
    *  - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` → Spark reads
    *    `TimestampNTZType`; cast to the session-TZ `TimestampType` so
    *    every downstream consumer (epoch-second gap math, `date_format`
    *    period keys) sees the same semantics as the historical encoding.
    *    Sessions here run with `spark.sql.session.timeZone=UTC`, so the
    *    cast is value-preserving on the underlying micros.
    *  - `TIMESTAMP(MICROS/MILLIS, adjusted)` → already `TimestampType`,
    *    use as-is.
    *  - `TIMESTAMP(NANOS)` surfaces as a nanos-since-epoch `LongType`
    *    (only when `spark.sql.legacy.parquet.nanosAsLong=true`; the
    *    vectorized reader rejects nanos otherwise — fail fast with a
    *    pointer in that branch). Convert with integer division
    *    (nanos-since-epoch exceeds double precision); the corpus' min
    *    inter-event gap is ~59 ms, so micros truncation never reorders.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "events.ts is a nanos long; Tables.events needs " +
            "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession builder")
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected timestamp or nanos long")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
