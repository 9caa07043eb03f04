package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's Flask query surface (reference: api/app.py)
  * re-expressed as declarative Spark plans. Each of these is a
  * filter/project/distinct over either a base table or a rollup —
  * fully pushdown-friendly (point lookups and range filters reach the
  * parquet scan as `PushedFilters`).
  */
object ApiSurface {

  /** GET /api/companies — entity inventory (api/app.py:15-21). */
  def companies(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"), col("c_name")).orderBy("c_custkey")

  /** GET /api/agg_types/<company> — distinct grains available for one
    * series (api/app.py:82-99).
    */
  def aggTypes(combined: DataFrame, entityId: Long): DataFrame =
    combined.filter(col("entity_id") === entityId)
      .select("agg_type").distinct().orderBy("agg_type")

  /** GET /api/period_keys/<company>?agg_type= (api/app.py:102-129). */
  def periodKeys(grainFrame: DataFrame, entityId: Long): DataFrame =
    grainFrame.filter(col("entity_id") === entityId)
      .select("period_key").distinct().orderBy("period_key")

  /** GET /api/data/<company>?agg_type=&start_period=&end_period= —
    * range scan over one series at one grain (api/app.py:24-79).
    * period_key BETWEEN is a string-range predicate that partition-
    * prunes when the table is laid out by period.
    */
  def dataRange(grainFrame: DataFrame, entityId: Long,
                start: String, end: String): DataFrame =
    grainFrame.filter(col("entity_id") === entityId &&
        col("period_key") >= start && col("period_key") <= end)
      .orderBy("period_key")

  /** GET /api/data/<company>?agg_type=&period_key= — point lookup on
    * one grain (api/app.py:24-79, the period_key-equality branch).
    */
  def dataPoint(grainFrame: DataFrame, entityId: Long, periodKey: String): DataFrame =
    grainFrame.filter(col("entity_id") === entityId && col("period_key") === periodKey)

  /** GET /api/reports/list/<year>/<period>?search=&page=&limit= —
    * substring search + deterministic pagination + the response's
    * total_count (api/app.py:213-286). total_count is a window count
    * over the filtered set, so one pass serves both the page and the
    * pagination metadata.
    */
  def reportList(customer: DataFrame, needle: String, page: Int, limit: Int): DataFrame = {
    val w = Window.orderBy(col("c_custkey"))
    customer
      .filter(lower(col("c_name")).contains(needle.toLowerCase))
      .select(col("c_custkey"), col("c_name"))
      .withColumn("rn", row_number().over(w))
      .withColumn("total_count", count(lit(1)).over())
      .filter(col("rn") > (page - 1) * limit && col("rn") <= page * limit)
  }

  /** GET /api/iqplus/news?search= — case-insensitive substring search,
    * newest first (api/app.py:133-172).
    */
  def search(documents: DataFrame, needle: String): DataFrame =
    documents.filter(lower(col("text")).contains(needle.toLowerCase))
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id").desc)

  /** GET /api/reports/list — search + deterministic pagination
    * (api/app.py:213-286; reference default limit is 9). Pagination is
    * a row_number window over a total order, so any page is
    * reproducible on a cluster.
    */
  def paginate(customer: DataFrame, page: Int, limit: Int): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > (page - 1) * limit && col("rn") <= page * limit)
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("rn"))
  }

  /** GET /api/reports/detail — point lookup (api/app.py:291-350).
    * The equality predicate is pushed to the scan.
    */
  def detail(part: DataFrame, partkey: Long): DataFrame =
    part.filter(col("p_partkey") === partkey)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), round(col("p_retailprice"), 2).as("retailprice"))
}
