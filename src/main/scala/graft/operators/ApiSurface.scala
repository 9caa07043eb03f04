package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** [[dataPoint]] probing the entity's EARLIEST period, derived from
    * the data itself rather than pinned by the caller — the gate form.
    * A hard-coded probe key goes vacuous the moment the dataset
    * regenerates without that (entity, period); deriving it keeps the
    * gate exercising a real row forever. Shape: the one-row min
    * aggregate broadcasts back onto the series — a point lookup plus
    * one bounded reduce, no shuffle of the data.
    */
  def dataPointFirst(grainFrame: DataFrame, entityId: Long): DataFrame = {
    val series = grainFrame.filter(col("entity_id") === entityId)
    val probe = series.agg(min(col("period_key")).as("period_key"))
    series.join(broadcast(probe), Seq("period_key"))
      .select(series.columns.map(col): _*)
  }

  /** GET /api/reports/list/<year>/<period>?search=&page=&limit= —
    * substring search + deterministic pagination + the response's
    * total_count (api/app.py:213-286).
    *
    * Scale shape: a page is a small-k problem, so the global order is
    * taken with `orderBy(...).limit(page·limit)` — a per-partition
    * TakeOrdered + driver merge, never a single-partition global sort.
    * Row numbers are then assigned on that ≤ page·limit-row bounded set
    * (the window's single partition holds at most page·limit rows
    * regardless of table size). total_count is a separate count over
    * the filtered set, broadcast back via cross join — one extra
    * scan+reduce, no shuffle of the data.
    */
  def reportList(customer: DataFrame, needle: String, page: Int, limit: Int): DataFrame = {
    val filtered = customer
      .filter(lower(col("c_name")).contains(needle.toLowerCase))
      .select(col("c_custkey"), col("c_name"))
    val total = filtered.agg(count(lit(1)).as("total_count"))
    val topK = filtered.orderBy(col("c_custkey")).limit(page * limit)
    // rn without any global window: the limited set is ≤ page·limit
    // rows, so one partition is bounded by the page depth, and
    // monotonically_increasing_id over the single sorted partition IS
    // the row number (the sort key is total, so the order is unique)
    topK.coalesce(1).sortWithinPartitions(col("c_custkey"))
      .withColumn("rn", (monotonically_increasing_id() + 1).cast("int"))
      .filter(col("rn") > (page - 1) * limit)
      .crossJoin(broadcast(total))
      .select(col("c_custkey"), col("c_name"), col("rn"), col("total_count"))
  }

  /** GET /api/iqplus/news?search= — case-insensitive substring search,
    * newest first by publication date (api/app.py:133-172 sorts by
    * `metadata.original_date` desc), date-desc with doc_id-desc
    * tiebreak. The `published` column is attached at ingest by
    * [[graft.sources.Ingest.withPublishedDate]] (a deterministic
    * stand-in — the testdata carries no date column); this query just
    * filters, projects, and orders it.
    */
  def search(documents: DataFrame, needle: String): DataFrame =
    graft.sources.Ingest.withPublishedDate(documents)
      .filter(lower(col("text")).contains(needle.toLowerCase))
      .select(col("doc_id"), col("source"), col("lang"), col("published"))
      .orderBy(col("published").desc, col("doc_id").desc)

  /** GET /api/reports/list — search + deterministic pagination
    * (api/app.py:213-286; reference default limit is 9). The page
    * is taken as a global TakeOrdered of page·limit rows (per-partition
    * top-k + driver merge — no single-partition global sort); row
    * numbers are assigned on that bounded set, so the one-partition
    * window never sees more than page·limit rows at any table size.
    */
  def paginate(customer: DataFrame, page: Int, limit: Int): DataFrame = {
    val order = Seq(col("c_acctbal").desc, col("c_custkey"))
    val topK = customer
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(order: _*)
      .limit(page * limit)
    // rn without a global window (see reportList): bounded set, single
    // sorted partition, monotonically_increasing_id = row number
    topK.coalesce(1).sortWithinPartitions(order: _*)
      .withColumn("rn", (monotonically_increasing_id() + 1).cast("int"))
      .filter(col("rn") > (page - 1) * limit)
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
