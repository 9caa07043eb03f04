package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS over the warehouse tables —
  * the validation stage every production ETL runs between extract and
  * load (the reference validates row-by-row in driver Python inside
  * its transforms, e.g. the try/except casts of
  * idx_transformation_load_script.py:207-301; here the checks are a
  * declarative report the load stage gates on).
  *
  * Contract: one row per named check — rows checked, violations
  * found, pass/fail. All counts, so the report is engine-exact.
  *
  * Scale shape: ONE scan and ONE single-row aggregate per table —
  * every check against a table is a conditional sum inside the same
  * aggregate (adding a check is free), then the bounded per-table
  * rows are stacked. Referential integrity rides the same orders
  * pass: a broadcast LEFT join against the dimension's key column
  * (dims broadcast — the q5 join contract), so the FK check costs no
  * extra shuffle of the fact table.
  */
object DataQuality {

  /** Stack one aggregated row of (n_checked, per-check violation
    * counts) into (check, n_checked, n_violations, pass) rows.
    */
  private def stackChecks(agged: DataFrame, checks: Seq[String]): DataFrame = {
    val pairs = checks.map(c => s"'$c', `$c`").mkString(", ")
    agged.select(
      expr(s"stack(${checks.size}, $pairs)").as(Seq("check", "n_violations")),
      col("n_checked"))
      .select(col("check"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  private def vio(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** Per-column PROFILE of the orders table — the discovery companion
    * of [[report]] (expectations check known rules; the profile is
    * where the rules come from): row count, nulls, exact distinct,
    * numeric min/max per column. One single-row aggregate over one
    * scan (every column's stats are more aggregate expressions in the
    * same pass), stacked to a bounded row-per-column table. Non-numeric
    * columns carry null min/max (engine-portable — cross-type string
    * rendering of doubles/dates is NOT), and dates profile as
    * null/distinct only.
    */
  def profileOrders(orders: DataFrame): DataFrame = {
    val agged = orders.agg(
      count(lit(1)).as("n"),
      vio(col("o_custkey").isNull).as("ck_null"),
      count_distinct(col("o_custkey")).as("ck_distinct"),
      min(col("o_custkey")).cast("double").as("ck_min"),
      max(col("o_custkey")).cast("double").as("ck_max"),
      vio(col("o_totalprice").isNull).as("tp_null"),
      count_distinct(col("o_totalprice")).as("tp_distinct"),
      min(col("o_totalprice")).cast("double").as("tp_min"),
      max(col("o_totalprice")).cast("double").as("tp_max"),
      vio(col("o_orderdate").isNull).as("od_null"),
      count_distinct(col("o_orderdate")).as("od_distinct"),
      vio(col("o_orderstatus").isNull).as("os_null"),
      count_distinct(col("o_orderstatus")).as("os_distinct"))
    agged.select(
      expr("""stack(4,
        'o_custkey',    ck_null, ck_distinct, ck_min, ck_max,
        'o_totalprice', tp_null, tp_distinct, tp_min, tp_max,
        'o_orderdate',  od_null, od_distinct, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        'o_orderstatus', os_null, os_distinct, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))""")
        .as(Seq("column", "n_null", "n_distinct", "min_v", "max_v")),
      col("n"))
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_v"), col("max_v"))
      .orderBy("column")
  }

  def report(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
             events: DataFrame): DataFrame = {
    val ordersChecked = stackChecks(
      orders
        .join(broadcast(customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(
          count(lit(1)).as("n_checked"),
          vio(col("o_totalprice").isNull || col("o_totalprice") <= 0)
            .as("orders_total_positive"),
          vio(col("o_orderdate").isNull).as("orders_date_present"),
          vio(col("c_custkey").isNull).as("orders_customer_fk")),
      Seq("orders_total_positive", "orders_date_present", "orders_customer_fk"))
    val lineitemChecked = stackChecks(
      lineitem.agg(
        count(lit(1)).as("n_checked"),
        vio(col("l_quantity").isNull || col("l_quantity") <= 0 || col("l_quantity") > 50)
          .as("lineitem_qty_range"),
        vio(col("l_discount").isNull || col("l_discount") < 0 || col("l_discount") > 1)
          .as("lineitem_discount_range"),
        vio(col("l_extendedprice").isNull || col("l_extendedprice") <= 0)
          .as("lineitem_price_positive")),
      Seq("lineitem_qty_range", "lineitem_discount_range", "lineitem_price_positive"))
    val eventsChecked = stackChecks(
      events.agg(
        count(lit(1)).as("n_checked"),
        vio(!col("event_type").isin("click", "view", "purchase", "signup", "error"))
          .as("events_type_enum"),
        vio(col("value").isNull || col("value") < 0).as("events_value_nonneg"),
        vio(col("user_id").isNull).as("events_user_present")),
      Seq("events_type_enum", "events_value_nonneg", "events_user_present"))
    ordersChecked
      .unionByName(lineitemChecked)
      .unionByName(eventsChecked)
      .orderBy("check")
  }

  /** Data-quality TREND — [[report]]'s time axis: the same conditional
    * violation sums per event DAY, plus the violation rate in integer
    * bp. A one-off report says whether the table is clean; the trend
    * says WHEN it stopped being clean (the deploy that broke an enum
    * shows up as a step). ONE grouped aggregate (adding a check is
    * free — the dq_report contract); output bounded by the day span.
    */
  def trend(events: DataFrame): DataFrame = {
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        vio(!col("event_type").isin("click", "view", "purchase", "signup", "error"))
          .as("v_type"),
        vio(col("value").isNull || col("value") < 0).as("v_value"),
        vio(col("user_id").isNull).as("v_user"))
      .withColumn("v_total", col("v_type") + col("v_value") + col("v_user"))
      .select(col("day"), col("n_events"), col("v_type"), col("v_value"),
        col("v_user"),
        expr("(2 * v_total * 10000 + n_events) div (2 * n_events)")
          .as("violation_bp"))
      .orderBy("day")
  }
}
