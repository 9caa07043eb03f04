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
}
