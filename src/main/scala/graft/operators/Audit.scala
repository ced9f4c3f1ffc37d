package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse audit operators: declarative data-quality constraint checking
  * (the dbt-test / Deequ shape) and ANALYZE-style per-column statistics
  * (what a cost-based optimizer ingests). Both are one-pass aggregations —
  * the audit never costs more than a scan per table, which is the contract
  * that lets it run on every load at any scale.
  */
object Audit {

  /** Constraint suite over the warehouse tables: referential integrity
    * (anti-join counts), key uniqueness, domain checks. One row per check
    * with its violation count — the report a load gate consumes. Each FK
    * check is an anti-join whose dimension side broadcasts; uniqueness is
    * count − distinct on the key column only. */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    def checkRow(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check"), col("v").as("n_violations"),
        (col("v") === 0L).as("passed"))
    val fkOrdersCust = orders.select(col("o_custkey"))
      .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkLineOrders = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val uniqOrderkey = orders
      .agg((count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("v"))
    val posPrice = orders.agg(count(when(col("o_totalprice") <= 0, 1)).as("v"))
    val liDates = li.agg(count(when(col("l_shipdate").isNull, 1)).as("v"))
    val qtyBand = li.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("v"))
    checkRow("orders_custkey_fk", fkOrdersCust)
      .unionAll(checkRow("lineitem_orderkey_fk", fkLineOrders))
      .unionAll(checkRow("orderkey_unique", uniqOrderkey))
      .unionAll(checkRow("totalprice_positive", posPrice))
      .unionAll(checkRow("shipdate_not_null", liDates))
      .unionAll(checkRow("quantity_in_band", qtyBand))
  }

  /** ANALYZE-style column statistics for orders: one single-mode aggregate
    * PER column, unioned. Not one multi-distinct aggregate — N exact
    * countDistincts in one agg force RewriteDistinctAggregates to Expand
    * the input N× (the q_approx_distinct pathology, measured 2.3 s here vs
    * 0.4 s split), while the split form gives every agg a scan pruned to
    * ITS column — at warehouse scale that is N cheap column reads instead
    * of an N× row multiplication. Min/max serialize as strings so
    * heterogeneous columns share one schema — doubles go through exact
    * integer cents first (double→string formatting is not engine-portable;
    * integers and dates are). */
  def columnStats(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    def stat(name: String, c: org.apache.spark.sql.Column): DataFrame =
      orders.select(c.as("x")).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("x")).as("ndv"),
        count(when(col("x").isNull, 1)).as("n_nulls"),
        min(col("x")).cast("string").as("min_value"),
        max(col("x")).cast("string").as("max_value"))
        .select(lit(name).as("column"), col("n_rows"), col("ndv"),
          col("n_nulls"), col("min_value"), col("max_value"))
    stat("o_orderkey", col("o_orderkey"))
      .unionAll(stat("o_custkey", col("o_custkey")))
      .unionAll(stat("o_orderstatus", col("o_orderstatus")))
      .unionAll(stat("o_orderpriority", col("o_orderpriority")))
      .unionAll(stat("o_orderdate", to_date(col("o_orderdate"))))
      .unionAll(stat("o_totalprice_cents", floor(col("o_totalprice") * 100).cast("long")))
  }
}
