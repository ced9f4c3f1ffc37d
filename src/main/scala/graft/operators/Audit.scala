package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse audit operators: declarative data-quality constraint checking
  * (the dbt-test / Deequ shape) and ANALYZE-style per-column statistics
  * (what a cost-based optimizer ingests). Cost contract: all plain-
  * aggregate checks on a table fold into ONE scan of it (a multi-counter
  * agg unpivoted); each referential-integrity check adds one anti-join
  * probe of its fact side with the dimension key set broadcast. That sum —
  * a scan per table plus a probe per FK — is what lets the audit run on
  * every load at any scale.
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
    // plain-aggregate checks FOLD into one scan per table (a stack()
    // unpivot of a single multi-counter agg row) — six independent jobs
    // would rescan orders/lineitem once per check and break the
    // one-scan-per-table contract above; only the FK anti-joins need their
    // own probe shape
    val ordersAggChecks = orders
      .agg((count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("uniq_v"),
        count(when(col("o_totalprice") <= 0, 1)).as("pos_v"))
      .select(expr(
        "stack(2, 'orderkey_unique', uniq_v, 'totalprice_positive', pos_v) AS (check, v)"))
      .select(col("check"), col("v").as("n_violations"), (col("v") === 0L).as("passed"))
    val liAggChecks = li
      .agg(count(when(col("l_shipdate").isNull, 1)).as("dates_v"),
        count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("qty_v"))
      .select(expr(
        "stack(2, 'shipdate_not_null', dates_v, 'quantity_in_band', qty_v) AS (check, v)"))
      .select(col("check"), col("v").as("n_violations"), (col("v") === 0L).as("passed"))
    val fkOrdersCust = orders.select(col("o_custkey"))
      .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkLineOrders = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    checkRow("orders_custkey_fk", fkOrdersCust)
      .unionAll(checkRow("lineitem_orderkey_fk", fkLineOrders))
      .unionAll(ordersAggChecks)
      .unionAll(liAggChecks)
  }

  /** Table diff / reconciliation: compare two versions of a keyed table and
    * classify every key as added, removed, or changed — the anti-entropy
    * check run after a migration or replication. The "new" version here is
    * synthesized from orders (a price-touched slice, a dropped slice, an
    * added tail via key shift). Both sides reduce to (key, row-hash) BEFORE
    * the full-outer join, so the exchange carries 16 bytes per row no
    * matter how wide the table — the same hash-not-payload discipline as
    * the dedup pipeline; at scale both sides also prune to changed
    * partitions first. Unchanged rows (the overwhelming majority) are
    * filtered out pre-shuffle-free — they drop after the join, whose cost
    * is the one keyed exchange. */
  def tableDiff(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    def hashed(df: DataFrame) = df.select(col("o_orderkey").as("key"),
      xxhash64(col("o_orderstatus"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long")).as("h"))
    val v1 = hashed(orders)
    // new version: one slice dropped, one price-touched, one appended under
    // fresh keys (-(key+1), strictly negative so key 0 can't collide with
    // its own re-addition)
    val v2 = hashed(
      orders.filter(col("o_orderkey") % 41 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 31 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(orders.filter(col("o_orderkey") % 43 === 0)
          .withColumn("o_orderkey", -(col("o_orderkey") + 1))))
    v1.withColumnRenamed("h", "h1")
      .join(v2.withColumnRenamed("h", "h2"), Seq("key"), "full")
      .withColumn("change",
        when(col("h2").isNull, "removed")
          .when(col("h1").isNull, "added")
          .when(col("h1") =!= col("h2"), "changed"))
      .filter(col("change").isNotNull)
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n_keys"), sum(col("key")).as("key_checksum"))
  }

  /** Small-files audit: per-file row counts for the lineitem table via
    * `input_file_name()` — the scan-health diagnostic behind compaction
    * decisions (many small files = many tasks + metadata pressure; one
    * giant file = no parallelism). Pure scan + one tiny agg keyed on file
    * name; emits the distribution summary, not per-file rows. */
  def fileAudit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("rows"))
      .agg(count(lit(1)).as("n_files"),
        min(col("rows")).as("min_rows"),
        max(col("rows")).as("max_rows"),
        sum(col("rows")).as("total_rows"))

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
