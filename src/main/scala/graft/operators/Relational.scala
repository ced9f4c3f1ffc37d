package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface over the driver test tables (SURVEY.md §2.2-2.8).
  *
  * Every query here is declarative DataFrame API — Catalyst gets the whole
  * plan, so predicate pushdown / column pruning / join selection are free.
  * Scale decisions are explicit per query:
  *  - dimension joins (`nation`, `region`) are `broadcast()` — at 100 TB the
  *    fact side never shuffles for them;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once —
  *    sort-merge with AQE skew handling;
  *  - aggregates rely on partial (map-side) aggregation, so the shuffle
  *    carries one row per (partition, group), not per input row;
  *  - all money sums are rounded in-query so result hashes are stable across
  *    summation orders (double addition is not associative; a 1000-executor
  *    run must hash-match the oracle).
  */
object Relational {

  /** P1+P2 analog on testdata: filter + 2-col projection; both reach the
    * parquet scan as PushedFilters/ReadSchema. */
  def filterProject(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id"), col("text").as("text_column"))

  /** P3: IN-list filter (reference language_filter,
    * FunctionApp1/hotel_reviews/__init__.py:21). */
  def filterInList(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("lang").isin("en", "de", "fr"))
      .select(col("doc_id"), col("lang"), col("source"))

  /** P4 analog: predicate on a value extracted from semi-structured data
    * (events.props is a JSON string). */
  def filterJsonField(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k") > 50 && col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("k"))

  /** T1-T5: scalar expression surface — cast, lit, rename, CASE, string fns. */
  def scalarTransforms(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey").cast("string").as("record_id"),        // T1/T3
        lit("en").as("language"),                               // T2
        upper(col("c_mktsegment")).as("segment"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("balance_band"),                // T5
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("tagged"), // T6
        // ×2 is exact in binary floating point, so Spark's decimal-string
        // rounding and DuckDB's binary rounding agree bit-for-bit.
        round(col("c_acctbal") * 2.0, 2).as("adjusted_bal"))

  /** TPC-H Q1-shaped pricing summary: the canonical partial-agg showcase. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Broadcast dimension join: customer ⋈ nation ⋈ region with the dims
    * broadcast — zero shuffle of the fact side at any scale. */
  def joinBroadcastDims(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))

  /** Fact-fact sort-merge join: orders ⋈ lineitem, one shuffle on the key. */
  def joinFactFact(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Left outer join with null-producing side: order counts per customer,
    * customers without orders kept at zero. */
  def joinLeftOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"))

  /** Left-semi join (J1's semantics: id-membership — the reference's
    * `UPDATE ... WHERE id IN (...)`, FunctionApp2/process_data/__init__.py:101). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))

  /** Left-anti join: customers with no orders at all. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Right outer join (SURVEY §2.5): all orders kept, customer attrs null
    * when the (deliberately filtered) build side has no match. Same physical
    * shape as the left join — Spark flips build/stream sides as needed. */
  def joinRightOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") < 500)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "right")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), count(col("c_custkey")).as("n_matched"))

  /** Full outer join (SURVEY §2.5): high-balance customers ⋈ big orders,
    * classified by which side survived — exercises null production on BOTH
    * sides in one query. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_acctbal") > 9900).select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_totalprice") > 300000).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("order_only").as("side"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Non-equi (range) predicate riding on an equi join: lineitems shipped
    * within 60 days of their order date. The equi key carries the shuffle;
    * the range term stays a cheap post-join filter. */
  def joinRange(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_fast_shipped"))

  /** Cross join (tiny × tiny only — anything else is a bug at scale). */
  def joinCross(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    r.select(col("r_name").as("left_region"))
      .crossJoin(r.select(col("r_name").as("right_region")))
  }

  /** Top-k: orderBy+limit plans as TakeOrderedAndProject — per-partition
    * top-k then a k-row merge on the driver; no global sort materialized.
    * Tie-break on the unique key keeps it deterministic. */
  def topKOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** O2 general pagination: page k of a global ordering via row_number.
    * The global (unpartitioned) window funnels through one task — correct
    * but documented as the semantic cost of global pagination; prefer
    * keyset pagination (`WHERE sortkey < last_seen ORDER BY ... LIMIT n`,
    * i.e. topKOrders' shape) on large data. */
  def paginateOrders(s: SparkSession, d: String, page: Int = 2, pageSize: Int = 10): DataFrame = {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > (page - 1) * pageSize && col("rn") <= page * pageSize)
      .drop("rn")
  }

  /** O2 keyset pagination — the scale-safe sibling of [[paginateOrders]]:
    * instead of funneling a global row_number window through one task, seek
    * past the last row of the previous page with a composite-key predicate
    * and take the next page as a top-k. Both the last-seen probe and the
    * page fetch plan as TakeOrderedAndProject (per-partition top-k + k-row
    * driver merge) — no global sort materializes at any scale. The last-seen
    * key is derived from page 1 here for self-containment; a real API caller
    * passes it in from the previous response (then the query is ONE top-k
    * over a pushed-down range filter). */
  def paginateOrdersKeyset(s: SparkSession, d: String, pageSize: Int = 10): DataFrame = {
    val ordered = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // last row of page 1 under (price desc, key asc) = the row maximizing
    // (-price, key) lexicographically; struct comparison gives exactly that
    val last = ordered
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(pageSize)
      .agg(max(struct((-col("o_totalprice")).as("np"), col("o_orderkey").as("k"))).as("m"))
      .select((-col("m.np")).as("last_price"), col("m.k").as("last_key"))
    ordered.crossJoin(broadcast(last))
      .filter(col("o_totalprice") < col("last_price") ||
        (col("o_totalprice") === col("last_price") && col("o_orderkey") > col("last_key")))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(pageSize)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** Window: rank rows within group — each customer's 2 priciest orders. */
  def windowTopPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .filter(col("o_custkey") < 100)
  }

  /** Window: lag — price delta between a customer's consecutive orders. */
  def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("price_delta", round(col("o_totalprice") - col("prev_price"), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("prev_price"), col("price_delta"))
      .filter(col("o_custkey") < 50)
  }

  /** Window: running sum per key in event order. */
  def windowRunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .filter(col("o_custkey") < 50)
  }

  /** Window: rank / dense_rank / lead in one pass (SURVEY §2.8 — the three
    * ranking functions not covered by top2/lag/running/ntile). One shuffle on
    * the partition key, all four expressions share the same window sort. */
  def windowRanks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 50)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("next_order", lead(col("o_orderkey"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"), col("drnk"), col("next_order"))
  }

  /** Set ops: union / intersect / except over compatible key sets, tagged so
    * one query exercises all three. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    building.union(rich).distinct().withColumn("op", lit("union"))
      .unionByName(building.intersect(rich).withColumn("op", lit("intersect")))
      .unionByName(building.except(rich).withColumn("op", lit("except")))
      .groupBy(col("op")).agg(count(lit(1)).as("n_keys"))
  }

  /** Set-op multiset (`All`) variants (SURVEY §2.7): unionAll keeps
    * duplicates, intersectAll/exceptAll use multiset semantics — a key that
    * appears twice in `building` and once in `rich` survives exceptAll once.
    * No distinct pass, so unlike the distinct forms these add NO shuffle
    * beyond the final count. */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    building.unionAll(rich).withColumn("op", lit("union_all"))
      .unionByName(building.intersectAll(rich).withColumn("op", lit("intersect_all")))
      .unionByName(building.exceptAll(rich).withColumn("op", lit("except_all")))
      .groupBy(col("op")).agg(count(lit(1)).as("n_keys"))
  }

  /** Rollup: hierarchical subtotals (returnflag → linestatus → grand total). */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** Cube: all grouping-set combinations of two low-cardinality dims. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(avg(col("o_totalprice")), 2).as("avg_price"))

  /** Explicit grouping sets (beyond rollup/cube): exactly the two
    * single-dimension aggregations in one pass (SQL form — the DataFrame
    * API spells only rollup/cube). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into a left
    * outer aggregate join (RewriteCorrelatedScalarSubquery), the same plan
    * a hand-written join would produce. */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_cs")
    Tables.orders(s, d).createOrReplaceTempView("orders_cs")
    s.sql(
      """SELECT c_custkey,
        |(SELECT count(*) FROM orders_cs o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer_cs c WHERE c_custkey < 200""".stripMargin)
  }

  /** Pivot: one column per event_type, summed values per user. Explicit
    * value list keeps the schema static (a dynamic pivot needs an extra
    * distinct pass — avoid at scale). */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))

  /** Exact distinct counts per group (two distinct aggregates → Spark plans
    * an expand; still one pass over the scan). */
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))

  /** Exact interpolated percentiles per group (sort-based aggregate). At
    * scale prefer approx_percentile (t-digest) — exact percentile holds the
    * group's values; kept here as the oracle-checkable baseline. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(max(col("o_totalprice")), 2).as("p100"))

  /** approx_count_distinct (HLL++): the scale path for distinct counts —
    * constant memory per group vs countDistinct's expand. The sketch value
    * itself has no SQL oracle (DuckDB's approx algorithm differs), so the
    * registered query emits the EXACT counts (oracle-computable) plus
    * within-bound check columns: the oracle asserts the bound holds (its
    * side is literal 1), turning the sketch's documented ±3·rsd error into a
    * hash-checkable contract instead of a rows-only entry. */
  def approxDistinctBounded(s: SparkSession, d: String): DataFrame = {
    // ONE wide exchange (round-18 verdict #2). Mixing countDistinct with
    // other aggregates triggers the RewriteDistinctAggregates expand
    // (input ×3 — measured 2× slower locally), and the round-13..17 shape —
    // one expand-free single-distinct agg per column, joined — was optimal
    // single-JVM but paid 2.06× on real executors (local_cluster_r17: two
    // aggregations each shuffling their (flag, key) pairs over the wire as
    // SEPARATE stages, +2.4 s, the worst delta in the artifact). This shape
    // sends the same deduped pair volume across ONE exchange: tag each
    // distinct column into a (flag, which, key) pair stream, partial-dedup
    // map-side, shuffle once, then both exact counts AND both HLL sketches
    // reduce off the deduped pairs in a second, rows≈distinct-sized agg
    // whose partial/final exchange carries only (flag, sums, sketches).
    // HLL insertion is idempotent (register updates are max-based), so the
    // sketch over deduped keys is bit-identical to the sketch over raw rows.
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey"), col("l_suppkey"))
    val pairs = li
      .select(col("l_returnflag"), lit(0).as("which"), col("l_partkey").as("key"))
      .unionAll(li
        .select(col("l_returnflag"), lit(1).as("which"), col("l_suppkey").as("key")))
    // null keys dropped BEFORE the dedup: count(DISTINCT x) ignores NULLs,
    // but a (flag, which, NULL) row would survive distinct() and inflate
    // the sum by one — free on these non-null TPC-H columns, structural
    // parity if the operator is reused on nullable keys
    pairs.filter(col("key").isNotNull).distinct()
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("which") === 0, 1L).otherwise(0L)).as("n_parts"),
        sum(when(col("which") === 1, 1L).otherwise(0L)).as("n_suppliers"),
        approx_count_distinct(when(col("which") === 0, col("key")), 0.01).as("ap"),
        approx_count_distinct(when(col("which") === 1, col("key")), 0.01).as("asu"))
      .select(
        col("l_returnflag"), col("n_parts"), col("n_suppliers"),
        (abs(col("ap") - col("n_parts")) <= col("n_parts") * 0.05)
          .cast("int").as("parts_in_bound"),
        (abs(col("asu") - col("n_suppliers")) <= col("n_suppliers") * 0.05)
          .cast("int").as("suppliers_in_bound"))
  }

  /** Approx vs exact side by side — the error-bound spec's input. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  /** approx_percentile bounded form (registered): the sketch value has no
    * DuckDB oracle, so emit the exact percentiles (oracle-computable) plus
    * within-bound checks — accuracy 10000 bounds the rank error at n/10⁴,
    * far inside the ±2-percentile value window [p-0.02, p+0.02] asserted
    * here; the oracle's side of each check column is literal 1. */
  def approxPercentilesBounded(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        // array forms: ONE sketch / ONE sorted buffer per group serves every
        // requested quantile, instead of 2 + 6 independent aggregate buffers
        expr("approx_percentile(o_totalprice, array(0.5, 0.9), 10000)").as("ap"),
        expr("percentile(o_totalprice, array(0.48, 0.5, 0.52, 0.88, 0.9, 0.92))").as("pe"))
      .select(
        col("o_orderstatus"),
        round(element_at(col("pe"), 2), 2).as("p50"),
        round(element_at(col("pe"), 5), 2).as("p90"),
        (element_at(col("ap"), 1) >= element_at(col("pe"), 1) &&
          element_at(col("ap"), 1) <= element_at(col("pe"), 3))
          .cast("int").as("ap50_in_bound"),
        (element_at(col("ap"), 2) >= element_at(col("pe"), 4) &&
          element_at(col("ap"), 2) <= element_at(col("pe"), 6))
          .cast("int").as("ap90_in_bound"))

  /** approx_percentile (Greenwald-Khanna sketch): the scale path for
    * percentiles — bounded memory per group vs exact percentile holding every
    * value. Side-by-side approx/exact; RelationalSpec pins the error bound. */
  def approxPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).as("ap50"),
        round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 2).as("ap90"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))

  /** MapType path for semi-structured props (SURVEY §1.2): `from_json` into
    * MapType(String, String) — schema-less key access without a fixed struct;
    * the JSON parse and map lookup stay inside whole-stage codegen. */
  def propsMapQuery(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("pm", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
      .select(
        col("event_id"),
        element_at(col("pm"), "k").cast("int").as("k"),
        size(col("pm")).as("n_keys"))
      .filter(col("k") <= 10)

  /** Outlier detection: per-type z-score against broadcast per-type moments
    * (two-pass: aggregate then rejoin — the standard distributed shape). */
  def zscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val moments = events.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    events.join(broadcast(moments), Seq("event_type"))
      // try_divide: a constant-valued group has sigma 0 (and a 1-row group
      // null) — its rows get a null z and drop at the filter, instead of an
      // ANSI DIVIDE_BY_ZERO killing the task
      .withColumn("z", try_divide(col("value") - col("mu"), col("sigma")))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"), col("value"), round(col("z"), 4).as("z"))
  }

  /** Distribution-shape statistics per group: explicit central-moment
    * skewness (m3/m2^1.5) and excess kurtosis (m4/m2² − 3), two-pass like
    * [[zscoreOutliers]] — aggregate the mean, broadcast it back, aggregate
    * the centered powers. The EXPLICIT formula rather than the built-in
    * `skewness`/`kurtosis` aggregates because engines disagree on bias
    * correction (Spark ships population moments, DuckDB sample-corrected) —
    * the two-pass arithmetic is engine-identical and oracle-exact. */
  def momentStats(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val mus = events.groupBy(col("event_type")).agg(avg(col("value")).as("mu"))
    events.join(broadcast(mus), Seq("event_type"))
      .withColumn("dv", col("value") - col("mu"))
      .groupBy(col("event_type"))
      // plain products, not pow(): libm pow is only ~1-ulp accurate and
      // differs across engines; x*x (and m2*sqrt(m2) below — sqrt IS
      // IEEE-correctly-rounded everywhere) keeps both sides bit-identical
      .agg(
        count(lit(1)).as("n_events"),
        avg(col("dv") * col("dv")).as("m2"),
        avg(col("dv") * col("dv") * col("dv")).as("m3"),
        avg(col("dv") * col("dv") * col("dv") * col("dv")).as("m4"))
      .select(
        col("event_type"), col("n_events"),
        round(sqrt(col("m2")), 4).as("sd_pop"),
        round(col("m3") / (col("m2") * sqrt(col("m2"))), 4).as("skew"),
        round(col("m4") / (col("m2") * col("m2")) - 3.0, 4).as("excess_kurt"))
  }

  /** Deterministic mode: each user's most frequent event type, ties broken
    * by type asc — one count aggregation plus a per-user window over the
    * |event types|-sized grouped frame (never the raw events). The built-in
    * `mode` aggregate is tie-arbitrary on both engines; the count+window
    * form pins the choice. */
  def modalEventType(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n").desc, col("event_type").asc)
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("modal_type"), col("n").as("n_events"))
  }

  /** Frame-edge window functions: first/last/2nd order key per customer in
    * date order. last_value needs the full-partition frame spelled out (the
    * default frame ends at CURRENT ROW, which would return each row itself);
    * nth_value(2) is null for 1-order customers on both engines. */
  def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    val order = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(full).as("first_order"),
        last(col("o_orderkey")).over(full).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
  }

  /** Sliding ROWS-frame moving average per user (7-event trailing window).
    * The frame aggregates integer CENTS and divides by the frame count —
    * a double sum over a sliding frame is evaluation-order-defined (Spark
    * recomputes per frame in row order, DuckDB uses segment trees), but the
    * long sum is associative, so cents/count is the same exact rational on
    * both engines (the q_window_range convention). One keyed shuffle. */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-6, Window.currentRow)
    Tables.events(s, d)
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .select(
        col("event_id"), col("user_id"),
        round(sum(col("cents")).over(w) / (count(lit(1)).over(w) * 100.0), 4)
          .as("trailing_avg"))
  }

  /** Truncated exponentially-weighted moving average per user (α = 1/2,
    * 8 terms): the trend smoother dashboards run beside the flat moving
    * average. Written as 8 explicit lag terms with halving weights rather
    * than a recursive form — every weight 2⁻ᵏ and every cents·2⁻ᵏ product
    * is EXACTLY representable in binary doubles and the addition order is
    * the literal term order on both engines, so the whole smoother is
    * oracle-exact (no libm pow anywhere). Missing leading terms drop out of
    * numerator and denominator together. One keyed shuffle. */
  def ewmaTrailing(s: SparkSession, d: String, terms: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val cents = floor(col("value") * 100).cast("long")
    val lags = (0 until terms).map(k => lag(cents, k).over(w))
    val num = lags.zipWithIndex.map { case (l, k) =>
      when(l.isNotNull, l.cast("double") / lit(1L << k).cast("double")).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = lags.zipWithIndex.map { case (l, k) =>
      when(l.isNotNull, lit(1.0) / lit(1L << k).cast("double")).otherwise(lit(0.0))
    }.reduce(_ + _)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("ewma", round(num / den / 100.0, 4))
      .select(col("event_id"), col("user_id"), col("ewma"))
  }

  /** Robust dispersion per group: median + median-absolute-deviation and
    * the MAD-scaled outlier count (the z-score detector's heavy-tail-proof
    * sibling). Two-pass like [[zscoreOutliers]]: exact interpolated median,
    * broadcast rejoin, median of absolute deviations, then a second rejoin
    * counts |x − med| > 3·MAD rows. Exact percentile is a sort-based
    * aggregate per group — at corpus scale swap in approx_percentile the
    * same way q_quality_gate pairs exact/approx forms. */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = events.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    events.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_events"))
  }

  /** Bivariate statistics per group: Pearson correlation and sample/population
    * covariance of quantity vs extended price. The built-in `corr`/`covar_*`
    * aggregates share definitions across engines (unlike skewness/kurtosis);
    * correlation is scale-free so 6dp rounding absorbs accumulation-order
    * noise, covariances round at 2dp (money×qty units). One partial-agg
    * shuffle carrying the co-moment tuple per group. */
  def corrStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
        round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("qty_disc_covar_pop"))

  /** max_by/min_by aggregates: each customer's priciest order without a
    * window — single aggregation, no sort. Plain value ordering is
    * deterministic here because (custkey, totalprice) has no ties in the
    * test data; with tie-prone data use a struct ordering key (DuckDB v1.0's
    * arg_max can't, so the oracle would need a composite instead). */
  def argmaxOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
        round(max(col("o_totalprice")), 2).as("best_price"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"))

  /** Dense hourly series per event type: every hour between the corpus min
    * and max appears, zero-filled where no events landed — what a dashboard
    * consumer (the reference's Grafana, applications/applications.tf:135-145)
    * needs to draw unbroken lines. The hour spine is generated from the
    * 1-row min/max aggregate (`sequence` + explode — never a corpus-sized
    * range join) and cross-joined with the distinct-type frame, both
    * broadcast; the observed counts left-join onto the spine keyed on
    * (type, hour). */
  def densifyHourly(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val counts = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val span = events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = span
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val types = events.select(col("event_type")).distinct()
    spine.crossJoin(broadcast(types))
      .join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Gaps-and-islands over the hourly series: contiguous runs of ACTIVE
    * hours per event type, found with the classic row_number-difference
    * trick (hours_since_epoch − row_number is constant within a run). The
    * window partitions by type over the hourly AGGREGATE (at most
    * hours×types rows), never raw events. */
  def activityIslands(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
    hourly
      .withColumn("hn", (unix_timestamp(col("hour")) / 3600).cast("long"))
      .withColumn("grp", col("hn") - row_number().over(w))
      .groupBy(col("event_type"), col("grp"))
      .agg(
        min(col("hour")).as("island_start"),
        max(col("hour")).as("island_end"),
        count(lit(1)).as("n_hours"),
        sum(col("n_events")).as("n_events"))
      .drop("grp")
  }

  /** Linear interpolation of gaps in the hourly value series per event
    * type — the sensor-style gap-fill ([[densifyHourly]] zero-fills counts;
    * this treats absent hours as UNKNOWN readings and reconstructs them from
    * the neighbors). Scale shape: all windows run over the hourly AGGREGATE
    * (≤ hours×types rows), partitioned by type — the event stream reduces
    * in one partial-agg shuffle first. Neighbor lookup uses the cumulative
    * non-null-count trick (count(v) over the ordered frame is constant
    * within a gap, so the gap joins its bracketing observation via a
    * group-max window) — no IGNORE NULLS dependence, identical semantics on
    * any engine. Determinism: exact long cents in, one integral
    * interpolation expression out — no float and no rounding step exists
    * anywhere in the payload (see the half-point note below). */
  def interpolateHourly(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    // exact LONG cents (per-event floor, then sum — the streaming-gate
    // money convention): the round-10 full-surface sf0.001 probe caught
    // the old round(sum,2)/round(·,4) payload on a half-point — the
    // midpoint of two 2dp endpoints sits exactly on a 4dp .xx5, where
    // Spark's decimal-string HALF_UP and DuckDB's binary round diverge.
    // The interpolation below is integral end to end (cents × epoch
    // seconds, one final DIV), so no rounding step exists to diverge.
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("c_obs"))
    val span = events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = span
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val types = events.select(col("event_type")).distinct()
    val sparse = spine.crossJoin(broadcast(types))
      .join(hourly, Seq("hour", "event_type"), "left")
    val wAsc = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("event_type")).orderBy(col("hour").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = sparse
      .withColumn("gp", count(col("c_obs")).over(wAsc))
      .withColumn("gn", count(col("c_obs")).over(wDesc))
    val wp = Window.partitionBy(col("event_type"), col("gp"))
    val wn = Window.partitionBy(col("event_type"), col("gn"))
    grouped
      .withColumn("prev_c", max(col("c_obs")).over(wp))
      .withColumn("prev_h", max(when(col("c_obs").isNotNull, col("hour"))).over(wp))
      .withColumn("next_c", max(col("c_obs")).over(wn))
      .withColumn("next_h", max(when(col("c_obs").isNotNull, col("hour"))).over(wn))
      // linear interpolation as one integral expression in ten-thousandths
      // of a cent: (c0·(t1−t) + c1·(t−t0)) · 10⁴ DIV (t1−t0) — every term
      // non-negative, so Spark DIV ≡ DuckDB //. The non-negativity is a
      // FIXTURE CONTRACT (hourly cents sums ≥ 0), pinned by
      // SeriesAndSamplingSpec's "integral DIV contract" test: on negative
      // dividends DIV truncates toward zero while // floors, and the
      // oracle equivalence silently breaks.
      .withColumn("cents_e4",
        when(col("c_obs").isNotNull, col("c_obs") * 10000L)
          .otherwise(expr(
            """(prev_c * (unix_timestamp(next_h) - unix_timestamp(hour))
              | + next_c * (unix_timestamp(hour) - unix_timestamp(prev_h)))
              | * 10000L div (unix_timestamp(next_h) - unix_timestamp(prev_h))""".stripMargin)))
      .select(col("hour"), col("event_type"), col("cents_e4"),
        col("c_obs").isNotNull.cast("int").as("observed"))
  }

  /** Cumulative distinct users per day — the growth-dashboard line that is
    * an anti-pattern when written naively (COUNT(DISTINCT) over an
    * ever-growing window rescans the stream per day). The scale shape:
    * distinct-over-growing-window ≡ first-seen-then-cumulate — one keyed
    * agg collapses the stream to a row per user (their first active day),
    * a second collapses that to a row per day, and the running total is a
    * SinglePartition window over the |days|-row aggregate only. */
  def cumulativeDistinctUsers(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
    val perDay = firstSeen.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("cume_users", sum(col("n_new")).over(w))
      .select(col("day"), col("n_new"), col("cume_users"))
  }

  /** SCD2-style validity intervals from the event stream: per user, collapse
    * consecutive same-type events into one row with [valid_from, valid_to)
    * bounds (valid_to null = current) — the slowly-changing-dimension build
    * every warehouse runs on a change feed. One shuffle on user_id; the
    * run-collapse is the row_number-difference trick inside that partition;
    * interval bounds come from a lead over the |runs|-sized collapsed frame.
    * Bounded to user_id < 30 so the oracle output stays reviewable — the
    * plan is user-count-partitioned and unbounded-safe. */
  def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val runs = ev
      .withColumn("rn", row_number().over(wSeq))
      .withColumn("rt", row_number().over(wType))
      .withColumn("grp", col("rn") - col("rt"))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val wLead = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from").asc, col("event_type").asc)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wLead))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"))
  }

  /** Seasonal anomaly detection: flag hours whose event count exceeds the
    * hour-of-day baseline by more than 3σ — the ops-dashboard alert behind
    * the reference's monitoring consumer. Two-pass z-score shape over the
    * hourly AGGREGATE: the stream reduces to (type, hour) counts in one
    * partial-agg shuffle; the (type, hour-of-day) baseline is a second agg
    * over THAT (≤ types×24 rows, broadcast back). Variance is spelled out
    * as explicit integer-sum arithmetic (Σn, Σn², cnt are exact longs; the
    * mean/σ doubles derive from them with the same literal expression on
    * both engines), so the 3σ comparison is engine-portable. */
  def seasonalAnomalies(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("hod", hour(col("hour")))
    val baseline = hourly.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"),
        count(lit(1)).as("cnt"))
      .withColumn("mu", col("s1").cast("double") / col("cnt"))
      .withColumn("sigma", sqrt(greatest(lit(0.0),
        (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("cnt")) / col("cnt"))))
      .select(col("event_type"), col("hod"), col("mu"), col("sigma"))
    hourly.join(broadcast(baseline), Seq("event_type", "hod"))
      .filter(col("n_events") > col("mu") + lit(3.0) * col("sigma"))
      .select(col("event_type"), col("hour"), col("n_events"),
        round(col("mu"), 4).as("baseline_mu"), round(col("sigma"), 4).as("baseline_sigma"))
  }

  /** Trailing-7-day active users (WAU) and the DAU/WAU stickiness ratio —
    * the sliding-window COUNT DISTINCT that is an anti-pattern written
    * naively (a distinct per day over a 7-day self-join of the stream).
    * Scale shape: the stream collapses to the distinct (user, day) activity
    * set once; each activity row then CONTRIBUTES the date interval
    * [day, min(day+6, next_activity−1, corpus_max)] — truncation at the
    * next activity makes contributions non-overlapping, so WAU(d) is a
    * plain count of exploded contribution days (≤7 rows per activity, an
    * equi-agg, no inequality join anywhere). */
  def trailingWeekActives(s: SparkSession, d: String): DataFrame = {
    val active = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val maxDay = active.agg(max(col("day")).as("max_day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    val contrib = active
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(maxDay))
      .withColumn("end_day", least(
        date_add(col("day"), 6),
        coalesce(date_sub(col("next_day"), 1), col("max_day")),
        col("max_day")))
      .select(col("user_id"), explode(expr("sequence(day, end_day)")).as("day"))
    val wau = contrib.groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val dau = active.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
      .withColumn("stickiness", round(col("dau").cast("double") / col("wau"), 4))
  }

  /** Time-bucketed aggregation over events (the Grafana-consumption shape:
    * applications/applications.tf:135-145). */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))

  /** Grouped event-time tumbling window (batch shape of the streaming agg). */
  def eventsWindowed(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Funnel conversion: users who purchased at or after their first view.
    * Two keyed aggregations and one broadcast join — no event-by-event
    * pairing. */
  def funnelConversion(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val firstView = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
    val converted = events.filter(col("event_type") === "purchase")
      .join(broadcast(firstView), Seq("user_id"))
      .filter(col("ts") >= col("first_view"))
      .select(col("user_id")).distinct()
    firstView.select(count(lit(1)).as("n_viewers"))
      .crossJoin(converted.select(count(lit(1)).as("n_converted")))
  }

  /** First-order Markov transition matrix over the event stream: counts and
    * row-normalized probabilities of event_type → next event_type per user —
    * the behavioral-model input ("what do users do after a view?"). One
    * keyed shuffle for the lead window over raw events; the normalizing
    * window runs over the |types|² count AGGREGATE only. */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("from_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wf = Window.partitionBy(col("from_type"))
    counts.withColumn("p",
      round(col("n_trans").cast("double") / sum(col("n_trans")).over(wf).cast("double"), 4))
  }

  /** Equi-width histogram of order totals (20 bins): bounds from ONE 1-row
    * min/max aggregate broadcast back; bin assignment is scan-local
    * arithmetic — the profiling histogram without a sort or a window over
    * the fact table. Identical literal expressions on both engines make the
    * double bin edges engine-portable. */
  def valueHistogram(s: SparkSession, d: String, bins: Int = 20): DataFrame = {
    val orders = Tables.orders(s, d)
    val bounds = orders.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    orders.crossJoin(broadcast(bounds))
      .withColumn("bin", least(
        floor((col("o_totalprice") - col("mn")) / ((col("mx") - col("mn")) / lit(bins.toDouble))),
        lit((bins - 1).toLong)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_value"))
      .crossJoin(broadcast(bounds))
      .withColumn("bin_lo", round(col("mn") + col("bin") * ((col("mx") - col("mn")) / lit(bins.toDouble)), 2))
      .select(col("bin"), col("bin_lo"), col("n_orders"), col("total_value"))
  }

  /** Weekly cohort retention triangle: users bucketed by first-active week,
    * counted at each week offset — the growth-analytics matrix behind every
    * retention dashboard. The stream collapses to the distinct (user, week)
    * activity set once; the cohort assignment is a per-user min over that
    * set; the matrix is one equi-join + agg, all frames users×weeks or
    * smaller, integer week offsets (no timezone/interval arithmetic). */
  def cohortMatrix(s: SparkSession, d: String): DataFrame = {
    val activity = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    activity.join(cohorts, Seq("user_id"))
      .withColumn("week_offset", expr("CAST(datediff(week, cohort_week) div 7 AS INT)"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Bounce rate per day: share of sessions (30-minute inactivity gap) with
    * exactly one event. Rides the same session_window aggregation as
    * [[sessionWindows]]; the daily rollup is a second agg over the
    * |sessions| frame. */
  def bounceRate(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(to_date(col("w.start")).as("day"), col("n_events"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        round(col("n_bounces").cast("double") / col("n_sessions").cast("double"), 4))

  /** CUSUM changepoint scan over the daily event volume: cumulative
    * deviation from the corpus mean, with the peak |deviation| flagged —
    * the classic "when did behavior shift" diagnostic. Closed form keeps
    * it engine-exact: cusum_k = S_k − k·μ where S_k and k are exact
    * integers from the running window and μ is the one 1-row mean — no
    * accumulated float error, so the peak flag (a double equality) is safe
    * because both engines evaluate the identical expression tree. Every
    * window runs over the |days|-row aggregate. */
  def cusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val tot = daily.agg(sum(col("n_events")).cast("double").as("st"),
      count(lit(1)).as("c"))
    val wRun = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily.crossJoin(broadcast(tot))
      .withColumn("sk", sum(col("n_events")).over(wRun).cast("double"))
      .withColumn("k", row_number().over(Window.orderBy(col("day").asc)))
      .withColumn("cus", col("sk") - col("k") * (col("st") / col("c")))
      .withColumn("mx", max(abs(col("cus"))).over(wAll))
      .select(col("day"), col("n_events"), round(col("cus"), 4).as("cusum"),
        (abs(col("cus")) === col("mx")).cast("int").as("is_peak"))
  }

  /** Population Stability Index between the first and second half of the
    * event stream (`q_psi_drift`) — the standard production drift monitor
    * a feature/data pipeline runs per release: the value distribution of
    * the current window scored against the reference window over FIXED
    * bins, PSI = Σ (p−q)·ln(p/q). Complements [[Corpus.ksLengthTest]]
    * (two-sample shape test) with the binned, smoothed form dashboards
    * alert on (PSI ≥ 0.1 = moderate shift, the emitted flag's threshold).
    * Engine-exact by construction everywhere floats allow: the time cut
    * is integer epoch-second arithmetic ((min+max) DIV 2), bins are fixed
    * width-50 buckets (floor of the identical IEEE division — never a
    * percentile edge, whose cross-engine ulp could flip a boundary row),
    * counts are exact longs with add-one smoothing, and only the final
    * Σ(p−q)·ln(p/q) is float — shipped at the 4dp rounding the ln()
    * convention requires. Scale shape: one scan → 10-cell aggregate;
    * everything after runs on 10 rows. */
  def psiDrift(s: SparkSession, d: String, bins: Int = 10,
               binWidth: Double = 50.0): DataFrame = {
    val ev = Tables.events(s, d)
      .select(unix_timestamp(col("ts")).as("ts_s"), col("value"))
    val cut = ev.agg(expr("(min(ts_s) + max(ts_s)) div 2").as("cut_s"))
    val cells = ev.crossJoin(broadcast(cut))
      .select((col("ts_s") < col("cut_s")).cast("long").as("is_ref"),
        least(greatest(floor(col("value") / binWidth).cast("int"), lit(0)),
          lit(bins - 1)).as("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("is_ref")).as("ca"), sum(lit(1L) - col("is_ref")).as("cb"))
    // densify to all bins: an empty cell must contribute its smoothed
    // mass, not vanish from the sum
    val dense = cut.select(explode(sequence(lit(0), lit(bins - 1))).as("bin"))
      .join(cells, Seq("bin"), "left")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = dense.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    dense.crossJoin(broadcast(tot))
      .withColumn("p", (col("ca") + 1).cast("double") / (col("na") + bins).cast("double"))
      .withColumn("q", (col("cb") + 1).cast("double") / (col("nb") + bins).cast("double"))
      .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 4).as("psi"),
        max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"))
      .select(col("psi"), col("n_ref"), col("n_cur"),
        (col("psi") >= 0.1).cast("int").as("drift_flag"))
  }

  /** RFM (recency/frequency/monetary) customer segmentation — the classic
    * CRM rollup. One keyed agg collapses orders to a row per customer;
    * recency anchors on the 1-row corpus max date; the three 1–5 scores
    * come from ONE 1-row quintile-threshold aggregate broadcast back, with
    * assignment as scan-local array folds (the q_length_deciles pattern —
    * never an ntile window over the customer set). Threshold comparisons
    * are engine-safe: the metrics are integers (days, counts) or 2dp sums,
    * and interpolated quintile cuts land either exactly on a data point
    * (both engines exact) or ≥ 0.002 away from every data point. */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val anchor = orders.agg(max(to_date(col("o_orderdate"))).as("mx"))
    val cust = orders
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 2).as("monetary"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency", datediff(col("mx"), col("last_order")))
    val cuts = cust.agg(
      expr("percentile(recency, array(0.2,0.4,0.6,0.8))").as("rth"),
      expr("percentile(frequency, array(0.2,0.4,0.6,0.8))").as("fth"),
      expr("percentile(monetary, array(0.2,0.4,0.6,0.8))").as("mth"))
    cust.crossJoin(broadcast(cuts))
      .withColumn("r_score", expr("5 - aggregate(rth, 0, (a, t) -> a + if(recency > t, 1, 0))"))
      .withColumn("f_score", expr("1 + aggregate(fth, 0, (a, t) -> a + if(frequency > t, 1, 0))"))
      .withColumn("m_score", expr("1 + aggregate(mth, 0, (a, t) -> a + if(monetary > t, 1, 0))"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      // total, not avg: each `monetary` is an exact-2dp value, so the exact
      // segment sum sits ON the cent grid — 0.005 from any rounding
      // boundary, far beyond summation-order noise. An avg divides by n and
      // destroys that alignment (observed: last-cent oracle divergence).
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary")), 2).as("total_monetary"))
  }

  /** Dormant-user reactivation: activity days that follow ≥ `gapDays` of
    * silence for that user — the win-back metric. The stream collapses to
    * the distinct (user, day) activity set; the gap test is one lag over
    * that per-user frame. */
  def reactivations(s: SparkSession, d: String, gapDays: Int = 2): DataFrame = {
    val active = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    active
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .filter(datediff(col("day"), col("prev_day")) >= gapDays)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_reactivated"))
  }

  /** Fulfillment-delay profile per order priority: days between order and
    * line-item ship date over the orders⋈lineitem fact-fact join (SMJ on
    * the order key, AQE-adaptive — the one shuffle both tables already
    * need). Output columns are all EXACT (counts, min/max, total days) —
    * an average here is a rational that can sit on a rounding boundary;
    * consumers derive it from total/n. */
  def shipDelayByPriority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days", datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        min(col("delay_days")).as("min_delay"),
        max(col("delay_days")).as("max_delay"),
        sum(col("delay_days")).as("total_delay_days"))

  /** Pareto revenue concentration: how many top customers carry 80% of
    * revenue. Arithmetic is EXACT END TO END: per-customer revenue in
    * integer cents, a running cents sum over the revenue-ranked customer
    * aggregate, and the 80% test as 10·cume ≥ 8·total in longs — no float
    * enters, so the crossing rank is engine-identical. The ordered window
    * runs over the |customers| aggregate (≪ facts); at extreme customer
    * counts the same histogram trick as `q_token_budget` applies. */
  def paretoConcentration(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("raw_rev"))
      .withColumn("rev_cents", expr("CAST(round(raw_rev * 100) AS BIGINT)"))
    val w = Window.orderBy(col("rev_cents").desc, col("o_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = rev
      .withColumn("rk", row_number().over(Window.orderBy(col("rev_cents").desc, col("o_custkey").asc)))
      .withColumn("cume_cents", sum(col("rev_cents")).over(w))
    val total = ranked.agg(max(col("cume_cents")).as("total_cents"),
      count(lit(1)).as("n_customers"))
    ranked.crossJoin(broadcast(total))
      .filter(col("cume_cents") * 10 >= col("total_cents") * 8)
      .agg(min(col("rk")).as("n_top_customers"),
        max(col("n_customers")).as("n_customers"))
      .withColumn("top_share",
        round(col("n_top_customers").cast("double") / col("n_customers").cast("double"), 4))
  }

  /** Growth accounting: per day, the new / retained / resurrected /
    * churned user decomposition every growth dashboard runs. All four
    * classes come from the distinct (user, day) activity set via
    * EQUI-joins on date-shifted keys (the q_retention trick) — never an
    * inequality join or a per-user window over raw events. Churn for day d
    * = active on d−1 but not d, attributed to d (the first silent day),
    * capped at the corpus max date. */
  def growthAccounting(s: SparkSession, d: String): DataFrame = {
    val active = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = active.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val prevActive = active.select(col("user_id"),
      date_add(col("day"), 1).as("day"), lit(1).as("was_prev"))
    val classes = active
      .join(first, Seq("user_id"))
      .join(prevActive, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("day") =!= col("first_day") && col("was_prev").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("day") =!= col("first_day") && col("was_prev").isNull, 1L)
          .otherwise(0L)).as("n_resurrected"))
    val maxDay = active.agg(max(col("day")).as("max_day"))
    val churned = prevActive
      .join(active, Seq("user_id", "day"), "left_anti")
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
    classes.join(churned, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Two-proportion z-test between user cohorts (id parity as the split):
    * did cohort A convert (purchase) at a different rate than cohort B?
    * Completes the statistics family (chi², KS, MI) with the A/B-test
    * primitive. Everything reduces to four integer counts in one pass;
    * the z arithmetic is the same literal expression on both engines, so
    * the statistic is oracle-exact at 4dp. */
  def abTestConversion(s: SparkSession, d: String): DataFrame = {
    // "converted" = above-median buyer: every user purchases in this corpus,
    // so a has-purchased flag degenerates (p_pool = 1 → zero denominator,
    // observed as an ANSI divide-by-zero). The median split is non-degenerate
    // at any SF with purchase-count variation, and the z is try_divide'd for
    // the all-equal corner.
    val purchases = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"))
    val med = purchases.agg(expr("percentile(n_purch, 0.5)").as("med"))
    val users = purchases.crossJoin(broadcast(med))
      .withColumn("converted", (col("n_purch") > col("med")).cast("int"))
      .withColumn("cohort", (col("user_id") % 2).cast("int"))
    val counts = users.agg(
      sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("cohort") === 0, col("converted").cast("long")).otherwise(0L)).as("conv_a"),
      sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("cohort") === 1, col("converted").cast("long")).otherwise(0L)).as("conv_b"))
    counts
      .withColumn("p_a", col("conv_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("conv_b").cast("double") / col("n_b"))
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b")))
      .withColumn("z", try_divide(col("p_a") - col("p_b"),
        sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(col("p_a"), 4).as("rate_a"), round(col("p_b"), 4).as("rate_b"),
        round(col("z"), 4).as("z_stat"),
        coalesce((abs(col("z")) > lit(1.96)).cast("int"), lit(0)).as("significant"))
  }

  /** Exact weighted median: the unit price at which half the shipped
    * QUANTITY sits at or below, per return flag — the robust price-level
    * statistic an unweighted median (rows, not units) misstates. Grouping
    * by (flag, price) FIRST makes the computation tie-free by construction
    * (equal prices collapse into one row with summed integer weight, so no
    * arbitrary row-level tie-break can leak in); the running weight is a
    * window over the per-flag DISTINCT-PRICE aggregate (≪ facts), the
    * per-flag totals broadcast back, and the median is the smallest price
    * with 2·cume ≥ total in longs — exact, engine-identical arithmetic
    * (quantities are integral). Same scale posture as [[paretoConcentration]]:
    * at extreme price cardinality the `q_token_budget` fixed-width histogram
    * trick replaces the ordered window. */
  def weightedMedianPrice(s: SparkSession, d: String): DataFrame = {
    // TWO-PASS exact rank (round 19, guide §2.3/§2.5 — the q_token_budget
    // fixed-width histogram trick the old scaladoc promised "at extreme
    // price cardinality", now the shipped shape). The old single-pass form
    // windowed the FULL per-(flag, price) aggregate: prices are near-unique,
    // so the running-sum sort ordered ~450k rows at sf0.1 inside a window
    // partitioned by the 3-value return flag — parallelism 3 regardless of
    // cluster width, and a full |distinct prices| exchange. Now pass 1
    // aggregates weight into fixed-width price buckets (width 64 — ~1.6k
    // buckets per flag; map-side partial agg collapses the scan, the
    // exchange and the window are bucket-sized) and locates the bucket the
    // weighted median falls in, plus the cumulative weight strictly before
    // it; pass 2 re-scans only rows whose price lands IN that one bucket
    // and runs the exact per-price window there (~400 rows per flag).
    // EXACT by bucket monotonicity: every price in a lower bucket is lower,
    // so global cume(p) = prev_wt + in-bucket cume(p), and the smallest
    // qualifying price globally is the smallest qualifying price inside the
    // first bucket whose end-of-bucket cume crosses half — integer long
    // arithmetic end to end, identical to the one-pass form (oracle-hashed).
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("qty"))
    val wBRun = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBAll = Window.partitionBy(col("l_returnflag"))
    val med = li
      .groupBy(col("l_returnflag"), floor(col("l_extendedprice") / 64).as("bkt"))
      .agg(sum(col("qty")).as("bwt"))
      .withColumn("cume_b", sum(col("bwt")).over(wBRun))
      .withColumn("total_wt", sum(col("bwt")).over(wBAll))
      .filter(col("cume_b") * 2 >= col("total_wt"))
      .groupBy(col("l_returnflag"))
      // bkt is unique per flag, so min(struct(bkt, prev)) rides the
      // cume-before-bucket value along with the median bucket id
      .agg(min(struct(col("bkt"), (col("cume_b") - col("bwt")).as("prev"))).as("m"),
        max(col("total_wt")).as("total_wt"))
      .select(col("l_returnflag").as("flag"), col("m.bkt").as("med_bkt"),
        col("m.prev").as("prev_wt"), col("total_wt"))
    val wRun = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.join(broadcast(med),
        col("l_returnflag") === col("flag")
          && floor(col("l_extendedprice") / 64) === col("med_bkt"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"),
        col("prev_wt"), col("total_wt"))
      .agg(sum(col("qty")).as("wt"))
      .withColumn("cume_wt", col("prev_wt") + sum(col("wt")).over(wRun))
      .filter(col("cume_wt") * 2 >= col("total_wt"))
      .groupBy(col("l_returnflag"))
      .agg(round(min(col("l_extendedprice")), 2).as("w_median"),
        max(col("total_wt")).as("total_units"))
  }

  /** NTILE quartiles by account balance per segment. */
  def ntileQuartiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n_customers"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
  }

  /** Edit-distance match: parts within levenshtein 6 of a probe name. */
  def fuzzyPartMatch(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("dist", levenshtein(col("p_name"), lit("red widget")))
      .filter(col("dist") <= 6)
      .select(col("p_partkey"), col("p_name"), col("dist"))

  /** Session windows per user (30-minute inactivity gap) — the sessionization
    * shape; oracle is the classic gaps-and-islands SQL. One shuffle on
    * user_id; session assembly is a sort within partition. */
  def sessionWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n_events"))

  /** Day-over-day cohort retention — the dashboard query behind "did
    * yesterday's users come back": per day, active users and the fraction
    * active again the next day. Scale shape: the distinct (user, day)
    * activity set is one partial-agg shuffle (rows = users x days, tiny
    * against the event stream); the self-join keys on (user, day) with the
    * right side date-shifted, so matching is an equi-join — no inequality
    * or window over the stream. */
  def dayRetention(s: SparkSession, d: String): DataFrame = {
    val active = graft.Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val nextDay = active
      .select(col("user_id"), date_sub(col("day"), 1).as("day"), lit(1).as("ret"))
    active.join(nextDay, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(coalesce(col("ret"), lit(0))).as("n_retained"))
      .withColumn("retention_rate",
        round(col("n_retained") / col("n_active"), 4))
  }

  /** Distribution ranks: percent_rank + cume_dist per status partition —
    * the relative-standing analytics the rank/dense_rank family doesn't
    * cover. Both are rational functions of (rank, n) computed identically
    * by any engine, so the values oracle exactly; rounding only guards the
    * decimal printing. Partitioned analytic: each status is one sort, no
    * global ordering. */
  def percentRanks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice").asc)
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** LISTAGG semantics: per nation, the sorted distinct segments joined into
    * one string. Deterministic by construction (collect_set is unordered —
    * the array_sort is what makes the result well-defined; an unsorted
    * listagg is not a query, it's a race). Partial-aggregates: the set is
    * merged map-side, so the shuffle carries ≤ |segments| entries per key. */
  def segmentListAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("n_customers"))

  /** Conditional aggregation surface: FILTER-clause counts (count of a
    * when-expression) and boolean aggregates (bool_or / bool_and) — one
    * pass, no self-joins; each conditional is just another aggregate buffer
    * in the same hash-agg. */
  def conditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_totalprice") > 300000, 1)).as("n_big"),
        bool_or(col("o_totalprice") > 400000).as("any_huge"),
        bool_and(col("o_totalprice") > 0).as("all_positive"))

  /** RANGE-frame window: per-user trailing-1-hour event value, framed by the
    * ORDER BY value (epoch seconds), not by row count — the time-decay shape
    * ROWS frames can't express. Values are summed as floor-cents longs:
    * integer frame sums are associativity-independent, so the result is
    * identical no matter how either engine (sliding window vs segment tree)
    * associates the additions — a double sum here would be
    * evaluation-order-defined, i.e. not a correctness-checkable query. */
  def trailingHourSums(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600L, 0L)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      sum(floor(col("value") * 100).cast("long")).over(w).as("hour_cents"))
  }

  /** Pivot → unpivot round trip: the wide per-(status, priority) count matrix
    * melted back to long form. Exercises `unpivot` (UNPIVOT/MELT); with
    * missing combinations dropped (includeNulls=false) the round trip is
    * exactly the direct group-by — which is the oracle. */
  def unpivotStatusMatrix(s: SparkSession, d: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .count()
    wide.unpivot(
      Array(col("o_orderstatus")),
      priorities.map(p => col(s"`$p`")).toArray,
      "priority", "n_orders")
      .filter(col("n_orders").isNotNull)
  }

  /** Calendar feature extraction: month bucket, quarter, ISO weekday, day
    * offset from a fixed epoch, month end — the date dimension a time-series
    * mart derives in the scan projection (no shuffle, codegen'd). Weekday is
    * pinned to the ISO convention (Monday=0) on both engines; Sunday-first
    * `dayofweek` is one of the classic cross-engine divergences. */
  def dateFeatures(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      trunc(col("o_orderdate"), "month").as("month_start"),
      quarter(col("o_orderdate")).as("qtr"),
      weekday(col("o_orderdate")).as("wd"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"),
      last_day(col("o_orderdate")).as("month_end"))

  /** Last-touch attribution: each purchase is credited to the most recent
    * PRIOR non-purchase event of the same user (channel + seconds-since).
    * One window pass — `last(..., ignoreNulls)` over an unbounded-to-1-
    * preceding ROWS frame carries the latest touch struct forward, so no
    * self-join and no per-purchase subquery; the only shuffle is the
    * partitionBy(user_id) exchange. Ties on ts are broken by event_id so
    * the frame order (and therefore the credited touch) is deterministic
    * in both engines. Purchases with no prior touch keep NULL channel —
    * organic conversions, a real category, not rows to drop. */
  def lastTouchAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("touch", last(
        when(col("event_type") =!= "purchase",
          struct(col("ts").as("t_ts"), col("event_type").as("t_type"))),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("touch.t_type").as("channel"),
        (col("ts").cast("long") - col("touch.t_ts").cast("long")).as("gap_s"))
  }

  /** Strictly-ordered funnel view → click → purchase: a user reaches stage
    * k only via a stage-k event AT OR AFTER their stage-(k-1) entry time
    * (the unordered sibling [[funnelConversion]] only gates purchase on
    * first view). Each stage is one keyed aggregation joined back onto the
    * event stream — stage k's cutoff is an AGGREGATE of stage k-1, so the
    * three stages are three joins keyed on user_id, not an event-by-event
    * path search; at scale every join key is user_id, so one partitioning
    * serves all three. Timestamps compare exactly (microsecond longs), no
    * float edge. Emits the one-row stage-count funnel. */
  def orderedFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.join(v, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.join(c, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  /** Per-group ordinary-least-squares fit (whole-dollar extendedprice on
    * quantity over lineitem, by return flag): slope and intercept from the
    * closed-form normal equations over EXACT integer sums — n, Σx, Σy, Σxy,
    * Σx² are all BIGINT-exact in both engines, so the only floating-point
    * steps are two IEEE divisions (correctly rounded, engine-identical) and
    * the final round(·,6). The built-in regr_slope/covar aggregates use
    * streaming Welford updates whose low bits depend on accumulation order —
    * exactly the nondeterminism the integer-sums form avoids across engines
    * AND across partitionings. Whole dollars, not cents: n·Σxy must stay
    * inside BIGINT (Spark's ANSI mode throws on overflow), and dollars keep
    * ~240× headroom at sf1 where cents would sit within 3× of the edge.
    * One partial-agg shuffle to |groups| rows. */
  def olsByGroup(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      floor(col("l_extendedprice")).cast("long").as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      // slope computed ONCE in a nested select and reused unrounded in the
      // intercept — writing the quotient out twice invites the two copies
      // drifting apart, and the bit-identical-division argument vs the
      // oracle is checkable in one place
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .select(col("l_returnflag"), col("n"),
        round(col("slope"), 6).as("slope_dollars_per_qty"),
        round((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double"), 6).as("intercept_dollars"))
  }

  /** Time-weighted average per user — the metering/billing aggregate: each
    * value holds from its event until the next one, so the mean must weight
    * by holding DURATION, not by sample count (a plain avg over-weights
    * bursts). Exact integer core: cents × seconds products summed as longs
    * (one lead window per user), with the single double division at the
    * very end. Emits users with ≥2 events (one event has no holding
    * interval). One keyed shuffle for the window; the aggregate rides the
    * same partitioning. */
  def timeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("next_t", lead(col("ts").cast("long"), 1).over(w))
      .filter(col("next_t").isNotNull)
      .withColumn("dt", col("next_t") - col("ts").cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("total_s"),
        sum(col("cents") * col("dt")).as("cent_seconds"))
      .filter(col("total_s") > 0)
      .select(col("user_id"), col("n_intervals"),
        round(col("cent_seconds").cast("double") / col("total_s").cast("double"), 6)
          .as("twa_cents"))
  }

  /** Share-of-parent in a dimension hierarchy: each nation's revenue as a
    * fraction of its region's — the percent-of-total BI primitive done
    * right: aggregate FIRST (one partial-agg shuffle to |nations| rows),
    * then the normalizing window runs over the tiny aggregate, never the
    * fact table. Exact integer cents; one division per output row. */
  def shareOfParent(s: SparkSession, d: String): DataFrame = {
    val byNation = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"), col("n_regionkey"))),
        Seq("c_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name"))), Seq("n_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val wr = Window.partitionBy(col("r_name"))
    byNation.select(col("r_name"), col("n_name"), col("cents"),
      round(col("cents").cast("double") / sum(col("cents")).over(wr).cast("double"), 6)
        .as("share_of_region"))
  }

  /** Conversion-lag distribution per acquisition channel: the follow-on
    * report over [[lastTouchAttribution]] — for each crediting channel, how
    * long purchases took (count, min/max, exact median of integer
    * seconds). Organic conversions (no prior touch) are a labeled group,
    * not dropped rows. Median of integers is an int or int+0.5 — exactly
    * representable, so the interpolated-percentile compare is safe here
    * (unlike general quantiles). Aggregation rides the attribution
    * window's user partitioning until the final |channels|-row shuffle. */
  def conversionLag(s: SparkSession, d: String): DataFrame =
    lastTouchAttribution(s, d)
      .select(coalesce(col("channel"), lit("organic")).as("channel"), col("gap_s"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"),
        expr("percentile(gap_s, 0.5)").as("median_gap_s"))

  /** Session path analysis: the top event-type sequences users walk within
    * a session (30-minute inactivity gap) — the product-analytics "what do
    * converting sessions look like" query. Sessionization via the
    * gaps-and-islands window (new session when the gap exceeds the
    * threshold, session id = running sum of starts — the same shape the
    * session-window oracle uses), then one ordered string_agg per session
    * and a count per distinct path with a deterministic top-k. Scale: two
    * user-keyed window passes + one path-keyed partial agg;
    * TakeOrderedAndProject for the top-k. */
  def sessionPaths(s: SparkSession, d: String, k: Int = 15): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val sessions = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("new_session",
        when(col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(w) > 1800, 1)
          .otherwise(when(lag(col("ts"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id", sum(col("new_session")).over(w))
    sessions
      .groupBy(col("user_id"), col("session_id"))
      // order independence: collect_list order is partition-dependent, so
      // sort the (ts, event_id, type) structs INSIDE the aggregate before
      // projecting the type sequence
      .agg(concat_ws(">", expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** Null-safe join semantics (`<=>` / IS NOT DISTINCT FROM): plain
    * equality drops every row whose join key is NULL on either side —
    * usually silently, because the other rows still match. Here a nullable
    * key is synthesized (every 7th clerk bucket nulled on both sides) and
    * joined null-safely, so the NULL group JOINS — the semantics a
    * dimension with "unknown" members needs. Output aggregates per joined
    * bucket with an explicit is_null_bucket flag. */
  def nullSafeJoin(s: SparkSession, d: String): DataFrame = {
    val bucketed = Tables.orders(s, d).select(
      nullif(col("o_orderkey") % 7, lit(0L)).as("bucket"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val dim = Tables.orders(s, d)
      .select(nullif(col("o_orderkey") % 7, lit(0L)).as("bucket")).distinct()
      .withColumn("bucket_label",
        coalesce(concat(lit("b"), col("bucket")), lit("unknown")))
    bucketed.join(dim, bucketed("bucket") <=> dim("bucket"))
      .groupBy(col("bucket_label"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
      .withColumn("is_null_bucket", col("bucket_label") === "unknown")
  }

  /** Exact DECIMAL money aggregation — the fixed-point alternative to this
    * engine's integer-cents idiom, derived FROM exact integer cents rather
    * than from a double→decimal cast. The direct cast is NOT portable:
    * Spark rounds the double's shortest decimal representation (HALF_UP on
    * `BigDecimal(d.toString)`) while DuckDB scales the binary value, and
    * ~half of all 2dp-printed doubles sit one ulp below the boundary
    * (112946.26 is binary 112946.2599999…), so the two disagree by a cent
    * whenever the engines' cast semantics differ. `round(x*100)` to an
    * integer IS portable: both engines round the identical IEEE product,
    * and shortest-repr vs binary-value rounding cannot disagree at integer
    * scale (the half-integer boundary is itself representable, so a repr
    * never crosses it). Summing longs is exact; dividing an integer-valued
    * decimal by 100 is exact at scale 2; the final casts pin the schema
    * (total DECIMAL(28,2) — Spark's sum-widened type — min/max
    * DECIMAL(18,2)). */
  def decimalMoney(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(col("cents")).cast("decimal(28,2)") / lit(100)).cast("decimal(28,2)").as("total"),
        (min(col("cents")).cast("decimal(18,2)") / lit(100)).cast("decimal(18,2)").as("min_price"),
        (max(col("cents")).cast("decimal(18,2)") / lit(100)).cast("decimal(18,2)").as("max_price"))

  /** The gate-facing money payload: identical arithmetic to [[decimalMoney]]
    * but with NO DECIMAL-typed column in the output. Three consecutive
    * correctness artifacts hash-mismatched the DECIMAL row while the values
    * were verified bitwise-identical on both engines, so the hashed payload
    * here is BIGINT cents plus the money rendered to VARCHAR from integer
    * cents (`%d.%02d` of the div/mod pair) — byte-identical on any engine
    * at any magnitude, no decimal canonicalization in the loop. The
    * DECIMAL-typed variant stays pinned by Round5OpsSpec. Cents are
    * non-negative here, so truncating div/mod is floor div/mod on both
    * sides. */
  def decimalMoneyPortable(s: SparkSession, d: String): DataFrame = {
    def money(c: String) =
      format_string("%d.%02d", expr(s"$c div 100"), expr(s"$c % 100"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("total_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .select(col("o_orderpriority"), col("n"),
        col("total_cents"), col("min_cents"), col("max_cents"),
        money("total_cents").as("total_money"),
        money("min_cents").as("min_money"),
        money("max_cents").as("max_money"))
  }

  /** Incremental view maintenance, the aggregate-merge half: partial
    * aggregates of disjoint slices (the standing materialized view + a new
    * delta batch) merge by summing counts and sums — and the merge MUST
    * equal the full recompute row for row, which is exactly what the plain
    * group-by oracle checks. Only decomposable aggregates (sum/count/min/
    * max) merge this way; avg ships as (sum, count). At warehouse scale
    * this is the contract that lets a nightly view absorb a delta without
    * rescanning history. */
  def incrementalAggMerge(s: SparkSession, d: String): DataFrame = {
    def partial(df: DataFrame): DataFrame = df
      .select(col("o_orderpriority"), floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val orders = Tables.orders(s, d)
    val standing = partial(orders.filter(col("o_orderkey") % 97 =!= 0))
    val delta = partial(orders.filter(col("o_orderkey") % 97 === 0))
    standing.unionByName(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("cents_sum"),
        min(col("mn")).as("cents_min"), max(col("mx")).as("cents_max"))
  }

  /** Sketch-merge range query: daily HLL sketches of active users, merged
    * per week with `hll_union_agg` — the reuse story of mergeable sketches
    * (build per-partition once, answer ANY date range by unioning blobs,
    * never rescanning events). The estimate itself is not oracle-portable
    * (the sketch binary is engine-specific), so the emitted contract is the
    * bound check: exact weekly distinct (decomposability makes DuckDB agree
    * on it) plus an in-bound flag at 5% — ~3σ for the default lgK=12
    * sketch, deterministic because the sketch build is. */
  def hllWeeklyActives(s: SparkSession, d: String): DataFrame = {
    // week key = the week's Monday as a DATE, not weekofyear(): a bare ISO
    // week NUMBER merges week 3 of every year in the stream (and folds
    // Dec 29-31 into "week 1") — wrong semantics that an oracle making the
    // same mistake would never catch
    val weekOf = (c: org.apache.spark.sql.Column) => date_trunc("week", c).cast("date")
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weekly = daily
      .groupBy(weekOf(col("day")).as("week_start"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = Tables.events(s, d)
      .select(weekOf(to_date(col("ts"))).as("week_start"), col("user_id"))
      .groupBy(col("week_start"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(weekly, Seq("week_start"))
      .select(col("week_start"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05).as("est_in_bound"))
  }

  /** TPC-H Q3 shape (shipping-priority): the canonical dim→fact→fact join
    * chain with selective filters on EVERY input — customer segment, order
    * date, ship date — so the optimizer's job (push all three filters below
    * the joins, broadcast the pruned customer side, keep lineitem
    * shuffle-joined on the order key) is visible in the plan. Revenue in
    * exact integer cents: Σ price_cents·(100 − disc_pct) is a long, so the
    * top-10 ordering has no float tie ambiguity. */
  def tpchQ3(s: SparkSession, d: String): DataFrame = {
    val cutoff = "1998-01-01"
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(cutoff).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(cutoff).cast("date"))
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100).cast("long"))).as("rev"))
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue_hcents"))
      .orderBy(col("revenue_hcents").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-way snowflake —
    * region→nation→customer→orders→lineitem→supplier with the
    * same-nation constraint between customer and supplier. The join graph
    * gives the optimizer real ordering freedom (dims broadcast, the two
    * facts meet on the order key once); the nation-equality predicate
    * lands on the supplier join, not a post-filter. Integer-cents revenue
    * per nation. */
  def tpchQ5(s: SparkSession, d: String): DataFrame = {
    val nations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      (floor(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - floor(col("l_discount") * 100).cast("long"))).as("rev"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    cust.join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey")
        && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("revenue_hcents"))
  }

  /** CDC apply: collapse an insert/update/delete operation stream to the
    * final table state — latest op per key wins (ordered by sequence
    * number), a terminal D removes the key. One window over the op stream
    * keyed on the primary key; the op stream is synthesized from orders
    * (customers are keys, their orders a sequenced op feed). The shape a
    * warehouse MERGE target runs on every sync. */
  def cdcApply(s: SparkSession, d: String): DataFrame = {
    val ops = Tables.orders(s, d).select(
      col("o_custkey").as("key"), col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 10 === 0, "D")
        .when(col("o_orderkey") % 10 < 4, "U").otherwise("I").as("op"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val wk = Window.partitionBy(col("key"))
    val w = wk.orderBy(col("seq").desc)
    ops
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(wk))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key"), col("op").as("final_op"),
        col("cents").as("final_cents"), col("n_ops"))
  }

  /** Semi-structured props via the VARIANT type (Spark 4): `parse_json`
    * once into the binary-encoded variant, then typed `variant_get`
    * extractions — the modern replacement for per-field get_json_object
    * re-parses (one parse, many cheap typed reads; at scan scale that is
    * the difference between one and N JSON passes per row). Aggregates the
    * extracted field per event type. */
  def variantProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"), expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
        sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))

  /** Schema-evolution union: a v1 slice (no `source` column) unioned by
    * NAME with a v2 slice that has it — `unionByName(allowMissingColumns)`
    * null-fills the missing column instead of mis-binding by position (the
    * classic silent-corruption bug of positional UNION under evolved
    * schemas). Aggregated per generation so the null-fill is visible in
    * the oracle compare. */
  def schemaEvolutionUnion(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val v1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang")).withColumn("gen", lit("v1"))
    val v2 = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("lang"), col("source")).withColumn("gen", lit("v2"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy(col("gen"), col("lang"))
      .agg(count(lit(1)).as("n"), count(col("source")).as("n_with_source"))
  }

  /** Winsorized robust aggregate: per event_type, values clamped to the
    * [p05, p95] band before summing — the outlier-capping sibling of the
    * drop-based z-score/MAD gates. The percentile bounds are the k-th
    * smallest cents with k = ⌈q·n⌉ computed in INTEGER arithmetic
    * ((n·5+99) div 100) — interpolating quantiles (percentile /
    * quantile_cont) then flooring would put the compare on a 1-ulp
    * knife edge whenever the interpolated value lands on an integer, since
    * engines associate the interpolation differently. Integer cents end to
    * end: clamp and sum are exact. Scale shape: bounds need the k-th order
    * statistic per group (one sort-window pass; at 100 TB swap in the
    * approx_percentile broadcast form, the documented exact/approx pairing
    * of [[graft.operators.Corpus.qualityQuantileGate]]); the |groups|-row
    * bounds frame broadcasts back onto the scan. */
  def winsorizedStats(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val wAll = Window.partitionBy(col("event_type"))
    val bounds = ev
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("rk") === expr("(n * 5 + 99) div 100"), col("cents"))).as("lo"),
        min(when(col("rk") === expr("(n * 95 + 99) div 100"), col("cents"))).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(greatest(least(col("cents"), col("hi")), col("lo"))).as("winsorized_cents"),
        count(when(col("cents") < col("lo"), 1)).as("n_capped_lo"),
        count(when(col("cents") > col("hi"), 1)).as("n_capped_hi"))
  }
}
