package graft

import graft.operators.{Bucketing, TextAnalysis}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed co-located joins + landing-zone compaction + redaction. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    Bucketing.writeBucketed(
      Tables.orders(spark, sf), "b_orders", "o_orderkey", 8, s"$wh/orders")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8, s"$wh/lineitem")
    // force the SMJ path: at sf0.001 the planner (correctly) prefers
    // broadcasting tiny orders, which bypasses bucketing entirely — the
    // property under test is the no-shuffle sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("compaction preserves data and reduces file count") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/landing"
    Tables.events(spark, sf).repartition(24).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val rowsBefore = spark.read.parquet(dir).count()
    Bucketing.compact(spark, dir, targetFiles = 2)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before && after <= 2)
    assert(spark.read.parquet(dir).count() === rowsBefore)
  }

  test("redaction replaces and counts PII-shaped spans") {
    import spark.implicits._
    val doc = Seq((1L, "mail me at a.b@test.org or visit https://x.io/page id 1234567 ok"))
      .toDF("doc_id", "text")
    val row = doc.select(
      col("doc_id"),
      regexp_count(col("text"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).as("e"),
      regexp_count(col("text"), lit("https?://[^\\s]+")).as("u"),
      regexp_count(col("text"), lit("[0-9]{6,}")).as("d"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^\\s]+", "<URL>"), "[0-9]{6,}", "<NUM>").as("r")).head()
    assert(row.getInt(1) === 1 && row.getInt(2) === 1 && row.getInt(3) === 1)
    assert(row.getString(4) === "mail me at <EMAIL> or visit <URL> id <NUM> ok")
    // and the registered query runs over the corpus
    assert(TextAnalysis.redact(spark, sf).count() > 0)
  }
}
