package graft

import graft.ml.LexiconScorer
import graft.operators.Orchestration
import graft.operators.Orchestration.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pipeline end-to-end (SURVEY.md §5.3): sample.json → bronze → silver →
  * enrich (hermetic scorer) → results + all rows marked processed; a re-run
  * enriches nothing new (exactly-once upgrade over the reference's
  * at-least-once duplicate window). */
class OrchestrationSpec extends SparkSpec {

  test("full pipeline: 25 reviews end-to-end, then an idempotent re-run") {
    val layout = Layout(Files.createTempDirectory("graft-pipe").toString)
    val n = Orchestration.run(spark, "/root/reference/sample.json", layout, LexiconScorer)
    assert(n === 25L)

    val results = spark.read.parquet(layout.results)
    assert(results.columns.toSeq === Seq("record_id", "sentiment", "confidence"))
    assert(results.count() === 25L)
    assert(results.select("sentiment").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("positive", "neutral", "negative")))

    val silver = spark.read.parquet(layout.silver)
    assert(silver.filter(col("processed") === 0).count() === 0L, "all rows marked processed")

    // re-run enrich only: pending set is empty → P6 short-circuit, no new rows
    val n2 = Orchestration.enrich(spark, layout, LexiconScorer)
    assert(n2 === 0L)
    assert(spark.read.parquet(layout.results).count() === 25L, "re-run appended rows")
  }

  test("observed metrics ride the action and equal a direct aggregation") {
    import org.apache.spark.sql.functions._
    val m = Orchestration.observedMetrics(spark, sf).head()
    val direct = operators.Pipeline.silverBuild(spark, sf).agg(
      count(lit(1)), sum(col("processed")).cast("long"),
      count(when(col("text_column").isNull, 1)),
      sum(length(col("text_column"))).cast("long")).head()
    assert(m.getAs[Long]("n_rows") === direct.getLong(0))
    assert(m.getAs[Long]("n_processed") === direct.getLong(1))
    assert(m.getAs[Long]("n_null_text") === direct.getLong(2))
    assert(m.getAs[Long]("text_chars") === direct.getLong(3))
    assert(m.getAs[Long]("n_rows") > 0, "empty corpus verifies nothing")
  }

  test("P7: config validation names every missing key") {
    val ex = intercept[IllegalArgumentException] {
      Orchestration.validateConfig(
        Map("endpoint" -> "x", "key" -> ""),
        Seq("endpoint", "key", "db_server"))
    }
    assert(ex.getMessage.contains("key") && ex.getMessage.contains("db_server"))
    Orchestration.validateConfig(Map("endpoint" -> "x"), Seq("endpoint")) // passes
  }

  test("S8: dual catalogs expose silver and results as separate namespaces") {
    val layout = Layout(Files.createTempDirectory("graft-cat").toString)
    Orchestration.run(spark, "/root/reference/sample.json", layout, LexiconScorer)
    Orchestration.registerCatalogs(spark, layout)
    assert(spark.sql("SELECT count(*) FROM adf.source_table").head().getLong(0) === 25L)
    assert(spark.sql("SELECT count(*) FROM ai.sentiment_results").head().getLong(0) === 25L)
    val joined = spark.sql(
      """SELECT s.id, r.sentiment FROM adf.source_table s
        |JOIN ai.sentiment_results r ON CAST(s.id AS STRING) = r.record_id""".stripMargin)
    assert(joined.count() === 25L) // J2: result↔source key propagation
  }

  test("S4: bronze landing is partitioned by hotel_id") {
    val layout = Layout(Files.createTempDirectory("graft-bronze").toString)
    Orchestration.ingestToBronze(spark, "/root/reference/sample.json", layout)
    val dirs = new java.io.File(layout.bronze).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("hotel_id=")), s"no partition dirs in ${dirs.toSeq}")
    // partition pruning: a hotel_id filter scans only its partition
    val plan = spark.read.parquet(layout.bronze)
      .filter(col("hotel_id") === 1676161L).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("hotel_id"))
  }
}
