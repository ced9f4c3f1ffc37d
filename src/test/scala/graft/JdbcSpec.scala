package graft

import graft.sources.{Jdbc, JdbcConfig}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** JDBC source/sink (S5/S6) against embedded Derby — the literal-parity path
  * for the reference's SQL-database read/write. Round-trip fidelity, the
  * partitioned-read fan-out, and filter pushdown into the remote query. */
class JdbcSpec extends SparkSpec {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").toString
  private lazy val cfg = JdbcConfig(url = s"jdbc:derby:$dbDir/graftdb;create=true")

  private def docsSlice =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .filter(col("doc_id") < 50)

  test("S6/S5: documents round-trip through a JDBC table unchanged") {
    Jdbc.write(docsSlice, cfg, "docs_rt", SaveMode.Overwrite)
    val back = Jdbc.read(spark, cfg, "docs_rt")
    assert(back.count() === docsSlice.count())
    assert(back.except(docsSlice).isEmpty && docsSlice.except(back).isEmpty)
  }

  test("S6: append mode accumulates batches (the reference's scored-rows INSERT)") {
    Jdbc.write(docsSlice, cfg, "docs_append", SaveMode.Overwrite)
    Jdbc.write(docsSlice, cfg, "docs_append", SaveMode.Append)
    assert(Jdbc.read(spark, cfg, "docs_append").count() === 2 * docsSlice.count())
  }

  test("S5: partitioned read fans out over range slices with identical content") {
    Jdbc.write(docsSlice, cfg, "docs_part", SaveMode.Overwrite)
    val part = Jdbc.readPartitioned(spark, cfg, "docs_part",
      partitionColumn = "doc_id", lowerBound = 0L, upperBound = 50L, numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.except(docsSlice).isEmpty && docsSlice.except(part).isEmpty)
  }

  test("S5: filters push down into the remote JDBC query") {
    Jdbc.write(docsSlice, cfg, "docs_push", SaveMode.Overwrite)
    val q = Jdbc.read(spark, cfg, "docs_push").filter(col("doc_id") < 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("doc_id"),
      s"expected the doc_id predicate pushed into the JDBC scan:\n$plan")
    assert(q.count() === docsSlice.filter(col("doc_id") < 10).count())
  }
}
