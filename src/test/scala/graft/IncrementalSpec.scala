package graft

import graft.ml.BatchedScorer
import graft.ml.BatchedScorer.{Doc, Scored}
import graft.operators.Orchestration
import graft.sources.ReviewIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition-level mark-processed, quarantine scoring, ragged page merge. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned mark-processed touches partitions, preserves every row") {
    val dir = Files.createTempDirectory("graft-incr").toString + "/silver"
    (0L until 100L).map(i => (i, s"text $i")).toDF("id", "text_column")
      .withColumn("processed", lit(0))
      .write.partitionBy("processed").parquet(dir)

    val done1 = (0L until 40L).toDF("id")
    Orchestration.markProcessedPartitioned(spark, dir, done1)
    val after1 = spark.read.parquet(dir)
    assert(after1.count() === 100L)
    assert(after1.filter(col("processed") === 1).count() === 40L)
    assert(after1.filter(col("processed") === 0).count() === 60L)

    // second increment marks the rest; pending partition must end EMPTY
    val done2 = (40L until 100L).toDF("id")
    Orchestration.markProcessedPartitioned(spark, dir, done2)
    val after2 = spark.read.parquet(dir)
    assert(after2.count() === 100L)
    assert(after2.filter(col("processed") === 0).count() === 0L)
    assert(after2.select("id").distinct().count() === 100L, "rows lost or duplicated")
  }

  test("quarantine mode: poison batch yields error rows, not a failed job") {
    val docs = (1 to 25).map(i => Doc(i.toString, if (i == 13) "POISON" else s"t$i"))
      .toDS().repartition(1)
    def scorer(batch: Seq[Doc]): Seq[Scored] = {
      if (batch.exists(_.text == "POISON")) sys.error("scorer exploded")
      batch.map(d => Scored(d.record_id, "neutral", 0.5))
    }
    val out = BatchedScorer.scoreBatchedWithQuarantine(docs, scorer _).collect()
    assert(out.length === 25)
    val failed = out.filter(_.error != null)
    // the poison doc's whole batch of 10 quarantines (abort-whole-batch is
    // the reference's RPC granularity); the other batches score
    assert(failed.length === 10)
    assert(failed.forall(_.sentiment == null))
    assert(out.count(_.sentiment == "neutral") === 15)
  }

  test("strict mode reproduces abort-all") {
    val docs = (1 to 5).map(i => Doc(i.toString, "POISON")).toDS()
    intercept[org.apache.spark.SparkException] {
      BatchedScorer.scoreBatchedWithQuarantine(
        docs, _ => sys.error("boom"), strict = true).collect()
    }
  }

  test("mergePages aligns ragged schemas by name with null fill") {
    val p1 = Seq((1L, "t1")).toDF("review_id", "title")
    val p2 = Seq((2L, "fr")).toDF("review_id", "languagecode")
    val merged = ReviewIngest.mergePages(Seq(p1, p2))
    assert(merged.columns.toSet === Set("review_id", "title", "languagecode"))
    assert(merged.count() === 2L)
    assert(merged.filter(col("review_id") === 2L).select("title").head().isNullAt(0))
  }
}
