package graft

import graft.streaming.{EventsStream, UpsertStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicBoolean

/** Crash-window recovery (round-13 verdict #3): the two-lifetime drains in
  * StreamingSpec prove checkpoint resume after a GRACEFUL stop; this spec
  * injects a failure between the foreachBatch sink write and the
  * checkpoint commit — the exact window where the reference's duplicate
  * bug lived (FunctionApp2/process_data/__init__.py:96-104: rows written,
  * then the process dies before bookkeeping, and the next cron re-applies
  * them) — and asserts the restarted query converges to exactly-once
  * output on the idempotent versioned-merge sink.
  *
  * The control test is the red light: the SAME crash protocol against a
  * naive append sink (what "removing the merge key" degrades to) produces
  * duplicates, proving the harness detects the failure mode and that the
  * versioned merge — not luck of scheduling — is what closes the window.
  */
class CrashRecoverySpec extends SparkSpec {

  /** Batch keep-latest-per-user oracle over the staged source files. */
  private def oracle(srcDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    spark.read.parquet(srcDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .select(col("user_id"), col("event_id"), col("ts"))
  }

  test("upsert sink converges to exactly-once across a crash between sink write and checkpoint commit") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-crash-upsert")
    val stateDir = base.resolve("state").toString
    val ckptDir = base.resolve("ckpt").toString
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      // Lifetime 1: die AFTER the v0 snapshot is on disk, BEFORE Spark
      // commits batch 0 — the sink has the data, the checkpoint does not.
      val armed = new AtomicBoolean(true)
      val q1 = UpsertStream.runUpsert(iso, srcDir, stateDir, ckptDir,
        afterSinkWrite = batchId => {
          if (batchId == 0 && armed.getAndSet(false))
            throw new RuntimeException("injected crash: sink written, checkpoint not committed")
        })
      val failed = intercept[Exception] { q1.awaitTermination() }
      q1.stop()
      assert(failed.getMessage.contains("injected crash")
        || Option(failed.getCause).exists(_.getMessage.contains("injected crash")))
      // the sink-side evidence of the crash window: v0 exists on disk even
      // though the checkpoint never committed batch 0
      assert(new java.io.File(s"$stateDir/v0").exists(),
        "crash must land AFTER the sink write for this test to mean anything")

      // Lifetime 2: same checkpoint, hook disarmed. Batch 0 is re-delivered
      // with the SAME batch id; the versioned merge re-reads the
      // predecessor (none), overwrites its own v0, and the drain continues.
      val q2 = UpsertStream.runUpsert(iso, srcDir, stateDir, ckptDir)
      try q2.awaitTermination() finally q2.stop()

      val versions = new java.io.File(stateDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .sortBy(_.getName.drop(1).toLong)
      assert(versions.length > 1, "expected multiple micro-batches (maxFilesPerTrigger=4)")
      val got = iso.read.parquet(versions.last.toString)
        .select(col("user_id"), col("event_id"), col("ts"))
      // exactly-once: the post-crash snapshot equals the batch oracle —
      // no double-applied event can change keep-latest output rows, and
      // no user lost to the replay (oracle materialized once, not per arm)
      val truth = oracle(srcDir).localCheckpoint(true)
      assert(got.count() === truth.count())
      assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
        "post-crash snapshot diverged from the batch keep-latest oracle")
    } finally deleteRecursively(base.toFile)
  }

  test("RED PATH: the same crash against a naive append sink duplicates the replayed batch") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-crash-naive")
    val outDir = base.resolve("out").toString
    val ckptDir = base.resolve("ckpt").toString
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "4")
    def naive(afterSinkWrite: Long => Unit) =
      EventsStream.readEvents(iso, srcDir)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("append").parquet(outDir)
          afterSinkWrite(batchId)
        }
        .start()
    try {
      val armed = new AtomicBoolean(true)
      val q1 = naive { batchId =>
        if (batchId == 0 && armed.getAndSet(false))
          throw new RuntimeException("injected crash")
      }
      intercept[Exception] { q1.awaitTermination() }
      q1.stop()
      val q2 = naive(_ => ())
      try q2.awaitTermination() finally q2.stop()
      val written = iso.read.parquet(outDir)
      val srcCount = iso.read.parquet(srcDir).count()
      // at-least-once, visibly: batch 0 landed twice
      assert(written.count() > srcCount,
        "naive append sink unexpectedly exactly-once — the crash protocol is not exercising the window")
      assert(written.groupBy(col("event_id")).count().filter(col("count") > 1).count() > 0)
    } finally deleteRecursively(base.toFile)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
