package graft

import graft.streaming.{EventsStream, UpsertStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.util.concurrent.atomic.AtomicBoolean

/** Randomized crash-point matrix (round-14 verdict #2): CrashRecoverySpec
  * proves exactly-once across ONE crash point — (upsert sink, batch 0).
  * This spec generalizes it to batch k ∈ {0,1,2} × three sink/state
  * classes:
  *
  *   - upsert        — the hand-VERSIONED merge sink (state lives in the
  *                     sink's own v<batchId> snapshots; recovery = re-read
  *                     predecessor, overwrite own version);
  *   - window-agg    — Spark-MANAGED aggregation state (HDFSBackedStateStore
  *                     versions: replayed batch k reloads state version k
  *                     and recomputes identical output) behind an
  *                     idempotent per-batch-directory foreachBatch sink;
  *   - interval-join — Spark-managed JOIN buffer state (both sides'
  *                     watermarked row buffers), same idempotent sink.
  *
  * Every cell: lifetime 1 dies AFTER the sink write for batch k and BEFORE
  * Spark commits k to the checkpoint (the reference's duplicate window,
  * FunctionApp2/process_data/__init__.py:96-104); lifetime 2 resumes on
  * the same checkpoint with the hook disarmed and must converge to the
  * batch oracle — the replayed batch re-reads the same offsets and the
  * same state version, so an idempotent sink absorbs the re-delivery.
  *
  * The RED-PATH control (per the new sink class — the versioned-merge
  * class's control lives in CrashRecoverySpec): the identical crash
  * protocol against a non-idempotent APPEND sink duplicates the replayed
  * batch's rows, proving the matrix detects the failure mode it guards.
  */
class CrashMatrixSpec extends SparkSpec {

  /** Per-batch-directory idempotent foreachBatch sink: batch id → own dir,
    * overwrite mode — a replayed batch id rewrites its own directory
    * instead of double-appending (the classic idempotent-foreachBatch
    * pattern; at scale this is a Delta/Iceberg MERGE keyed on batch id). */
  private def idempotentSink(outDir: String, afterSinkWrite: Long => Unit)
  : (DataFrame, Long) => Unit = { (batch, id) =>
    batch.write.mode("overwrite").parquet(s"$outDir/b$id")
    afterSinkWrite(id)
  }

  private def readBatches(s: SparkSession, outDir: String): DataFrame = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b")).map(_.toString)
    require(dirs.nonEmpty, "idempotent sink produced no batch directories")
    s.read.parquet(dirs.toIndexedSeq: _*)
  }

  /** Run one crash cell: lifetime 1 with an armed crash at `crashAt`,
    * assert the crash landed post-write, lifetime 2 disarmed, return the
    * converged sink. `mk` builds the query from (hook). */
  private def crashCell(what: String, crashAt: Long,
                        mk: (Long => Unit) => StreamingQuery,
                        sinkEvidence: () => Boolean): Unit = {
    val armed = new AtomicBoolean(true)
    val q1 = mk { id =>
      if (id == crashAt && armed.getAndSet(false))
        throw new RuntimeException(s"injected crash at batch $id")
    }
    val failed = intercept[Exception] { q1.awaitTermination() }
    q1.stop()
    assert(failed.getMessage.contains("injected crash")
      || Option(failed.getCause).exists(_.getMessage.contains("injected crash")), what)
    assert(sinkEvidence(),
      s"$what: crash must land AFTER the sink write for batch $crashAt")
    val q2 = mk(_ => ())
    try q2.awaitTermination() finally q2.stop()
  }

  private def assertSame(what: String, got: DataFrame, truth: DataFrame): Unit = {
    assert(got.count() === truth.count(), what)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      s"$what: post-crash sink diverged from the batch oracle")
  }

  test("upsert sink: exactly-once across crashes at batch 0, 1 and 2") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val kw = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val truth = spark.read.parquet(srcDir)
      .withColumn("rn", row_number().over(kw)).filter(col("rn") === 1).drop("rn")
      .select(col("user_id"), col("event_id"), col("ts")).localCheckpoint(true)
    for (k <- 0L to 2L) {
      val base = java.nio.file.Files.createTempDirectory(s"graft-cmx-upsert-$k")
      val stateDir = base.resolve("state").toString
      val ckptDir = base.resolve("ckpt").toString
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        crashCell(s"upsert@b$k", k,
          hook => UpsertStream.runUpsert(iso, srcDir, stateDir, ckptDir, hook,
            maxFilesPerTrigger = 1),
          () => new java.io.File(s"$stateDir/v$k").exists())
        val versions = new java.io.File(stateDir).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("v"))
          .sortBy(_.getName.drop(1).toLong)
        assert(versions.length > k + 1, s"crash batch $k must not be the last batch")
        assertSame(s"upsert@b$k",
          iso.read.parquet(versions.last.toString)
            .select(col("user_id"), col("event_id"), col("ts")),
          truth)
      } finally deleteRecursively(base.toFile)
    }
  }

  test("window-agg (Spark-managed aggregation state): exactly-once across crashes at batch 0, 1 and 2") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    // batch oracle: hourly cents over the real staged rows — the sentinel
    // pair (negative ids) stays held in the stream and is excluded here
    val truth = spark.read.parquet(srcDir).filter(col("event_id") >= 0)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("total_cents"))
      .localCheckpoint(true)
    for (k <- 0L to 2L) {
      val base = java.nio.file.Files.createTempDirectory(s"graft-cmx-wagg-$k")
      val outDir = base.resolve("out").toString
      val ckptDir = base.resolve("ckpt").toString
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        crashCell(s"window-agg@b$k", k,
          hook => EventsStream.windowedCents(EventsStream.readEvents(iso, srcDir, 1))
            .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
            .option("checkpointLocation", ckptDir)
            .foreachBatch(idempotentSink(outDir, hook)).start(),
          () => new java.io.File(s"$outDir/b$k").exists())
        assertSame(s"window-agg@b$k", readBatches(iso, outDir), truth)
      } finally deleteRecursively(base.toFile)
    }
  }

  test("interval-join (Spark-managed join buffers): exactly-once across crashes at batch 0, 1 and 2") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    // batch oracle: the left interval join over the staged files (sentinel
    // pair excluded from the payload; it exists to close the watermark tail)
    val ev = spark.read.parquet(srcDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    val truth = p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"), "left_outer")
      .filter(col("purchase_id") >= 0)
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        unix_timestamp(col("p_ts")).as("p_s"), unix_timestamp(col("v_ts")).as("v_s"))
      .localCheckpoint(true)
    for (k <- 0L to 2L) {
      val base = java.nio.file.Files.createTempDirectory(s"graft-cmx-ssj-$k")
      val outDir = base.resolve("out").toString
      val ckptDir = base.resolve("ckpt").toString
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        crashCell(s"interval-join@b$k", k,
          hook => EventsStream.purchasesWithRecentViewsOuter(
              EventsStream.readEvents(iso, srcDir, 1))
            .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
            .option("checkpointLocation", ckptDir)
            .foreachBatch(idempotentSink(outDir, hook)).start(),
          () => new java.io.File(s"$outDir/b$k").exists())
        assertSame(s"interval-join@b$k",
          readBatches(iso, outDir).filter(col("purchase_id") >= 0)
            .select(col("purchase_id"), col("user_id"), col("view_id"),
              unix_timestamp(col("p_ts")).as("p_s"), unix_timestamp(col("v_ts")).as("v_s")),
          truth)
      } finally deleteRecursively(base.toFile)
    }
  }

  test("RED PATH: the same crash against a non-idempotent append sink duplicates the replayed batch") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-cmx-naive")
    val outDir = base.resolve("out").toString
    val ckptDir = base.resolve("ckpt").toString
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      def mk(hook: Long => Unit) =
        EventsStream.windowedCents(EventsStream.readEvents(iso, srcDir, 1))
          .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("append").parquet(outDir); hook(id)
          }.start()
      val armed = new AtomicBoolean(true)
      val q1 = mk { id =>
        if (id == 1L && armed.getAndSet(false)) throw new RuntimeException("injected crash")
      }
      intercept[Exception] { q1.awaitTermination() }
      q1.stop()
      val q2 = mk(_ => ())
      try q2.awaitTermination() finally q2.stop()
      val written = iso.read.parquet(outDir)
      // the replayed batch's emitted windows landed twice
      assert(written.groupBy(col("ws"), col("event_type"))
        .count().filter(col("count") > 1).count() > 0,
        "append sink unexpectedly exactly-once — the protocol is not exercising the window")
    } finally deleteRecursively(base.toFile)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
