package graft

import graft.streaming.{EventsStream, UpsertStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Forked-JVM SIGKILL crash cells (round-15 verdict #3 — the last daylight
  * between the crash matrix and the claim). CrashMatrixSpec's injected
  * exception leaves the JVM alive: finalizers, stream-thread teardown and
  * buffered writers still run, which a serverless worker killed mid-run
  * (the reference's failure mode) does not get. Each cell here forks a
  * REAL child JVM (KillDrainMain) on the current classpath, lets it drain
  * to the crash batch — whose sink hook writes the sink output, touches a
  * marker, and blocks holding the checkpoint commit open — then delivers
  * an OS-level SIGKILL (`Process.destroyForcibly`, exit 137 asserted).
  * The crash window is verified structurally: the sink artifact for batch
  * k exists on disk while `ckpt/commits/k` does not. The parent then
  * resumes the SAME query class in-process on the killed child's
  * checkpoint and asserts convergence to the batch oracle — one cell per
  * sink/state class (hand-versioned upsert; Spark-managed aggregation
  * state; Spark-managed join buffers), crash at batch 1 so recovery
  * reloads non-trivial prior state.
  */
class CrashKillSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val CrashBatch = 1L

  /** All five child JVMs fork CONCURRENTLY on first touch (suite-wall
    * discipline: each child pays ~20 s of JVM+Spark init and then blocks
    * at its marker; serial forking quintupled that). Each cell's test
    * then finds its child already holding the commit open and only pays
    * the kill + in-process resume. */
  private lazy val cells: Map[String, (java.nio.file.Path, Process)] = {
    val srcDir = graft.streaming.EventsStream.stageEvents(spark, sf)
    Seq("upsert", "wagg", "ssj", "profile", "timer").map { k =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-kill-$k")
      k -> (base, forkChild(k, srcDir, base))
    }.toMap
  }

  override def afterAll(): Unit = {
    // a failed test must not leak a blocked child JVM or its scratch tree
    cells.values.foreach { case (base, p) =>
      if (p.isAlive) { p.destroyForcibly(); p.waitFor() }
      deleteRecursively(base.toFile)
    }
    super.afterAll()
  }

  private def forkChild(klass: String, srcDir: String,
                        base: java.nio.file.Path): Process = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    // same JDK17 add-opens the forked test JVM itself runs with (build.sbt)
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString).filter(_.startsWith("--add-opens")).toSeq
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.KillDrainMain", klass, srcDir, base.toString, CrashBatch.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(base.resolve("child.log").toFile)
    pb.start()
  }

  /** Wait for the cell's marker, SIGKILL the child; returns after
    * asserting the kill landed inside the sink-written/uncommitted window. */
  private def forkAndKill(klass: String, sinkEvidenceOf: java.nio.file.Path => java.io.File)
  : java.nio.file.Path = {
    val (base, p) = cells(klass)
    val marker = base.resolve("killme").toFile
    val deadline = System.nanoTime() + 180L * 1000000000L
    while (!marker.exists() && p.isAlive && System.nanoTime() < deadline)
      Thread.sleep(200)
    assert(marker.exists(), s"$klass child never reached the crash batch " +
      s"(alive=${p.isAlive}; see ${base.resolve("child.log")})")
    // the marker is written AFTER the sink write returns, so the sink
    // artifact must already be on disk
    assert(sinkEvidenceOf(base).exists(),
      s"$klass: sink artifact for batch $CrashBatch missing at kill time")
    p.destroyForcibly() // SIGKILL on Linux
    assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), "child survived SIGKILL")
    assert(p.exitValue() == 137,
      s"$klass child exit ${p.exitValue()} — expected 137 (128+SIGKILL)")
    // the held-open commit really was never written: the crash window is
    // (sink written, checkpoint commit absent), the reference's duplicate
    // window — now produced by an actual process death
    assert(!new java.io.File(s"$base/ckpt/commits/$CrashBatch").exists(),
      s"$klass: checkpoint commit $CrashBatch exists — the kill missed the window")
    base
  }

  private def assertSame(what: String, got: DataFrame, truth: DataFrame): Unit = {
    assert(got.count() === truth.count(), what)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      s"$what: post-SIGKILL resume diverged from the batch oracle")
  }

  private def readBatches(outDir: String): DataFrame = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b")).map(_.toString)
    require(dirs.nonEmpty, "idempotent sink produced no batch directories")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  private def idempotentSink(outDir: String): (DataFrame, Long) => Unit =
    (batch, id) => batch.write.mode("overwrite").parquet(s"$outDir/b$id")

  test("SIGKILL cell — upsert (hand-versioned merge sink)") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = forkAndKill("upsert", b => new java.io.File(s"$b/state/v$CrashBatch"))
    locally {
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      val q = UpsertStream.runUpsert(iso, srcDir, s"$base/state", s"$base/ckpt")
      try q.awaitTermination() finally q.stop()
      val versions = new java.io.File(s"$base/state").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .sortBy(_.getName.drop(1).toLong)
      assert(versions.length > CrashBatch + 1, "crash batch must not be the last batch")
      val kw = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val truth = spark.read.parquet(srcDir)
        .withColumn("rn", row_number().over(kw)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"))
      assertSame("kill-upsert",
        spark.read.parquet(versions.last.toString)
          .select(col("user_id"), col("event_id"), col("ts")),
        truth)
    }
  }

  test("SIGKILL cell — window-agg (Spark-managed aggregation state)") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = forkAndKill("wagg", b => new java.io.File(s"$b/out/b$CrashBatch"))
    locally {
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      val q = EventsStream.windowedCents(EventsStream.readEvents(iso, srcDir, 1))
        .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch(idempotentSink(s"$base/out")).start()
      try q.awaitTermination() finally q.stop()
      val truth = spark.read.parquet(srcDir).filter(col("event_id") >= 0)
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100).cast("long")).as("total_cents"))
      assertSame("kill-wagg", readBatches(s"$base/out"), truth)
    }
  }

  test("SIGKILL cell — interval-join (Spark-managed join buffers)") {
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = forkAndKill("ssj", b => new java.io.File(s"$b/out/b$CrashBatch"))
    locally {
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      val q = EventsStream.purchasesWithRecentViewsOuter(
          EventsStream.readEvents(iso, srcDir, 1))
        .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch(idempotentSink(s"$base/out")).start()
      try q.awaitTermination() finally q.stop()
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
      assertSame("kill-ssj",
        readBatches(s"$base/out").filter(col("purchase_id") >= 0)
          .select(col("purchase_id"), col("user_id"), col("view_id"),
            unix_timestamp(col("p_ts")).as("p_s"), unix_timestamp(col("v_ts")).as("v_s")),
        truth)
    }
  }

  test("SIGKILL cell — transformWithState v2 (RocksDB column-family state)") {
    // round-15 verdict #5: the v2 state path (q_stream_profile) had one
    // curated gate and no crash evidence — and it is the one class whose
    // state lives in RocksDB files + changelog, where a process death
    // mid-commit leaves genuinely different on-disk debris than the
    // HDFS-backed in-memory store. Same protocol; the resumed drain must
    // reload the column families (counter + capped list) at state version
    // k and converge to the batch-recomputed final profiles.
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = forkAndKill("profile", b => new java.io.File(s"$b/out/b$CrashBatch"))
    locally {
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      val q = graft.streaming.StateV2Profile.runProfiles(iso, srcDir,
        s"$base/out", s"$base/ckpt", idempotentSink = true, maxFilesPerTrigger = 1)
      try q.awaitTermination() finally q.stop()
      // reduce the update-mode per-batch sink to final state per user (the
      // q_stream_profile convention: n_events strictly increases per touch)
      val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
      val got = readBatches(s"$base/out")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("user_id") >= 0)
        .select(col("user_id"), col("n_events"), col("purchase_cents"),
          concat_ws(",", col("recent_purchases")).as("recent"))
      // batch oracle: all three state families recomputed from the staged
      // events — running count, purchase-cents total, newest-5 purchase
      // cents by ascending event id
      val truth = spark.read.parquet(srcDir).filter(col("user_id") >= 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          coalesce(sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long"))), lit(0L)).as("purchase_cents"),
          // reverse/slice(1,5)/reverse, not slice(arr,-5,5): a negative start
          // larger than the array empties it, so a user with 1..4 purchases
          // would get truth recent="" against the engine's correct short list
          concat_ws(",", expr(
            """transform(reverse(slice(reverse(array_sort(collect_list(
              |  CASE WHEN event_type = 'purchase'
              |  THEN struct(event_id, CAST(floor(value * 100) AS BIGINT) AS cents) END))),
              |  1, 5)), x -> x.cents)""".stripMargin)).as("recent"))
      assertSame("kill-profile", got, truth)
    }
  }

  test("SIGKILL cell — armed v2 event-time timers (timer rows ARE checkpoint state)") {
    // Round-18 verdict #3: the four cells above cover upsert/window-agg/
    // join-buffer/v2 ValueState+ListState state, but none dies while
    // registered event-time TIMERS are armed and un-fired — and timer
    // durability across process death is checkpoint state exactly the way
    // row state is. The child drains StateV2Sessions one file per batch;
    // at CrashBatch=1 only 2 of the 5 staged files (4 range files + the
    // far-future sentinel, which is LAST) have been admitted, so the
    // watermark trails the buffered sessions by a file's span and most
    // keys hold an armed timer at the earliest open close. The SIGKILL
    // lands inside (sink written, commit absent) with those timers
    // un-fired; the resumed drain must reload timer rows + buffers from
    // the checkpoint and emit every session EXACTLY once — a lost timer
    // holds its sessions forever (missing rows), a replayed/double-fired
    // one double-emits (extra rows); both diverge from the batch
    // gaps-and-islands oracle.
    val srcDir = EventsStream.stageEvents(spark, sf)
    val base = forkAndKill("timer", b => new java.io.File(s"$b/out/b$CrashBatch"))
    locally {
      // structural pre-kill evidence: the batches written before the kill
      // emitted only a strict PREFIX of the sessions — the remainder exists
      // nowhere but in the recovered buffer+timer state
      val preKill = readBatches(s"$base/out").filter(col("user_id") >= 0).count()
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "4")
      val q = graft.streaming.StateV2Sessions.runSessions(iso, srcDir,
        s"$base/out", s"$base/ckpt", maxFilesPerTrigger = 1, idempotentSink = true)
      try q.awaitTermination() finally q.stop()
      val got = readBatches(s"$base/out").filter(col("user_id") >= 0)
        .select(col("user_id"), col("ws"), col("le"), col("n_events"), col("cents"))
      // batch gaps-and-islands oracle (the q_stream_timer_sessions truth):
      // a ≥30 min pause splits; the staged sentinel (max+2 h) closes every
      // real session under the final watermark, so no cutoff filter is
      // needed — the full sessionization is the truth
      val gapUs = graft.streaming.StateV2Sessions.GapSec * 1000000L
      val ow = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      val truth = spark.read.parquet(srcDir).filter(col("user_id") >= 0)
        .select(col("event_id"), unix_micros(col("ts")).as("es"), col("user_id"),
          floor(col("value") * 100).cast("long").as("c"))
        .withColumn("brk",
          when(col("es") - lag("es", 1).over(ow) >= gapUs, 1L).otherwise(0L))
        .withColumn("sid", sum("brk").over(
          ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min("es").as("ws"), max("es").as("le"),
          count(lit(1)).as("n_events"), sum("c").as("cents"))
        .select(col("user_id"), col("ws"), col("le"), col("n_events"), col("cents"))
      val total = truth.count()
      assert(preKill < total,
        s"pre-kill batches already emitted $preKill of $total sessions — the kill " +
          "landed after the armed-timer window, restage with a later crash batch")
      assertSame("kill-timer", got, truth)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
