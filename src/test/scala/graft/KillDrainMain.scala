package graft

import graft.streaming.{EventsStream, UpsertStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** CHILD half of the forked-JVM SIGKILL crash cell (round-15 verdict #3;
  * CrashKillSpec is the parent). The in-process crash matrix
  * (CrashMatrixSpec) injects an exception from the foreachBatch hook — the
  * JVM survives, so finalizers, stream-thread cleanup, and lazily-flushed
  * writers all still run. The reference's actual failure mode (a
  * serverless worker killed mid-run) is a process DEATH; this main exists
  * to die one.
  *
  * Protocol: drain the given stateful query class against a shared
  * checkpoint with maxFilesPerTrigger=1; the sink hook for `crashBatch`
  * writes its sink output, then touches the `killme` marker and BLOCKS —
  * holding the batch's checkpoint commit open — until the parent, which
  * polls for the marker, delivers a real `kill -9` (Process.
  * destroyForcibly → SIGKILL on Linux). Deterministic placement (sink
  * written, commit provably absent) AND a genuine OS-level process death:
  * no shutdown hooks, no finalizers, no flushes. The parent then resumes
  * the query in-process on the same checkpoint and asserts convergence to
  * the batch oracle.
  *
  * Args: <class: upsert|wagg|ssj|profile|timer> <srcDir> <baseDir> <crashBatch>
  * baseDir layout: out/ (or state/ for upsert), ckpt/, killme (marker).
  */
object KillDrainMain {
  def main(args: Array[String]): Unit = {
    val Array(klass, srcDir, baseDir, crashBatchS) = args
    val crashBatch = crashBatchS.toLong
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = s"$baseDir/out"
    val ckptDir = s"$baseDir/ckpt"
    val stateDir = s"$baseDir/state"
    val marker = java.nio.file.Paths.get(baseDir, "killme")
    def hook(id: Long): Unit = if (id == crashBatch) {
      java.nio.file.Files.write(marker, Array.emptyByteArray)
      // hold the commit open for the parent's kill -9; SIGKILL preempts
      // the sleep, so this never returns on the intended path
      Thread.sleep(600000L)
    }
    def idempotentSink: (DataFrame, Long) => Unit = { (batch, id) =>
      batch.write.mode("overwrite").parquet(s"$outDir/b$id")
      hook(id)
    }
    val q = klass match {
      case "upsert" =>
        UpsertStream.runUpsert(spark, srcDir, stateDir, ckptDir, hook, maxFilesPerTrigger = 1)
      case "wagg" =>
        EventsStream.windowedCents(EventsStream.readEvents(spark, srcDir, 1))
          .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
          .option("checkpointLocation", ckptDir)
          .foreachBatch(idempotentSink).start()
      case "ssj" =>
        EventsStream.purchasesWithRecentViewsOuter(EventsStream.readEvents(spark, srcDir, 1))
          .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
          .option("checkpointLocation", ckptDir)
          .foreachBatch(idempotentSink).start()
      case "profile" =>
        // transformWithState v2 (RocksDB column-family state), sliced to
        // one file per batch so the crash batch has non-trivial prior state
        graft.streaming.StateV2Profile.runProfiles(spark, srcDir, outDir, ckptDir,
          hook, idempotentSink = true, maxFilesPerTrigger = 1)
      case "timer" =>
        // transformWithState v2 with ARMED EVENT-TIME TIMERS (round-18
        // verdict #3): at the crash batch the staged 5-file slicing
        // guarantees most keys hold buffered session events plus a
        // registered, un-fired timer — the watermark is still one file's
        // delay behind, and the sentinel that would fire the tail timers is
        // the LAST staged file. The SIGKILL therefore lands between timer
        // registration and expiry; resume must reload the timer rows with
        // the buffers and emit every session exactly once.
        graft.streaming.StateV2Sessions.runSessions(spark, srcDir, outDir, ckptDir,
          maxFilesPerTrigger = 1, afterSinkWrite = hook, idempotentSink = true)
    }
    q.awaitTermination()
    // only reachable if the parent failed to kill us — exit distinctly so
    // the spec can tell "drain completed unkilled" from a SIGKILL'd 137
    System.err.println("[kill-drain] drain completed WITHOUT being killed")
    spark.stop()
    sys.exit(3)
  }
}
