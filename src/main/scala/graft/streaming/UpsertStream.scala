package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MERGE/upsert materialization (the streaming form of
  * `Relational.cdcApply`): each micro-batch is merged into a keyed state
  * table with keep-latest semantics, via `foreachBatch` writing VERSIONED
  * snapshots — `state/v<batchId>` — so the merge is idempotent under
  * micro-batch replay (a re-delivered batch id overwrites its own version,
  * never double-applies) and the reader always sees a complete snapshot
  * (no in-place overwrite of a directory being read). This is the
  * reference's mark-processed/UPSERT bookkeeping
  * (FunctionApp2/process_data/__init__.py:96-104) upgraded to a
  * transactional pattern: checkpoint tracks which batches exist, versions
  * make applying them idempotent, and the keep-latest merge is associative
  * and commutative over event sets — so the final state is a pure function
  * of the event SET, independent of batch slicing or delivery order, which
  * is exactly what lets a batch SQL oracle recompute it.
  *
  * At scale the versioned-snapshot rewrite becomes a Delta/Iceberg MERGE
  * (log-structured, no full rewrite); the dataflow — stream → keyed
  * dedup-merge → idempotent commit — is unchanged.
  */
object UpsertStream {

  /** Latest event per user across `cur` ∪ `batch` (keep-latest by event
    * time, event id as the deterministic tie-break). Associative: merging
    * batch-by-batch equals merging all at once. */
  private def mergeLatest(cur: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    cur.unionByName(batch)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  private def latestVersion(stateDir: java.io.File): Option[java.io.File] =
    Option(stateDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .sortBy(_.getName.drop(1).toLong).lastOption

  /** Drain the event stream into versioned keep-latest state snapshots.
    *
    * `afterSinkWrite` fires AFTER the version directory is written and
    * BEFORE foreachBatch returns — i.e. before Spark commits the batch to
    * the checkpoint. Production callers leave it a no-op; the crash-window
    * recovery test (CrashRecoverySpec) throws from it to simulate a process
    * death in exactly the reference's duplicate window
    * (FunctionApp2/process_data/__init__.py:96-104): sink written,
    * checkpoint not yet committed, batch will be re-delivered on restart. */
  def runUpsert(spark: SparkSession, srcDir: String, stateDir: String,
                checkpointDir: String,
                afterSinkWrite: Long => Unit = _ => (),
                maxFilesPerTrigger: Int = 4): StreamingQuery =
    EventsStream.readEvents(spark, srcDir, maxFilesPerTrigger)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val root = new java.io.File(stateDir)
        root.mkdirs()
        val cur = latestVersion(root)
          // only versions BELOW this batch id: on a replayed batch the
          // merge must re-read the predecessor, not its own output
          .filter(_.getName.drop(1).toLong < batchId)
          .map(v => batch.sparkSession.read.parquet(v.toString))
          .getOrElse(batch.limit(0))
        mergeLatest(cur, batch)
          .write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        afterSinkWrite(batchId)
      }
      .start()

  /** The streaming upsert AS a correctness-gate query (`q_stream_upsert`):
    * drain the replay-staged files (which RE-DELIVER half the sampled
    * users' events — the at-least-once transport) through the versioned
    * merge and hand back the final snapshot. The oracle is the batch
    * keep-latest per user over the events table: a batch double-applied, a
    * version read-after-write cycle, a redelivered event beating a newer
    * one, or a lost user all change the hash. */
  def upsertGate(spark: SparkSession, d: String): DataFrame =
    EventsStream.memoDrain(spark, d, "upsert") {
      val srcDir = EventsStream.stageEventsReplay(spark, d)
      val base = java.nio.file.Files.createTempDirectory("graft-stream-upsert-gate")
      val stateDir = base.resolve("state").toString
      val ckptDir = base.resolve("ckpt").toString
      // isolated child session at 8 shuffle partitions — the drainGate
      // conf contract, without mutating the caller's session
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = runUpsert(iso, srcDir, stateDir, ckptDir)
        try q.awaitTermination()
        finally q.stop()
        // KEYSPACE state bounds (round-12 verdict #1), both layers of this
        // gate's state: the streaming query itself holds NO state store
        // (the merge lives in foreachBatch) — pinned stateless — and the
        // versioned snapshot is keyed by user id, so the final version may
        // never exceed the staged files' distinct-user count (keep-latest
        // retains exactly one row per user; a merge that stopped collapsing
        // keys would grow with event volume and red here, the snapshot
        // analog of an eviction regression).
        EventsStream.requireStateless(q, "graft-stream-upsert-gate")
        val userBound = iso.read.parquet(srcDir)
          .select(col("user_id")).distinct().count()
        val latest = latestVersion(new java.io.File(stateDir))
          .getOrElse(sys.error("upsert drain produced no state version"))
        EventsStream.requireKeyspaceBounded(
          iso.read.parquet(latest.toString).count(), userBound,
          "graft-stream-upsert-gate snapshot")
        iso.read.parquet(latest.toString)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            unix_timestamp(col("ts")).as("ts_s"), col("event_type"),
            floor(col("value") * 100).cast("long").as("cents"))
          .localCheckpoint(true)
      } finally deleteRecursively(base.toFile)
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
