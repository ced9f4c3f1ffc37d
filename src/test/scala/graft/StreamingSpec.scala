package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Structured Streaming slice (SURVEY.md §2.10): AvailableNow drain,
  * checkpointed exactly-once foreachBatch, stream/batch agreement. */
class StreamingSpec extends SparkSpec {

  /** Spark-written copy of events (µs timestamps), range-partitioned by time
    * so the file source replays them roughly in event-time order across
    * several micro-batches — which is what lets the watermark advance and
    * close windows between batches. */
  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    Tables.events(spark, sf).repartitionByRange(8, col("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("foreachBatch sink drains the source exactly once under AvailableNow") {
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    EventsStream.run(spark, srcDir, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val expected = Tables.events(spark, sf).count()
    assert(streamed.count() === expected)
    assert(streamed.select("event_id").distinct().count() === expected)
  }

  test("checkpoint recovery: restarting the drained query appends nothing") {
    val out = Files.createTempDirectory("graft-stream-out2").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt2").toString
    EventsStream.run(spark, srcDir, out, ckpt).awaitTermination(120000)
    val afterFirst = spark.read.parquet(out).count()
    // second run with the SAME checkpoint: offsets say everything is done
    EventsStream.run(spark, srcDir, out, ckpt).awaitTermination(120000)
    val afterSecond = spark.read.parquet(out).count()
    assert(afterFirst === afterSecond, "restart re-emitted rows — not exactly-once")
  }

  test("transformWithState v2 profiles match the batch recomputation") {
    val out = Files.createTempDirectory("graft-stream-v2out").toString
    val ckpt = Files.createTempDirectory("graft-stream-v2ck").toString
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    streaming.StateV2Profile.runProfiles(spark, srcDir, out, ckpt).awaitTermination(180000)
    // the helper must restore the session's provider conf itself (round-6
    // ADVICE): a later streaming query on this session — including the
    // other tests in this spec — must not silently inherit RocksDB
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass") === prevProvider,
      "runProfiles leaked the RocksDB provider into the session conf")
    // Update mode emits one profile per user per micro-batch touching the
    // user — the FINAL state per user is the row with the max n_events
    val emitted = spark.read.parquet(out)
    val finalRows = emitted
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("purchase_cents"),
          r.getAs[scala.collection.Seq[Long]]("recent_purchases").toList)).toMap
    // batch truth: per-user totals and the last ≤5 purchase cents by event id
    val byUser = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    assert(finalRows.keySet == byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val purchases = rows.filter(_.getAs[String]("event_type") == "purchase")
        .map(r => (r.getAs[Long]("event_id"), math.floor(r.getAs[Double]("value") * 100).toLong))
        .sortBy(_._1)
      val (n, cents, recent) = finalRows(u)
      assert(n == rows.length.toLong, s"n_events user $u")
      assert(cents == purchases.map(_._2).sum, s"cents user $u")
      // the capped recent list is the K largest event ids' cents in id
      // order — a pure function of the event SET (the processor keeps the
      // ordering key in state), so this holds under ANY file delivery
      // order or micro-batch slicing
      assert(recent == purchases.map(_._2).takeRight(streaming.StateV2Profile.RecentK).toList,
        s"recent list user $u")
    }
  }

  test("stream-stream interval join matches the batch join exactly") {
    val out = Files.createTempDirectory("graft-stream-ssj").toString
    val ckpt = Files.createTempDirectory("graft-stream-ssjck").toString
    EventsStream.runIntervalJoin(spark, srcDir, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("purchase_id", "view_id")
    val e = Tables.events(spark, sf)
    val batch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .join(
        e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts")),
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "view_id")
    // inner stream-stream join emits matches as they arrive; a full drain
    // must equal the batch answer on both sides
    assert(streamed.except(batch).isEmpty, "stream emitted a pair batch didn't")
    assert(batch.except(streamed).isEmpty, "stream missed a pair batch found")
    assert(streamed.count() > 0, "no pairs joined — nothing verified")
  }

  test("stream-stream LEFT OUTER interval join emits the null-padded rows too") {
    val out = Files.createTempDirectory("graft-stream-ssjo").toString
    val ckpt = Files.createTempDirectory("graft-stream-ssjock").toString
    EventsStream.runIntervalJoinOuter(spark, srcDir, out, ckpt).awaitTermination(180000)
    val streamed = spark.read.parquet(out).select("purchase_id", "view_id", "p_ts")
    val e = Tables.events(spark, sf)
    val batch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .join(
        e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts")),
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select("purchase_id", "view_id", "p_ts")
    // a null-padded row only emits once both watermarks pass its join
    // window; the final AvailableNow batch advances the watermark to
    // (max event time − 30 min delay), so purchases inside the last
    // (delay + 1 h window) of event time are STILL HELD when the drain
    // ends — correct streaming semantics, not loss. Equality therefore
    // holds on the watermark-closed region; on the tail the stream may
    // only emit matched rows (never fabricate).
    val maxTs = e.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val cutoff = new java.sql.Timestamp(maxTs - (90 * 60 * 1000L))
    assert(streamed.except(batch).isEmpty, "stream emitted a row batch didn't")
    val closedBatch = batch.filter(col("p_ts") <= cutoff)
    val closedStream = streamed.filter(col("p_ts") <= cutoff)
    assert(closedBatch.except(closedStream).isEmpty,
      "stream missed a closed-region row batch found")
    val nullRows = closedStream.filter(col("view_id").isNull).count()
    val batchNullRows = closedBatch.filter(col("view_id").isNull).count()
    assert(nullRows == batchNullRows && nullRows > 0,
      "no null-padded purchases — the outer semantics went unverified")
  }

  test("streaming windowed counts match the batch computation") {
    val out = Files.createTempDirectory("graft-stream-win").toString
    val ckpt = Files.createTempDirectory("graft-stream-winck").toString
    EventsStream.runWindowed(spark, srcDir, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("window_start", "event_type", "n_events")
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
    // append mode only emits windows the watermark closed; every emitted
    // window must match the batch answer exactly
    val mismatched = streamed.join(batch,
      Seq("window_start", "event_type"), "left_anti")
    assert(mismatched.isEmpty, "streamed window disagrees with batch")
    val joined = streamed.alias("s").join(batch.alias("b"), Seq("window_start", "event_type"))
      .filter(col("s.n_events") =!= col("b.n_events"))
    assert(joined.isEmpty)
    assert(streamed.count() > 0, "watermark closed no windows — nothing verified")
  }

  test("streaming enrichment scores exactly the pending set, idempotent on restart") {
    val silver = Files.createTempDirectory("graft-stream-silver").toString
    val out = Files.createTempDirectory("graft-stream-enr").toString
    val ckpt = Files.createTempDirectory("graft-stream-enrck").toString
    operators.Pipeline.silverBuild(spark, sf)
      .repartition(4).write.mode("overwrite").parquet(silver)
    streaming.EnrichStream.run(spark, silver, out, ckpt, ml.LexiconScorer)
      .awaitTermination(120000)
    val results = spark.read.parquet(out)
    val pendingCount = operators.Pipeline.pendingTexts(spark, sf).count()
    assert(results.count() === pendingCount, "scored set != pending set")
    assert(results.columns.sorted === Array("confidence", "record_id", "sentiment"))
    // streamed scores must equal the batch scorer's answer row for row
    val batchScored = ml.LexiconScorer.score(
      operators.Pipeline.pendingTexts(spark, sf)
        .select(col("id").cast("string").as("record_id"), col("text_column").as("text")))
      .select("record_id", "sentiment", "confidence")
    assert(results.except(batchScored).isEmpty, "stream scored differently than batch")
    // restart with the same checkpoint: the files are already committed —
    // the reference's crash-window double-processing cannot happen here
    streaming.EnrichStream.run(spark, silver, out, ckpt, ml.LexiconScorer)
      .awaitTermination(120000)
    assert(spark.read.parquet(out).count() === pendingCount, "restart re-scored rows")
  }

  test("streaming dedup: planted duplicate event_ids emit exactly once") {
    import org.apache.spark.sql.functions._
    // a landing dir where every event arrives TWICE (separate files, same
    // micro-batch neighborhood): the re-delivery shape of an at-least-once
    // upstream fetcher
    val dupSrc = java.nio.file.Files.createTempDirectory("graft-stream-dup").toString
    val events = Tables.events(spark, sf)
    events.repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(dupSrc)
    events.repartitionByRange(4, col("ts")).write.mode("append").parquet(dupSrc)
    val out = java.nio.file.Files.createTempDirectory("graft-stream-dupout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-dupck").toString
    EventsStream.run(spark, dupSrc, out, ckpt).awaitTermination(120000)
    val emitted = spark.read.parquet(out)
    val expected = events.count()
    assert(emitted.select("event_id").distinct().count() === expected,
      "every event must survive dedup")
    assert(emitted.count() === expected,
      "dropDuplicatesWithinWatermark must emit each planted duplicate once")
  }

  test("stream-static join: per-batch broadcast enrichment matches the batch join") {
    import spark.implicits._
    val dim = Tables.events(spark, sf).select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg"), col("user_id") % 3))
    val out = Files.createTempDirectory("graft-stream-dim").toString
    val ckpt = Files.createTempDirectory("graft-stream-dimck").toString
    EventsStream.runEnriched(spark, srcDir, dim, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = Tables.events(spark, sf).join(dim, Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("segment"), col("event_type"), col("value"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty, "stream enriched differently than batch")
    assert(streamed.filter(col("segment").isNull).count() === 0,
      "every event user must hit the dim")
  }

  test("windowed-agg gate: drained hourly windows equal the batch GROUP BY exactly") {
    val gate = EventsStream.windowedAggGate(spark, sf)
    val sampled = Tables.events(spark, sf).filter(col("user_id") % 10 === 0)
    val batch = sampled
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("total_cents"))
    assert(gate.except(batch).isEmpty, "gate emitted a window batch didn't")
    assert(batch.except(gate).isEmpty, "gate missed/partial-emitted a window")
    // the sentinel window (max real ts + 2 h) must be HELD, not emitted:
    // every payload window starts at or before the last real event
    val maxTs = sampled.agg(unix_timestamp(max(col("ts")))).head().getLong(0)
    assert(gate.agg(max(col("ws"))).head().getLong(0) <= maxTs,
      "sentinel window leaked into the payload")
  }

  test("session gate: drained session windows equal batch session_window exactly") {
    val gate = EventsStream.sessionGate(spark, sf)
    val batch = Tables.events(spark, sf).filter(col("user_id") % 10 === 0)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("session_s"), col("user_id"),
        col("n_events"))
    assert(gate.except(batch).isEmpty, "gate emitted a session batch didn't")
    assert(batch.except(gate).isEmpty, "gate split/merged/held a session")
    assert(gate.filter(col("user_id") < 0).isEmpty, "sentinel session leaked")
    assert(gate.filter(col("n_events") > 1).count() > 0,
      "no multi-event sessions — merge semantics went unverified")
  }

  test("dedup gate: at-least-once replay staging reduces to exactly-once rows") {
    val gate = EventsStream.dedupGate(spark, sf)
    val sampled = Tables.events(spark, sf).filter(col("user_id") % 10 === 0)
    // the replay stage re-delivered the %20 half; output must be the
    // ORIGINAL set exactly — nothing doubled, nothing dropped
    assert(gate.count() === sampled.count())
    assert(gate.select("event_id").distinct().count() === sampled.count(),
      "a replayed event survived both dedup paths")
    val batch = sampled.select(col("event_id"), col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("ts_s"),
      floor(col("value") * 100).cast("long").as("cents"))
    assert(gate.except(batch).isEmpty && batch.except(gate).isEmpty,
      "deduped stream differs from the events table")
    // the planted duplicates must actually exist in the staged source —
    // otherwise this test verifies nothing
    val staged = spark.read.parquet(EventsStream.stageEventsReplay(spark, sf))
    assert(staged.count() > sampled.count(),
      "replay stage planted no duplicates")
  }

  test("v2 profile gate: final drained state equals the batch recomputation") {
    val gate = streaming.StateV2Profile.profileGate(spark, sf)
    val e = Tables.events(spark, sf).filter(col("user_id") % 10 === 0)
    val counts = e.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      coalesce(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long"))), lit(0L)).as("purchase_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val recent = e.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= streaming.StateV2Profile.RecentK)
      .groupBy(col("user_id"))
      .agg(concat_ws(",", sort_array(collect_list(
        struct(col("event_id"), floor(col("value") * 100).cast("long").as("cents"))))
        .getField("cents")).as("recent"))
    val batch = counts.join(recent, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("purchase_cents"),
        coalesce(col("recent"), lit("")).as("recent"))
    assert(gate.except(batch).isEmpty && batch.except(gate).isEmpty,
      "drained v2 state differs from the batch recomputation")
    assert(gate.filter(col("user_id") < 0).isEmpty, "sentinel user leaked")
    assert(gate.count() === e.select("user_id").distinct().count(),
      "a user's final state is missing or duplicated")
  }

  test("upsert gate: versioned merge equals batch keep-latest; restart is idempotent") {
    val gate = streaming.UpsertStream.upsertGate(spark, sf)
    val e = Tables.events(spark, sf).filter(col("user_id") % 10 === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val batch = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    assert(gate.except(batch).isEmpty && batch.except(gate).isEmpty,
      "streaming upsert snapshot differs from batch keep-latest")
    assert(gate.count() === e.select("user_id").distinct().count())
    // restart with the same checkpoint: versions already exist, the drained
    // stream must not re-apply anything
    val src = streaming.EventsStream.stageEventsReplay(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-restart")
    val state = base.resolve("state").toString
    val ckpt = base.resolve("ckpt").toString
    streaming.UpsertStream.runUpsert(spark, src, state, ckpt).awaitTermination(120000)
    val versions = new java.io.File(state).listFiles().map(_.getName).sorted.toSeq
    val snap1 = spark.read.parquet(s"$state/${versions.last}").collect().toSet
    streaming.UpsertStream.runUpsert(spark, src, state, ckpt).awaitTermination(120000)
    val versionsAfter = new java.io.File(state).listFiles().map(_.getName).sorted.toSeq
    assert(versionsAfter === versions, "restart created new state versions")
    assert(spark.read.parquet(s"$state/${versionsAfter.last}").collect().toSet === snap1,
      "restart changed the final snapshot")
  }

  test("pipeline gate: replay-fed end-to-end stream equals the closed-form batch") {
    import spark.implicits._
    val gate = streaming.EnrichStream.replayPipelineGate(spark, sf)
    // exactly-once across the 10 micro-batch pages
    assert(gate.count() === 100)
    assert(gate.select("record_id").distinct().count() === 100)
    // batch truth: generate the identical feed and score it in one pass
    val feed = (0L until 100L).map(streaming.ReviewReplaySource.row)
      .toDF("review_id", "hotel_id", "languagecode", "average_score", "text")
    val batch = ml.LexiconScorer.score(
      feed.select(col("review_id").cast("string").as("record_id"), col("text")))
      .select(col("record_id"), col("sentiment"), col("confidence"))
    assert(gate.except(batch).isEmpty && batch.except(gate).isEmpty,
      "drained pipeline differs from the closed-form batch recomputation")
  }

  test("watermark drops late data: a row older than the watermark never lands") {
    import spark.implicits._
    def ev(id: Long, hour: Double, typ: String) =
      (id, new java.sql.Timestamp((hour * 3600 * 1000).toLong), id % 5, typ, 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val src = Files.createTempDirectory("graft-late-src").toString
    val out = Files.createTempDirectory("graft-late-out").toString
    val ckpt = Files.createTempDirectory("graft-late-ck").toString
    // run 1: windows [0,6) holds ids 1,2; max ts 12:00 commits watermark 11:30
    Seq(ev(1, 1.0, "click"), ev(2, 2.0, "click"), ev(3, 7.0, "click"), ev(4, 12.0, "click"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(src)
    EventsStream.runWindowed(spark, src, out, ckpt).awaitTermination(120000)
    // run 2: id 5 arrives at event-time 01:30 — BELOW the 11:30 watermark,
    // must be dropped; id 6 is fresh and advances the watermark
    Seq(ev(5, 1.5, "click"), ev(6, 18.2, "click"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(src)
    EventsStream.runWindowed(spark, src, out, ckpt).awaitTermination(120000)
    val w0 = spark.read.parquet(out)
      .filter(col("window_start") === lit(new java.sql.Timestamp(0L)))
      .select("n_events").as[Long].collect()
    assert(w0.length === 1, s"window [0,6) must emit exactly once, got ${w0.length}")
    assert(w0.head === 2L,
      s"late event leaked into the closed window: n_events=${w0.head}, expected 2")
  }
}
