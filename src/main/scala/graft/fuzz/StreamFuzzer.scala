package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import scala.util.Random

/** Seeded differential fuzzer for the STATEFUL half of the engine
  * (round-14 verdict #1: SqlFuzzer covers the relational core; the 14
  * hand-written streaming gates each pin ONE (window, watermark, slicing)
  * point — this generates random ones).
  *
  * Each plan picks a stateful shape — tumbling-window agg, sliding-window
  * agg, session windows, watermark dedup, the versioned-merge upsert,
  * stream-stream interval join (inner, or — round 17 — LEFT OUTER with its
  * eviction-coupled null-pad timing under a boundary-banded compare), the
  * transformWithState v2 `profile` kind, or (round 16) one of the two
  * CHAINED multi-stateful classes: interval join → windowed agg
  * (`join_agg`) and two-level windowed rollup (`rollup2`) — with randomized
  * window size,
  * slide, session gap, watermark delay, key cardinality, file slicing
  * (nFiles × maxFilesPerTrigger), sentinel presence, and late-row /
  * re-delivery injection. The chained kinds randomize BOTH stateful
  * stages (join bounds AND agg window; level-1 width AND level-2
  * multiple): cross-operator watermark propagation is where the round-15
  * smoke runs' two semantic catches lived, and the curated gates pin only
  * one parameter point each (q_stream_join_agg, q_stream_rollup).
  *
  * Chained emission rules the oracles encode (the q_stream_join_agg /
  * q_stream_rollup conventions, here generalized over the random
  * parameters): (a) an interval join's OUTPUT watermark lags its input
  * watermark by the condition's slack — for b.ts ∈ [a.ts − lo, a.ts + hi]
  * the join may still emit an a.ts as old as wm − hi (a future on-time b
  * can reach that far back) and a b.ts as old as wm − lo, so the
  * downstream agg's cutoff is windowEnd ≤ wm_final − max(lo, hi); (b) a
  * windowed agg hands its finalized windows downstream with NO extra lag
  * (window_time < the watermark that finalized them), so the level-2
  * cutoff is w2End ≤ wm_final, and w2 = w1 × mult keeps level-2
  * boundaries aligned with level-1's. The plan is drained as
  * a REAL Structured Streaming query (file source, checkpoint, AvailableNow)
  * on an isolated child session and compared row-for-row against a batch
  * recomputation that derives the same answer ARITHMETICALLY (epoch-micro
  * integer window math, gaps-and-islands sessions, keep-latest windows) —
  * not by re-running the same streaming operator. No DuckDB involved: the
  * agreement property under test is stream-vs-batch, Spark-vs-Spark.
  *
  * What a divergence would mean: a window emitted before it closed or
  * twice across micro-batches, late data admitted past the watermark (or
  * on-time data wrongly dropped), a session split/merged on the wrong gap
  * boundary, a dedup state row evicted early, or a replayed upsert batch
  * double-applied — exactly the failure modes the curated gates pin once
  * each, here exercised across randomized parameter space.
  *
  * Determinism: staged files carry strictly-ordered mtimes (the
  * twoLifetimeDrain tiering pattern — the file source ingests oldest-first,
  * so an mtime tie could reorder replay), file→batch assignment is then a
  * pure function of (nFiles, maxFilesPerTrigger), and the watermark at
  * every batch is a pure function of the data; so each plan's drained
  * output is reproducible from (seed, index).
  *
  * Late-row injection exercises the STRICT side of the watermark contract:
  * fabricated out-of-order rows (negative event ids, positive user ids)
  * are staged after every real range file with event times inside the
  * final watermark horizon (ts > max_ts − delay + slack) — data delayed by
  * LESS than the watermark delay, which Spark GUARANTEES to aggregate.
  * They arrive after newer data, so the stream must merge them into
  * already-open state (windows/sessions that have rows from earlier
  * batches); the batch oracle includes them, and a stream that dropped or
  * mis-merged them reds the compare.
  *
  * Deliberately NOT injected: rows delayed by MORE than the watermark.
  * The harness's first 12-plan smoke run caught that Spark's other
  * direction is only best-effort — the docs promise "data delayed more
  * than the watermark MAY OR MAY NOT be dropped", and Spark 4.1.2's
  * aggregation in fact ADMITS a too-late row whose window was already
  * evicted and re-emits it downstream as a spurious partial group.
  * That observed semantic is pinned (with a minimal repro) in
  * StreamFuzzSpec so a Spark behavior change surfaces; a differential
  * oracle cannot be written for behavior the engine itself leaves
  * unspecified.
  */
object StreamFuzzer {

  final case class StreamPlan(
    idx: Int,
    kind: String,        // tumbling | sliding | session | dedup | upsert | interval | join_agg | rollup2 | profile | interval_outer
    windowSec: Long,     // tumbling/sliding window width
    slideSec: Long,      // sliding only; divides windowSec
    gapSec: Long,        // session gap
    delaySec: Long,      // watermark delay
    keyMod: Int,         // key cardinality: user_id % keyMod
    nFiles: Int,         // time-range staging files
    mft: Int,            // maxFilesPerTrigger (≤ nFiles)
    sampleMod: Int,      // user sample: user_id % sampleMod == 0
    sentinel: Boolean,   // agg kinds: stage a far-future row to close all real windows
    late: Boolean,       // agg kinds: inject provably-late fabricated rows
    redeliveryMod: Int,  // dedup/upsert: re-deliver users % redeliveryMod == 0
    restart: Boolean,    // split staging across TWO query lifetimes on one checkpoint
    loSec: Long = 0L,    // interval/join_agg: b.ts >= a.ts − lo
    hiSec: Long = 0L,    // interval/join_agg: b.ts <= a.ts + hi
    w2Mult: Int = 2,     // rollup2: level-2 window = w2Mult × windowSec
    profileK: Int = 5,   // profile: newest-K ListState cap
    ttlSec: Long = 0L)   // profile: state TTL (0 = TTLConfig.NONE)

  /** Deterministic (seed, index) → plan (java.util.Random LCG is
    * JDK-specified, so plans are stable across hosts). */
  def plan(seed: Long, i: Int): StreamPlan = {
    val r = new Random(seed + 7000003L * i)
    val kind = r.nextInt(22) match {
      case x if x < 3  => "tumbling"
      case x if x < 5  => "sliding"
      case x if x < 6  => "session"
      case x if x < 8  => "dedup"
      case x if x < 9  => "upsert"
      case x if x < 11 => "interval"
      case x if x < 14 => "join_agg" // the chained classes get extra weight:
      case x if x < 16 => "rollup2"  // they subsume their single-op halves
      case x if x < 18 => "profile"  // transformWithState v2 (arbitrary state)
      case x if x < 20 => "interval_outer" // LEFT OUTER join: null-pad timing
      case _           => "v2_session" // v2 TIMER-driven sessionization
    }
    val div = 2 + r.nextInt(3) // sliding: window = div × slide
    val slideMin = 5 + r.nextInt(56)
    val windowMin = kind match {
      case "sliding" => div * slideMin
      case _         => 10 + r.nextInt(351)
    }
    val nFiles = 2 + r.nextInt(4)
    StreamPlan(
      idx = i,
      kind = kind,
      windowSec = windowMin * 60L,
      slideSec = slideMin * 60L,
      gapSec = (5 + r.nextInt(116)) * 60L,
      delaySec = (5 + r.nextInt(86)) * 60L,
      keyMod = (if (kind == "interval" || kind == "join_agg" ||
        kind == "interval_outer") 8 else 2) + r.nextInt(49),
      nFiles = nFiles,
      mft = 1 + r.nextInt(math.min(3, nFiles)),
      sampleMod = 1 + r.nextInt(3),
      sentinel = r.nextBoolean(),
      late = r.nextInt(3) != 0,
      redeliveryMod = 2 + r.nextInt(4),
      // a third of plans restart mid-stream: lifetime 1 drains the
      // chronologically first half, lifetime 2 resumes the SAME checkpoint
      // with the rest — randomized checkpoint recovery across every
      // stateful shape (the hand-written recovery gates pin two points of
      // this space; CrashMatrixSpec pins the crash window; this sweeps it)
      restart = r.nextInt(3) == 0,
      // interval join: bounds kept minutes-scale so the per-key time band
      // (hence the pair count AND the join state size) stays bounded at
      // any SF; keyMod for this kind starts at 8 (above) for the same reason
      loSec = r.nextInt(16) * 60L,
      hiSec = (1 + r.nextInt(30)) * 60L,
      // level-2 window is an exact multiple of level-1 (epoch-aligned
      // windows ⇒ every w1 boundary lands on a w2 boundary, so the oracle's
      // bucket math is integer division — the curated gate's hour→day shape
      // generalized)
      w2Mult = 2 + r.nextInt(5),
      // profile kind: random newest-K cap for the v2 ListState (1 hits the
      // degenerate single-slot case; the gate's constant is 5)
      profileK = 1 + r.nextInt(7),
      // state TTL (round-18 verdict #4): half the profile plans run with a
      // processing-time TTL on BOTH column families. Hours-scale by
      // construction — a seconds-scale drain can never legally expire
      // anything, so the batch oracle is unchanged and the plan stays
      // deterministic; that the TTL machinery ACTUALLY expires when told to
      // is proven by StreamFuzzSpec's ttl≈0 red-path control, not here.
      // Drawn LAST so every earlier field of every committed plan is
      // unchanged under the old seeds.
      ttlSec = if (r.nextBoolean()) (1L + r.nextInt(24)) * 3600L else 0L)
  }

  def plans(seed: Long, count: Int): Seq[StreamPlan] =
    (0 until count).map(plan(seed, _))

  final case class Result(idx: Int, kind: String, ok: Boolean,
                          streamRows: Long, oracleRows: Long,
                          lateInjected: Long, detail: String)

  private val srcSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Execute one plan end-to-end; `oracleDelayOverrideSec` deliberately
    * mis-states the oracle's watermark delay — the red-path control
    * (StreamFuzzSpec) uses it to prove the compare actually reds when
    * stream and oracle disagree, so an all-green run is evidence, not
    * vacuity. */
  def run(spark: SparkSession, d: String, p: StreamPlan,
          oracleDelayOverrideSec: Option[Long] = None,
          shufflePartitions: Int = 2,
          profileTtlOverrideMs: Option[Long] = None): Result = {
    val iso = spark.newSession()
    // shufflePartitions is a differential axis of its own: a stateful query
    // FIXES its state-store partition count at first checkpoint, so results
    // must be identical at any setting (StreamFuzzSpec re-drains plans at
    // 1 and 3 and requires agreement — state keyed on the wrong hash, or a
    // merge that only works single-partition, diverges here)
    iso.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    val base = java.nio.file.Files.createTempDirectory(f"graft-sfuzz-${p.idx}%04d-")
    val srcDir = base.resolve("src").toString
    val outDir = base.resolve("out").toString
    val ckptDir = base.resolve("ckpt").toString
    try {
      val ev = graft.Tables.events(iso, d)
        .filter(col("user_id") % p.sampleMod === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

      val mm = ev.agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx")).head()
      val (mnUs, mxUs) = (mm.getLong(0), mm.getLong(1))

      // ---- staging machinery: strictly-ordered mtimes per tier ----------
      var secondHalf: Option[DataFrame] = None
      def pfiles() = new java.io.File(srcDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSet
      var fileSeq = 0L
      var mtimeBase = 0L
      def orderTier(files: Set[java.io.File]): Unit = {
        if (files.isEmpty) return
        if (mtimeBase == 0L)
          mtimeBase = (files.map(_.lastModified()).max / 2000L + 2L) * 2000L
        files.toSeq.sortBy(_.getName).foreach { f =>
          val t = mtimeBase + fileSeq * 2000L
          require(f.setLastModified(t) && f.lastModified() == t,
            s"staged-file mtime did not round-trip for ${f.getName}")
          fileSeq += 1
        }
      }

      // ---- stage phase 1: range files (or the first half under restart) -
      if (p.restart) {
        val cutUs = mnUs + (mxUs - mnUs) / 2
        ev.filter(unix_micros(col("ts")) < cutUs)
          .repartitionByRange(math.max(1, p.nFiles / 2), col("ts"))
          .write.mode("overwrite").parquet(srcDir)
        orderTier(pfiles())
        // the second half stages AFTER lifetime 1 drains (below)
        secondHalf = Some(ev.filter(unix_micros(col("ts")) >= cutUs))
      } else {
        ev.repartitionByRange(p.nFiles, col("ts")).write.mode("overwrite").parquet(srcDir)
        orderTier(pfiles())
      }

      val horizonSec = p.kind match {
        case "session" | "v2_session" => p.gapSec
        case "rollup2"  => p.windowSec * p.w2Mult // a real LEVEL-2 window must close
        // the chained agg's cutoff lags by the join slack, so the sentinel
        // must clear window + slack for every real window to emit
        case "join_agg" => p.windowSec + math.max(p.loSec, p.hiSec)
        // null-pad cutoff is wm − hi, so the sentinel must clear hi for
        // every real unmatched a-row to pad
        case "interval_outer" => p.hiSec
        case _          => p.windowSec
      }
      // v2_session counts as an agg kind for staging purposes: sentinel
      // (closes every real session so the TIMERS must fire) and late
      // injection (an in-horizon row merges into an OPEN buffered session —
      // an emitted session can never be extended, because every injected ts
      // exceeds the pre-sentinel watermark and an emitted close is ≤ it)
      val isAgg = p.kind == "tumbling" || p.kind == "sliding" ||
        p.kind == "session" || p.kind == "v2_session"
      val isJoin = p.kind == "interval"
      val isChained = p.kind == "join_agg" || p.kind == "rollup2"
      val isOuter = p.kind == "interval_outer"

      // ---- the streaming side: one starter per kind ----------------------
      val delayStr = s"${p.delaySec} seconds"
      val stateDir = base.resolve("state").toString
      def readSrc: DataFrame = iso.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", p.mft).parquet(srcDir)
      val keyExpr = (col("user_id") % p.keyMod).as("k")
      val centsExpr = floor(col("value") * 100).cast("long")

      def startFileSink(df: DataFrame) =
        df.writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
          .option("checkpointLocation", ckptDir)
          .format("parquet").option("path", outDir).start()

      def startKind() = p.kind match {
        case "tumbling" =>
          startFileSink(readSrc.withWatermark("ts", delayStr)
            .groupBy(window(col("ts"), s"${p.windowSec} seconds").as("w"), keyExpr)
            .agg(count(lit(1)).as("n"), sum(centsExpr).as("cents"))
            .select(unix_micros(col("w.start")).as("ws"), col("k"), col("n"), col("cents")))
        case "sliding" =>
          startFileSink(readSrc.withWatermark("ts", delayStr)
            .groupBy(window(col("ts"), s"${p.windowSec} seconds", s"${p.slideSec} seconds").as("w"), keyExpr)
            .agg(count(lit(1)).as("n"), sum(centsExpr).as("cents"))
            .select(unix_micros(col("w.start")).as("ws"), col("k"), col("n"), col("cents")))
        case "session" =>
          // NO payload filter on the key: a deterministic predicate on the
          // grouping key gets pushed below the aggregation AND the
          // watermark node, so a `k >= 0` guard silently removes the
          // sentinel row BEFORE EventTimeWatermarkExec — the watermark
          // never advances, the no-data flush batch never runs, and every
          // session ending inside the final delay window stays held (the
          // harness's second catch: plan 4 of seed 909015, 3 tail sessions
          // missing). The sentinel needs no filter anyway: its session end
          // is past the final watermark by construction, so it is held,
          // never emitted.
          startFileSink(readSrc.withWatermark("ts", delayStr)
            .groupBy(session_window(col("ts"), s"${p.gapSec} seconds").as("w"), keyExpr)
            .agg(count(lit(1)).as("n"), sum(centsExpr).as("cents"))
            .select(unix_micros(col("w.start")).as("ws"), col("k"), col("n"), col("cents")))
        case "dedup" =>
          startFileSink(readSrc.withWatermark("ts", delayStr)
            .dropDuplicatesWithinWatermark(Seq("event_id"))
            .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("es"), centsExpr.as("cents")))
        case "upsert" =>
          graft.streaming.UpsertStream.runUpsert(iso, srcDir, stateDir, ckptDir)
        case "interval" =>
          // stream-stream inner join — the third state class (join state;
          // the agg kinds exercise HDFSBackedStateStore aggregation state,
          // dedup/upsert exercise dedup state and the hand-versioned sink).
          // Sides split on event-id parity via PMOD (Java % is negative for
          // the injected late rows' negative ids — pmod keeps the split
          // total); each side filters BEFORE its watermark is assigned (the
          // documented push-below-EventTimeWatermarkExec trap). Inner join
          // output is emitted on match, not on watermark expiry, so no
          // sentinel is needed; the watermark bounds join STATE, and the
          // strict side of the contract guarantees the injected in-horizon
          // rows still find their partners in state (partner b qualifies
          // only if b_ts ≥ late_ts − hi > wm − hi, which is exactly the
          // eviction bound wm − hi — never yet evicted).
          val a = readSrc.filter(pmod(col("event_id"), lit(2)) === 0)
            .select(col("event_id").as("a_id"), col("ts").as("a_ts"),
              (col("user_id") % p.keyMod).as("a_k"))
            .withWatermark("a_ts", delayStr)
          val b = readSrc.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id").as("b_id"), col("ts").as("b_ts"),
              (col("user_id") % p.keyMod).as("b_k"))
            .withWatermark("b_ts", delayStr)
          startFileSink(a.join(b, expr(
            s"a_k = b_k AND b_ts >= a_ts - INTERVAL ${p.loSec} SECONDS " +
              s"AND b_ts <= a_ts + INTERVAL ${p.hiSec} SECONDS"))
            .select(col("a_id"), col("b_id"), col("a_k").as("k"),
              unix_micros(col("a_ts")).as("a_es"), unix_micros(col("b_ts")).as("b_es")))
        case "interval_outer" =>
          // LEFT OUTER stream-stream interval join — the null-pad timing rule
          // (round-16 verdict #3: the inner `interval` kind is green over
          // hundreds of plans, but the padded-row emission semantics — a
          // padded row may only emit once the watermark passes the join
          // bound, and never both padded and matched — were pinned at
          // exactly one curated parameter point, q_stream_interval_join).
          // Same parity split as the inner kind; matched rows emit on match,
          // an unmatched a-row emits null-padded only once wm > a_ts + hi
          // (no on-time b can reach it: a future b has b_ts ≥ wm and needs
          // b_ts ≤ a_ts + hi). The oracle encodes that cutoff with a ±5 ms
          // ambiguity band (watermark tracking is ms-granular and the state
          // eviction bound carries a documented ±1 ms adjustment).
          val a = readSrc.filter(pmod(col("event_id"), lit(2)) === 0)
            .select(col("event_id").as("a_id"), col("ts").as("a_ts"),
              (col("user_id") % p.keyMod).as("a_k"))
            .withWatermark("a_ts", delayStr)
          val b = readSrc.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id").as("b_id"), col("ts").as("b_ts"),
              (col("user_id") % p.keyMod).as("b_k"))
            .withWatermark("b_ts", delayStr)
          startFileSink(a.join(b, expr(
            s"a_k = b_k AND b_ts >= a_ts - INTERVAL ${p.loSec} SECONDS " +
              s"AND b_ts <= a_ts + INTERVAL ${p.hiSec} SECONDS"), "left_outer")
            .select(col("a_id"), col("b_id"), col("a_k").as("k"),
              unix_micros(col("a_ts")).as("a_es"), unix_micros(col("b_ts")).as("b_es")))
        case "join_agg" =>
          // CHAINED join→agg (two stateful operators, join state feeding
          // aggregation state): the q_stream_join_agg class with BOTH
          // stages randomized — join bounds (lo, hi) AND the downstream
          // window on a_ts. Emission depends on the join's OUTPUT
          // watermark (input wm − max(lo, hi) — see the scaladoc), the
          // propagation rule the curated gate pins at one (1 h, 0) point.
          val a = readSrc.filter(pmod(col("event_id"), lit(2)) === 0)
            .select(col("event_id").as("a_id"), col("ts").as("a_ts"),
              (col("user_id") % p.keyMod).as("a_k"))
            .withWatermark("a_ts", delayStr)
          val b = readSrc.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id").as("b_id"), col("ts").as("b_ts"),
              (col("user_id") % p.keyMod).as("b_k"))
            .withWatermark("b_ts", delayStr)
          startFileSink(a.join(b, expr(
            s"a_k = b_k AND b_ts >= a_ts - INTERVAL ${p.loSec} SECONDS " +
              s"AND b_ts <= a_ts + INTERVAL ${p.hiSec} SECONDS"))
            .groupBy(window(col("a_ts"), s"${p.windowSec} seconds").as("w"), col("a_k"))
            .agg(count(lit(1)).as("n"), sum(col("b_id")).as("b_checksum"))
            .select(unix_micros(col("w.start")).as("ws"), col("a_k").as("k"),
              col("n"), col("b_checksum")))
        case "rollup2" =>
          // CHAINED agg→agg (two-level rollup): level-1 windows of
          // windowSec finalize under the watermark and feed — via
          // window_time, the finalized window's event time — level-2
          // windows of w2Mult × windowSec. The q_stream_rollup class with
          // both widths randomized; the handoff under test is that level 2
          // may only finalize once every level-1 window inside it has
          // itself been finalized and handed down.
          val w2 = p.windowSec * p.w2Mult
          startFileSink(readSrc.withWatermark("ts", delayStr)
            .groupBy(window(col("ts"), s"${p.windowSec} seconds").as("w"), keyExpr)
            .agg(count(lit(1)).as("n1"), sum(centsExpr).as("c1"))
            .groupBy(window(window_time(col("w")), s"$w2 seconds").as("d"), col("k"))
            .agg(sum(col("n1")).as("n"), count(lit(1)).as("n_w1"), sum(col("c1")).as("cents"))
            .select(unix_micros(col("d.start")).as("ws"), col("k"),
              col("n"), col("n_w1"), col("cents")))
        case "v2_session" =>
          // transformWithState v2 with EVENT-TIME TIMERS (round-17 verdict
          // #4): timer-driven sessionization — randomized gap, watermark
          // delay, key cardinality, slicing, sentinel, late injection and
          // restart — against the SAME gaps-and-islands batch oracle as the
          // built-in session_window kind. Every emission here is a timer
          // callback, so a timer lost across restart, never fired, fired
          // early, or double-fired diverges exactly where a session_window
          // bug would.
          import iso.implicits._
          iso.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          startFileSink(readSrc
            .select(col("event_id"), col("ts"),
              (col("user_id") % p.keyMod).as("user_id"),
              floor(col("value") * 100).cast("long").as("cents"))
            .withWatermark("ts", delayStr)
            .as[graft.streaming.StateV2Sessions.SEv]
            .groupByKey(_.user_id)
            .transformWithState(
              new graft.streaming.StateV2Sessions.SessionTimerProcessor(p.gapSec),
              org.apache.spark.sql.streaming.TimeMode.EventTime(),
              org.apache.spark.sql.streaming.OutputMode.Append())
            .select(col("ws"), col("user_id").as("k"),
              col("n_events").as("n"), col("cents")))
        case "profile" =>
          // transformWithState v2 (arbitrary keyed state: ValueState counter
          // + newest-K ListState, RocksDB provider) — randomized key
          // cardinality, list cap, slicing and restart. Update-mode output
          // goes through a foreachBatch APPEND sink: a clean restart
          // resumes from committed offsets (no replay), so append is
          // duplicate-free — the same argument the dedup/upsert kinds rely
          // on. The key mod folds INTO user_id so the oracle is a pure
          // function of the moded event set.
          import iso.implicits._
          iso.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          // TTL (plan-randomized hours, or the red-path ms override): a TTL'd
          // family requires TimeMode.ProcessingTime — Spark rejects it under
          // TimeMode.None — so the mode switches with the config. No timers
          // are registered either way; handleInputRows semantics are
          // identical, which is exactly why the hours-TTL plans share the
          // no-TTL oracle.
          val ttl = profileTtlOverrideMs.map(java.time.Duration.ofMillis)
            .orElse(if (p.ttlSec > 0) Some(java.time.Duration.ofSeconds(p.ttlSec)) else None)
          val timeMode =
            if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
            else org.apache.spark.sql.streaming.TimeMode.None()
          readSrc
            .select(col("event_id"), (col("user_id") % p.keyMod).as("user_id"),
              col("event_type"), col("value"))
            .as[graft.streaming.StateV2Profile.Ev]
            .groupByKey(_.user_id)
            .transformWithState(
              new graft.streaming.StateV2Profile.ProfileProcessor(p.profileK, ttl),
              timeMode,
              org.apache.spark.sql.streaming.OutputMode.Update())
            .writeStream.trigger(Trigger.AvailableNow())
            .outputMode("update")
            .option("checkpointLocation", ckptDir)
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[graft.streaming.StateV2Profile.Profile], _: Long) =>
                b.write.mode("append").parquet(outDir)
            }
            .start()
      }

      // TTL'd profile drains cannot awaitTermination (measured, Spark
      // 4.1.2): a transformWithState operator in TimeMode.ProcessingTime
      // reports shouldRunAnotherBatch=true on every batch — the mode exists
      // to let processing-time timers/TTL fire later — so even
      // Trigger.AvailableNow keeps scheduling no-data batches forever
      // (observed 5000+, at ~10/s; processAllAvailable also proved unsafe —
      // a run left in that loop eventually wedged inside a no-data batch's
      // checkpoint write). The termination rule used instead: poll
      // lastProgress and STOP at the first committed no-data batch.
      // AvailableNow plans every staged file up front and each batch drains
      // available files before going empty, so an observed numInputRows == 0
      // progress entry proves all data batches committed; empty batches
      // touch no keys (handleInputRows is the only emission path), and the
      // one in-flight when stop() lands leaves only an uncommitted
      // _temporary dir the parquet reader never sees — the stopped query's
      // sink is exactly what awaitTermination would have collected if the
      // mode let it return.
      val ttlDrain = p.kind == "profile" &&
        (profileTtlOverrideMs.isDefined || p.ttlSec > 0)
      // The stop rule additionally requires a DATA batch in THIS lifetime
      // before an empty batch counts as caught-up (caught by the r18 regen,
      // 2/120 restart+TTL plans on seed 16077016): stopping lifetime 1 can
      // land after an empty batch's offsets are written but before its
      // commit, so lifetime 2 REPLAYS that empty batch first — its first
      // completed progress has numInputRows == 0 while the second half of
      // the staged files is still unread, and a naive first-empty stop
      // truncates the drain (counters froze at first-half totals). Every
      // fuzz lifetime stages at least one file, so data-then-empty is
      // always reachable.
      def drainTtl(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
        val deadline = System.nanoTime() + 180L * 1000000000L
        var caughtUp = false
        while (!caughtUp && q.isActive && System.nanoTime() < deadline) {
          Thread.sleep(100)
          val rp = q.recentProgress
          val lastData = rp.lastIndexWhere(_.numInputRows > 0)
          caughtUp = lastData >= 0 && rp.indexWhere(_.numInputRows == 0, lastData + 1) > lastData
        }
        q.exception.foreach(throw _)
        require(caughtUp, s"TTL'd profile drain never reached data-then-empty in 180 s")
      }
      def drainKind(): String = {
        val q = startKind()
        try { if (ttlDrain) drainTtl(q) else q.awaitTermination() }
        finally q.stop()
        if (sys.env.contains("GRAFT_SFUZZ_DEBUG")) {
          new java.io.File(srcDir).listFiles().filter(_.getName.endsWith(".parquet"))
            .sortBy(_.lastModified()).foreach(f =>
              System.err.println(s"[sfuzz-dbg] file ${f.getName} mtime=${f.lastModified()}"))
          q.recentProgress.foreach { pr =>
            val st = Option(pr.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(-1L)
            System.err.println(s"[sfuzz-dbg] batch ${pr.batchId} rows=${pr.numInputRows} " +
              s"wm=${pr.eventTime.get("watermark")} state=$st")
          }
        }
        q.runId.toString
      }

      // ---- restart axis: lifetime 1 drains the first half, stops with
      // tail state open; the second half (and every injection) arrives for
      // lifetime 2 on the SAME checkpoint — lost state, re-read files, or
      // double emission across the restart reds the final compare
      var runId1: Option[String] = None
      secondHalf.foreach { rest =>
        runId1 = Some(drainKind())
        val prev = pfiles()
        rest.repartitionByRange(math.max(1, p.nFiles - p.nFiles / 2), col("ts"))
          .write.mode("append").parquet(srcDir)
        orderTier(pfiles() -- prev)
      }

      // ---- out-of-order injection (agg kinds): within the horizon -------
      // ts ∈ (mx − delay, mx): delayed LESS than the watermark delay — the
      // strict side of the guarantee, which the stream MUST aggregate. The
      // rows arrive after every real file, so they must merge into
      // already-open state; the oracle includes them (user_id ≥ 0).
      // Skipped when the delay leaves no room (recorded as lateInjected=0).
      // (interval_outer deliberately excluded: a late-arriving a-row whose
      // pad window already closed at arrival — wm > a_ts + hi before the row
      // is even admitted — has UNSPECIFIED pad-emission timing; the strict
      // guarantee covers aggregation/admission, not the outer join's
      // eviction-coupled null emission. The inner kind keeps the injection.
      // Spark 4.1.2's OBSERVED behavior — admitted, then null-padded exactly
      // once on the next eviction pass — is pinned in StreamFuzzSpec
      // ("admitted past its own pad cutoff"), so an upstream change surfaces
      // as a spec diff rather than a silently-stale exclusion rationale.)
      var lateInjected = 0L
      if ((isAgg || isJoin || isChained) && p.late && p.delaySec >= 420) {
        val prev = pfiles()
        iso.range(5).select(
          (lit(-100L) - col("id")).as("event_id"),
          timestamp_micros(lit(mxUs - p.delaySec * 1000000L) +
            (col("id") + 1) * 60000000L).as("ts"),
          (col("id") * p.sampleMod).as("user_id"),
          lit("view").as("event_type"),
          (col("id") + lit(1.0)).cast("double").as("value"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        orderTier(pfiles() -- prev)
        lateInjected = 5L
      }

      // ---- sentinel (agg + chained kinds): closes every real window -----
      // join_agg needs a sentinel PAIR: each join side filters by event-id
      // parity before its watermark is assigned, so a single row would
      // advance only ONE side's watermark and the propagated minimum would
      // stay at the real data's tail. Ids −1 (pmod 1 → b side) and −2
      // (pmod 0 → a side) at the same instant and the same key match each
      // other (Δts = 0 ∈ [−lo, hi]); the matched pair lands in an agg
      // window ending past the final cutoff, so it is held, never emitted
      // — and the oracle excludes user −999 anyway.
      // interval_outer gets the same sentinel PAIR as join_agg (both sides'
      // watermarks must advance for the null-pad flush): with a sentinel the
      // cutoff clears every real a-row (everything pads — the full-left-join
      // regime the curated gate pins); without one the cutoff lands
      // mid-range and exercises the held tail. The matched sentinel pair
      // itself emits but is filtered by a_id ≥ 0 below.
      if ((isAgg || isChained || isOuter) && p.sentinel) {
        val prev = pfiles()
        val sentUs = mxUs + (p.delaySec + horizonSec + 7200L) * 1000000L
        val nSent = if (p.kind == "join_agg" || isOuter) 2 else 1
        iso.range(nSent).select(
          (lit(-1L) - col("id")).as("event_id"),
          timestamp_micros(lit(sentUs)).as("ts"),
          lit(-999L).as("user_id"),
          lit("view").as("event_type"),
          lit(0.0).as("value"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        orderTier(pfiles() -- prev)
      }

      // ---- re-delivery (dedup/upsert ONLY): the at-least-once transport.
      // NOT for the interval join or the chained kinds (a re-delivered OLD
      // row arrives delayed by more than the watermark — unspecified for
      // join input admission, and double-counted by an agg), and NOT for
      // the v2 profile kind (its running counters assume the file source's
      // exactly-once admission — the documented contract; keep-latest and
      // dedup state are the kinds built to absorb duplicates)
      if (p.kind == "dedup" || p.kind == "upsert") {
        val prev = pfiles()
        ev.filter(col("user_id") % p.redeliveryMod === 0)
          .coalesce(1).write.mode("append").parquet(srcDir)
        orderTier(pfiles() -- prev)
      }

      // ---- final drain (lifetime 2 under restart; the only one otherwise)
      val runId2 = drainKind()
      runId1.foreach(r1 => require(r1 != runId2,
        "restart plan must run two distinct query lifetimes"))

      // final watermark over the fully staged source (sentinel included):
      // what the stream's event-time clock ends at. Two engine-fidelity
      // rules: (a) watermark tracking is MS-granular (EventTimeWatermarkExec
      // accumulates max event time in millis), so the staged max floors to
      // the millisecond; (b) the join kinds split the source by event-id
      // parity and EACH side's watermark node tracks only ITS OWN input's
      // max — the query watermark is the min over nodes, and at low SF the
      // two parities' tails can sit minutes-to-an-hour apart (caught live:
      // the first interval_outer smoke run padded rows the engine correctly
      // held because the a-side's own tail, not the global max, set the
      // clock). A side with no rows at all leaves its node at the epoch —
      // the watermark never advances and no cutoff-gated row may emit.
      val oracleDelaySec = oracleDelayOverrideSec.getOrElse(p.delaySec)
      val isParitySplit = isJoin || isOuter || p.kind == "join_agg"
      val stagedMaxUs: Long = {
        val staged = iso.read.parquet(srcDir)
        if (isParitySplit) {
          val sides = staged.groupBy(pmod(col("event_id"), lit(2)).as("side"))
            .agg(max(unix_micros(col("ts"))).as("mx")).collect()
          if (sides.length < 2) Long.MinValue / 4 else sides.map(_.getLong(1)).min
        } else staged.agg(max(unix_micros(col("ts")))).head().getLong(0)
      }
      val wmFinalUs =
        if (stagedMaxUs == Long.MinValue / 4) Long.MinValue / 4
        else (stagedMaxUs / 1000L) * 1000L - oracleDelaySec * 1000000L

      // batch side: everything the stream is REQUIRED to aggregate — real
      // rows plus the in-horizon out-of-order rows (negative event ids,
      // user ids ≥ 0); only the sentinel (user −999) is excluded.
      // Re-delivered rows are exact duplicates, collapsed per kind.
      val real = iso.read.parquet(srcDir).filter(col("user_id") >= 0)
      val wUs = p.windowSec * 1000000L
      val sUs = p.slideSec * 1000000L
      val gUs = p.gapSec * 1000000L

      val (streamDf, oracleDf): (DataFrame, DataFrame) = p.kind match {
        case "tumbling" =>
          val o = real
            .select(unix_micros(col("ts")).as("es"), keyExpr, centsExpr.as("c"))
            .withColumn("ws", col("es") - pmod(col("es"), lit(wUs)))
            .groupBy("ws", "k").agg(count(lit(1)).as("n"), sum("c").as("cents"))
            .filter(col("ws") + wUs <= wmFinalUs)
          (iso.read.parquet(outDir), o)

        case "sliding" =>
          // epoch-aligned slide starts covering es: multiples of S in
          // (es − W, es] — exactly W/S windows per row
          val nWin = (p.windowSec / p.slideSec).toInt
          val o = real
            .select(unix_micros(col("ts")).as("es"), keyExpr, centsExpr.as("c"))
            .withColumn("smax", col("es") - pmod(col("es"), lit(sUs)))
            .withColumn("ws", explode(sequence(
              col("smax") - lit((nWin - 1).toLong * sUs), col("smax"), lit(sUs))))
            .groupBy("ws", "k").agg(count(lit(1)).as("n"), sum("c").as("cents"))
            .filter(col("ws") + wUs <= wmFinalUs)
          (iso.read.parquet(outDir), o)

        case "session" | "v2_session" =>
          // gaps-and-islands: new session iff ts − prev ≥ gap (session
          // intervals [ts, ts+gap) merge on OVERLAP, so an event exactly
          // gap-after starts a new session). The SAME truth serves both the
          // built-in session_window kind and the v2 timer kind — the two
          // engines' emissions must coincide row-for-row.
          val ow = Window.partitionBy("k").orderBy("es", "event_id")
          val o = real
            .select(col("event_id"), unix_micros(col("ts")).as("es"), keyExpr, centsExpr.as("c"))
            .withColumn("brk",
              when(col("es") - lag("es", 1).over(ow) >= gUs, 1L).otherwise(0L))
            .withColumn("sid", sum("brk").over(
              ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .groupBy("k", "sid")
            .agg(min("es").as("ws"), max("es").as("le"),
              count(lit(1)).as("n"), sum("c").as("cents"))
            .filter(col("le") + gUs <= wmFinalUs)
            .select(col("ws"), col("k"), col("n"), col("cents"))
          (iso.read.parquet(outDir), o)

        case "dedup" =>
          val o = real
            .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("es"), centsExpr.as("cents"))
            .distinct()
          (iso.read.parquet(outDir), o)

        case "interval" =>
          // batch recomputation: the same parity split + banded theta join
          // in integer microsecond space. Inner join drops nothing at the
          // output for on-time + in-horizon data, so the oracle is the FULL
          // join — no watermark filter on the result (unlike the agg kinds,
          // where only closed windows emit).
          val loUs = p.loSec * 1000000L
          val hiUs = p.hiSec * 1000000L
          val aSide = real.filter(pmod(col("event_id"), lit(2)) === 0)
            .select(col("event_id").as("a_id"), unix_micros(col("ts")).as("a_es"),
              (col("user_id") % p.keyMod).as("k"))
          val bSide = real.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id").as("b_id"), unix_micros(col("ts")).as("b_es"),
              (col("user_id") % p.keyMod).as("bk"))
          val o = aSide.join(bSide, col("k") === col("bk") &&
              col("b_es") >= col("a_es") - loUs && col("b_es") <= col("a_es") + hiUs)
            .select(col("a_id"), col("b_id"), col("k"), col("a_es"), col("b_es"))
          // explicit schema: a zero-match drain leaves only _spark_metadata
          // in outDir, which schema inference cannot read
          val outSchema = StructType(Seq(
            StructField("a_id", LongType), StructField("b_id", LongType),
            StructField("k", LongType), StructField("a_es", LongType),
            StructField("b_es", LongType)))
          (iso.read.schema(outSchema).parquet(outDir), o)

        case "interval_outer" =>
          // matched truth = the full banded join (matched rows emit on
          // match, exactly the inner oracle); padded truth = every UNMATCHED
          // a-row whose pad cutoff strictly cleared the final watermark
          // (a_es + hi ≤ wm − margin). Rows whose cutoff lands inside the
          // ±margin band are fp/ms-ambiguous (watermark tracking is
          // ms-granular; the eviction bound carries a ±1 ms adjustment) and
          // are allowed either way: they are removed from the ENGINE side
          // below — but only when genuinely unmatched, so a row that is both
          // padded AND matched still reds the compare — and excluded from
          // the oracle's padded set. Everything else is exact: a padded row
          // past the cutoff missing → oracle-extra; a held row emitted
          // early, a pad for a matched a-row, or a duplicate pad →
          // engine-extra.
          val loUs = p.loSec * 1000000L
          val hiUs = p.hiSec * 1000000L
          val marginUs = 5000L
          val aSide = real.filter(pmod(col("event_id"), lit(2)) === 0)
            .select(col("event_id").as("a_id"), unix_micros(col("ts")).as("a_es"),
              (col("user_id") % p.keyMod).as("k"))
          val bSide = real.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id").as("b_id"), unix_micros(col("ts")).as("b_es"),
              (col("user_id") % p.keyMod).as("bk"))
          val cond = col("k") === col("bk") &&
            col("b_es") >= col("a_es") - loUs && col("b_es") <= col("a_es") + hiUs
          val matched = aSide.join(bSide, cond)
            .select(col("a_id"), col("b_id"), col("k"), col("a_es"), col("b_es"))
          val unmatched = aSide.join(bSide, cond, "left_anti")
          val padded = unmatched
            .filter(col("a_es") + hiUs <= wmFinalUs - marginUs)
            .select(col("a_id"), lit(null).cast("long").as("b_id"), col("k"),
              col("a_es"), lit(null).cast("long").as("b_es"))
          val o = matched.unionByName(padded)
          val outSchema = StructType(Seq(
            StructField("a_id", LongType), StructField("b_id", LongType),
            StructField("k", LongType), StructField("a_es", LongType),
            StructField("b_es", LongType)))
          // a_id ≥ 0 drops the matched sentinel pair (ids −1/−2)
          val engAll = iso.read.schema(outSchema).parquet(outDir)
            .filter(col("a_id") >= 0)
          val inBand = col("a_es") + hiUs > wmFinalUs - marginUs &&
            col("a_es") + hiUs < wmFinalUs + marginUs
          // band removal is AT MOST ONE pad row per in-band a_id (round-18
          // ADVICE: the earlier left_anti removed ALL of an a_id's pad rows,
          // so a DUPLICATE pad whose cutoff landed inside the band was
          // silently tolerated). Pads rank within their a_id; only the rn=1
          // row of a genuinely-unmatched in-band a_id is ambiguous — a
          // second pad for the same a_id is a double emission at ANY cutoff
          // and survives normalization to red as engine-extra.
          val pads = engAll.filter(col("b_id").isNull)
            .withColumn("__rn", row_number().over(
              Window.partitionBy(col("a_id")).orderBy(col("a_es"))))
          val keptPads = pads
            .join(unmatched.select(col("a_id").as("ua_id")),
              col("a_id") === col("ua_id") && inBand && col("__rn") === 1, "left_anti")
            .drop("__rn")
          val engNorm = engAll.filter(col("b_id").isNotNull).unionByName(keptPads)
          (engNorm, o)

        case "join_agg" =>
          // same banded theta join as the interval oracle, then the window
          // agg — with the PROPAGATED cutoff: the join's output watermark
          // lags the input watermark by max(lo, hi) (see the scaladoc), so
          // only windows ending at or before wmFinal − slack may emit
          val loUs = p.loSec * 1000000L
          val hiUs = p.hiSec * 1000000L
          val slackUs = math.max(p.loSec, p.hiSec) * 1000000L
          val aSide = real.filter(pmod(col("event_id"), lit(2)) === 0)
            .select(col("event_id").as("a_id"), unix_micros(col("ts")).as("a_es"),
              (col("user_id") % p.keyMod).as("k"))
          val bSide = real.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id").as("b_id"), unix_micros(col("ts")).as("b_es"),
              (col("user_id") % p.keyMod).as("bk"))
          val o = aSide.join(bSide, col("k") === col("bk") &&
              col("b_es") >= col("a_es") - loUs && col("b_es") <= col("a_es") + hiUs)
            .withColumn("ws", col("a_es") - pmod(col("a_es"), lit(wUs)))
            .groupBy("ws", "k")
            .agg(count(lit(1)).as("n"), sum(col("b_id")).as("b_checksum"))
            .filter(col("ws") + wUs <= wmFinalUs - slackUs)
          val outSchema = StructType(Seq(
            StructField("ws", LongType), StructField("k", LongType),
            StructField("n", LongType), StructField("b_checksum", LongType)))
          (iso.read.schema(outSchema).parquet(outDir), o)

        case "rollup2" =>
          // level-1 truth (the tumbling oracle WITHOUT a cutoff), bucketed
          // into aligned level-2 windows; only CLOSED level-2 windows emit
          // (w2End ≤ wmFinal — the q_stream_rollup rule). Every level-1
          // window inside a closed level-2 window closed first (its end ≤
          // w2End), so rolling the unfiltered hourly truth is exact.
          val w2Us = wUs * p.w2Mult
          val o = real
            .select(unix_micros(col("ts")).as("es"), keyExpr, centsExpr.as("c"))
            .withColumn("w1", col("es") - pmod(col("es"), lit(wUs)))
            .groupBy("w1", "k").agg(count(lit(1)).as("n1"), sum("c").as("c1"))
            .withColumn("ws", col("w1") - pmod(col("w1"), lit(w2Us)))
            .groupBy("ws", "k")
            .agg(sum("n1").as("n"), count(lit(1)).as("n_w1"), sum("c1").as("cents"))
            .filter(col("ws") + w2Us <= wmFinalUs)
          val outSchema = StructType(Seq(
            StructField("ws", LongType), StructField("k", LongType),
            StructField("n", LongType), StructField("n_w1", LongType),
            StructField("cents", LongType)))
          (iso.read.schema(outSchema).parquet(outDir), o)

        case "profile" =>
          // batch recomputation of all three state families from the moded
          // event set (the q_stream_profile oracle generalized over keyMod
          // and the list cap): running count, purchase-cents total, and the
          // newest-K purchase cents by ascending event id. The update-mode
          // sink reduces to final state per key via max-n_events (strictly
          // increasing per touch).
          val kCap = p.profileK
          val moded = real.select(col("event_id"),
            (col("user_id") % p.keyMod).as("user_id"), col("event_type"), col("value"))
          val o = moded.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_events"),
              coalesce(sum(when(col("event_type") === "purchase",
                floor(col("value") * 100).cast("long"))), lit(0L)).as("purchase_cents"),
              // newest-K via reverse/slice(1,K)/reverse, NOT slice(arr,-K,K):
              // on this Spark a negative start whose magnitude exceeds the
              // array length returns an EMPTY array, so a key with 1..K-1
              // purchases would get oracle recent="" while the engine's
              // takeRight correctly keeps the short list — a false divergence
              // on a correct engine (and a mask for the symmetric engine bug)
              concat_ws(",", expr(
                s"""transform(reverse(slice(reverse(array_sort(collect_list(
                   |  CASE WHEN event_type = 'purchase'
                   |  THEN struct(event_id, CAST(floor(value * 100) AS BIGINT) AS cents) END))),
                   |  1, $kCap)), x -> x.cents)""".stripMargin)).as("recent"))
          val profSchema = StructType(Seq(
            StructField("user_id", LongType), StructField("n_events", LongType),
            StructField("purchase_cents", LongType),
            StructField("recent_purchases", ArrayType(LongType))))
          val fw = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
          val got = iso.read.schema(profSchema).parquet(outDir)
            .withColumn("rn", row_number().over(fw)).filter(col("rn") === 1)
            .select(col("user_id"), col("n_events"), col("purchase_cents"),
              concat_ws(",", col("recent_purchases")).as("recent"))
          (got, o)

        case "upsert" =>
          val latest = Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
            .filter(f => f.isDirectory && f.getName.startsWith("v"))
            .maxBy(_.getName.drop(1).toLong)
          val got = iso.read.parquet(latest.toString)
            .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("es"))
          val kw = Window.partitionBy("user_id")
            .orderBy(col("ts").desc, col("event_id").desc)
          val o = real.withColumn("rn", row_number().over(kw)).filter(col("rn") === 1)
            .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("es"))
          (got, o)
      }

      val s = streamDf.localCheckpoint(true)
      val o = oracleDf.localCheckpoint(true)
      val (sc, oc) = (s.count(), o.count())
      val extra = s.exceptAll(o)
      val missing = o.exceptAll(s)
      val ok = sc == oc && extra.isEmpty && missing.isEmpty
      val detail = if (ok) "" else {
        val ex = extra.take(3).mkString("; ")
        val ms = missing.take(3).mkString("; ")
        s"stream=$sc oracle=$oc extra=[$ex] missing=[$ms]"
      }
      Result(p.idx, p.kind, ok, sc, oc, lateInjected, detail)
    } finally deleteRecursively(base.toFile)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
