package graft

import graft.fuzz.StreamFuzzer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** In-suite half of the STREAMING differential fuzzer (round-14 verdict #1
  * — SqlFuzzer for the stateful half; round 16 added the two CHAINED
  * multi-stateful kinds `join_agg`/`rollup2` and the `profile` kind; round
  * 17 adds `interval_outer` — the LEFT OUTER stream-stream interval join,
  * whose null-pad emission timing was previously pinned at exactly one
  * curated parameter point). The bulk runs live
  * out-of-suite (`runMain graft.StreamFuzzMain <seed> <count>
  * /root/testdata/sf0.001` — committed seeds in bench_runs/
  * fuzz_diff_r17.json, all green under the 10-kind grammar); this spec
  * (1) pins generation determinism, (2) drains 48 seeded plans in-suite (floored at 48 — see InSuiteDrains)
  * and requires every one to match its batch recomputation, (3) proves the
  * harness REDS on divergence via a mis-stated oracle (the control that
  * makes an all-green run evidence rather than vacuity), and (4) pins the
  * too-late-admission semantics the harness's first smoke run caught.
  */
class StreamFuzzSpec extends SparkSpec {

  /** FLOOR on the in-suite drained-plan count (round-18 verdict #1): the
    * round-over-round suite-wall repayments each trimmed this set (100 → 64
    * → 48), and nothing stopped the trend from continuing until the in-suite
    * evidence was vestigial. 48 is the floor, not the current balance: under
    * the 11-kind grammar a 48-plan prefix still exercises every kind
    * multiple times (the distribution assert below), and further wall
    * repayment must come from somewhere else — behind a tag, out-of-suite,
    * or a documented ceiling change — never from this constant. Lowering it
    * requires editing BOTH the constant and this rationale. */
  private val InSuiteDrains = 48

  test("stream plan generation is deterministic in (seed, index)") {
    val a = StreamFuzzer.plans(909015L, 50)
    assert(a == StreamFuzzer.plans(909015L, 50))
    assert(a != StreamFuzzer.plans(515909L, 50))
  }

  test("48 seeded stateful plans drain green against their batch recomputation") {
    // 48, down from 64 (round-17 suite-wall repayment for ReplayFuzzSpec +
    // the outer red-path control) and FLOORED there (InSuiteDrains): the bulk
    // randomized evidence lives in the committed StreamFuzzMain artifacts
    // (510+ plans across 4+ seeds); in-suite the job is kind coverage + the
    // red-path control, and 48 plans under the 11-kind grammar still cover
    // most kinds repeatedly.
    val plans = StreamFuzzer.plans(909015L, InSuiteDrains)
    assert(plans.size >= 48, "in-suite drain floor violated — see InSuiteDrains")
    // every kind must appear in the generator's distribution — a regression
    // that collapsed it would silently gut coverage. Checked over a 150-plan
    // draw: the lightest kind (session, weight 1/22) legitimately misses a
    // 48-plan prefix; the DRAINED set stays at the 48 floor for the suite wall
    assert(StreamFuzzer.plans(909015L, 150).map(_.kind).distinct.sorted ==
      Seq("dedup", "interval", "interval_outer", "join_agg", "profile",
        "rollup2", "session", "sliding", "tumbling", "upsert", "v2_session"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val results = try {
      val futs = plans.map(p => Future(StreamFuzzer.run(spark, sf, p)))
      futs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
    val bad = results.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"plan ${r.idx} (${r.kind}): ${r.detail}").mkString("\n"))
    // non-vacuity: (almost) every plan produces output, and the strict-side
    // out-of-order injection actually fired across the run. A RARE zero-row
    // plan is legitimate, not vacuous — a narrow-band interval join can have
    // zero in-band pairs, and a sentinel-free agg whose span sits inside the
    // watermark delay closes no window; the compare above still required the
    // stream to emit exactly nothing (empty == empty is the assertion that
    // it didn't emit an unclosed window or an out-of-band pair). The bound
    // keeps the run evidence: ≥46/48 plans exercised real output.
    assert(results.count(_.streamRows > 0) >= results.size - 2,
      s"${results.count(_.streamRows == 0)} zero-output plans — the generator collapsed")
    assert(results.map(_.lateInjected).sum >= 50L)
  }

  test("drained output is state-store-partition-count invariant") {
    // One plan per state class (agg window, dedup state, join state),
    // each drained at 1 and 3 shuffle partitions: Structured Streaming
    // FIXES the state-store partition count at the first checkpoint, so
    // any setting must produce the identical result multiset — the
    // streaming analogue of FuzzDifferentialSpec's partition-invariance
    // axis, which no stream plan exercised before (all drains ran at 2).
    val plans = StreamFuzzer.plans(909015L, 150)
    // one per state class + the chained join→agg topology (round 16): its
    // state lives in TWO operators with different key schemas, so a
    // partition-count dependency could hide in the handoff
    // ... and the v2 profile kind: its RocksDB store partition count is
    // fixed at first checkpoint like every other state class
    // interval_outer stands in for the join-state class (round 17): it runs
    // the same symmetric-hash-join state machinery as the inner kind PLUS
    // the eviction-coupled null-pad path, at the same two-drain cost
    val picks = Seq("tumbling", "dedup", "interval_outer", "join_agg", "profile").map(k =>
      plans.find(_.kind == k).getOrElse(fail(s"no $k plan in the first 150")))
    picks.foreach { p =>
      val r1 = StreamFuzzer.run(spark, sf, p, shufflePartitions = 1)
      val r3 = StreamFuzzer.run(spark, sf, p, shufflePartitions = 3)
      assert(r1.ok, s"plan ${p.idx} (${p.kind}) @1 partition: ${r1.detail}")
      assert(r3.ok, s"plan ${p.idx} (${p.kind}) @3 partitions: ${r3.detail}")
      // both agree with the same batch oracle → they agree with each other;
      // row counts doubly pin it
      assert(r1.streamRows == r3.streamRows,
        s"plan ${p.idx} (${p.kind}): ${r1.streamRows} rows @1 vs ${r3.streamRows} @3")
    }
  }

  test("RED PATH: a mis-stated oracle reds the compare") {
    // Same drain, oracle watermark delay inflated by 10 days: the oracle's
    // emission cutoff drops ~10 days of windows the stream legitimately
    // emitted. If this passes green, the compare is vacuous.
    val p = StreamFuzzer.plans(909015L, 150)
      .find(p => p.kind == "tumbling" && !p.sentinel)
      .getOrElse(fail("no sentinel-free tumbling plan in the first 150"))
    val r = StreamFuzzer.run(spark, sf, p,
      oracleDelayOverrideSec = Some(p.delaySec + 10L * 86400))
    assert(!r.ok, "delay-override control came back green — the compare cannot detect divergence")
  }

  test("state TTL: an hours-TTL profile drain is green; the ttl≈0 control MUST red") {
    // Round-18 verdict #4 — the v2 API's TTL surface previously had ZERO
    // evidence anywhere in the programme. The fuzzer's profile kind now
    // randomizes an hours-scale TTL on both column families (ttlSec > 0 on
    // ~half the plans); a seconds-scale drain can never legally expire that
    // state, so the plan shares the no-TTL oracle — and THIS pair is what
    // makes those green plans evidence: the SAME plan re-drained with a
    // 1 ms TTL override must red, because processing-time expiry between
    // micro-batches resets the running counters (a user touched in two
    // batches reports its last-batch count, not its total). If the override
    // run comes back green, TTL is silently not being enforced and every
    // ttlSec>0 plan in the committed artifacts is vacuous.
    val p = StreamFuzzer.plans(909015L, 150)
      .find(p => p.kind == "profile" && p.ttlSec > 0 && p.nFiles >= 3 && !p.restart)
      .getOrElse(fail("no multi-batch TTL'd profile plan in the first 150"))
    val green = StreamFuzzer.run(spark, sf, p)
    assert(green.ok, s"hours-TTL profile plan ${p.idx} diverged: ${green.detail}")
    assert(green.streamRows > 0, "TTL'd profile plan produced no output — vacuous")
    val red = StreamFuzzer.run(spark, sf, p, profileTtlOverrideMs = Some(1L))
    assert(!red.ok,
      "ttl=1ms control came back green — state TTL is not actually expiring state")
  }

  test("RED PATH: the outer-join null-pad compare reds on a mis-stated cutoff") {
    // Same control for the round-17 interval_outer kind: inflating the
    // oracle's delay pushes its pad cutoff ~10 days back, so the engine's
    // legitimately-emitted padded rows become engine-extra. A sentinel plan
    // is chosen so the real run pads every unmatched a-row (maximal pad
    // surface for the control to disturb).
    val p = StreamFuzzer.plans(909015L, 150)
      .find(p => p.kind == "interval_outer" && p.sentinel)
      .getOrElse(fail("no sentinel interval_outer plan in the first 150"))
    val r = StreamFuzzer.run(spark, sf, p,
      oracleDelayOverrideSec = Some(p.delaySec + 10L * 86400))
    assert(!r.ok, "outer-join delay-override control came back green — the pad compare is vacuous")
  }

  test("PINNED SEMANTICS: a left-outer a-row admitted past its own pad cutoff is null-padded exactly once") {
    // Round-18 verdict #5. The interval_outer fuzz kind excludes late
    // injection because a row admitted after wm > a_ts + hi has emission
    // timing the watermark contract leaves unspecified — the strict
    // guarantee covers aggregation/admission, not the outer join's
    // eviction-coupled null emission. This pins what Spark 4.1.2 ACTUALLY
    // does (measured by the round's discovery probe): the too-late a-row is
    // NOT dropped by any pre-join late-row filter; it enters join state,
    // its eviction bound is already behind the watermark, and the next
    // eviction pass emits it null-padded EXACTLY once. If this test fails,
    // Spark either started dropping too-late join input (extend the fuzzer
    // with guaranteed-drop injection, like the aggregation pin below) or
    // began double-emitting pads — either way the interval_outer oracle's
    // exclusion rationale must be revisited, not silently trusted.
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "2")
    val base = java.nio.file.Files.createTempDirectory("graft-sfuzz-outer-pin")
    try {
      val src = base.resolve("src").toString
      val t0 = 1704067200000000L // 2024-01-01 00:00 UTC, micros
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      def writeRows(rows: Seq[(Long, Long, Long)]): Unit = {
        val df = iso.createDataFrame(
          iso.sparkContext.parallelize(rows.map { case (id, ts, k) =>
            org.apache.spark.sql.Row(id, new java.sql.Timestamp(ts / 1000), k, "view", 1.0)
          }), schema)
        df.coalesce(1).write.mode("append").parquet(src)
      }
      def tier(): Unit = {
        val fs = new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
        val mx = (fs.map(_.lastModified()).max / 2000L + 2L) * 2000L
        fs.sortBy(f => (f.lastModified(), f.getName)).zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(mx + i * 2000L))
        }
      }
      // file 1: a-row 0 + b-row 1 at t0, key 0 — an in-band match (lo=0 hi=300)
      writeRows(Seq((0L, t0, 0L), (1L, t0, 0L))); tier(); Thread.sleep(50)
      // file 2: far-future a/b pair at t0+100000 s — advances BOTH parity
      // sides' watermark nodes to t0+100000-600
      writeRows(Seq((100L, t0 + 100000L * 1000000L, 7L),
                    (101L, t0 + 100000L * 1000000L, 7L))); tier(); Thread.sleep(50)
      // file 3: the LATE a-row (id 2) at t0+50 s — its pad cutoff t0+350 s is
      // ~27 h behind the current watermark at admission; key 0 has no b in band
      writeRows(Seq((2L, t0 + 50L * 1000000L, 0L))); tier()
      val readSrc = iso.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
      val a = readSrc.filter(pmod(col("event_id"), lit(2)) === 0)
        .select(col("event_id").as("a_id"), col("ts").as("a_ts"), col("user_id").as("a_k"))
        .withWatermark("a_ts", "600 seconds")
      val b = readSrc.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("event_id").as("b_id"), col("ts").as("b_ts"), col("user_id").as("b_k"))
        .withWatermark("b_ts", "600 seconds")
      val out = base.resolve("out").toString
      val q = a.join(b, expr(
          "a_k = b_k AND b_ts >= a_ts AND b_ts <= a_ts + INTERVAL 300 SECONDS"), "left_outer")
        .select(col("a_id"), col("b_id"), unix_micros(col("a_ts")).as("a_es"))
        .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .format("parquet").option("path", out).start()
      try q.awaitTermination() finally q.stop()
      val res = iso.read.schema(StructType(Seq(StructField("a_id", LongType),
        StructField("b_id", LongType), StructField("a_es", LongType)))).parquet(out)
      val late = res.filter(col("a_id") === 2L).collect()
      assert(late.length == 1,
        s"late a-row emitted ${late.length} times — Spark's too-late outer-join " +
          "admission behavior changed; revisit StreamFuzzer's interval_outer exclusion")
      assert(late.head.isNullAt(1), "late a-row emitted MATCHED — impossible by construction")
      assert(res.count() == 3, s"unexpected sink: ${res.collect().mkString(", ")}")
    } finally deleteRecursively(base.toFile)
  }

  test("PINNED SEMANTICS: data later than the watermark MAY be admitted (one-directional guarantee)") {
    // The harness's first catch (12-plan smoke, seed 909015 plans 1/5):
    // Spark's watermark guarantee is one-directional — data within the
    // delay is guaranteed aggregated; data beyond it "may or may not be
    // dropped" (Structured Streaming guide). Observed 4.1.2 behavior,
    // minimal repro: a row arriving after its window was evicted is
    // ADMITTED into fresh state and re-emitted as a spurious partial
    // group. The fuzzer therefore fuzzes only the strict side. If this
    // test ever fails, Spark started dropping too-late rows — extend
    // StreamFuzzer with guaranteed-drop injection and retire this pin.
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "2")
    val base = java.nio.file.Files.createTempDirectory("graft-sfuzz-pin")
    try {
      val src = base.resolve("src").toString
      // file 1: 100 on-time rows spanning 10 days of January 2024
      iso.range(100).select(col("id").as("event_id"),
        timestamp_micros(lit(1704844800000000L) + col("id") * 8640000000L).as("ts"),
        (col("id") % 7).as("user_id"), lit("view").as("event_type"), lit(1.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(src)
      def pf() = new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet")).toSet
      val t1 = pf()
      val mb = (t1.map(_.lastModified()).max / 2000L + 2L) * 2000L
      var i = 0L
      def tier(fs: Set[java.io.File]): Unit = fs.toSeq.sortBy(_.getName).foreach { f =>
        require(f.setLastModified(mb + i * 2000L)); i += 1
      }
      tier(t1)
      // file 2: one row 9+ days older than the watermark will be by then
      iso.range(1).select(lit(-100L).as("event_id"),
        timestamp_micros(lit(1704067200000000L)).as("ts"),
        lit(0L).as("user_id"), lit("view").as("event_type"), lit(99.0).as("value"))
        .coalesce(1).write.mode("append").parquet(src)
      tier(pf() -- t1)
      val schema = StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      val out = base.resolve("out").toString
      val q = iso.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "600 seconds")
        .groupBy(window(col("ts"), "3600 seconds").as("w"), col("user_id").as("k"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("ws"), col("k"), col("n"))
        .writeStream.trigger(Trigger.AvailableNow()).outputMode("append")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .format("parquet").option("path", out).start()
      try q.awaitTermination() finally q.stop()
      val lateOut = iso.read.parquet(out).filter(col("ws") === 1704067200000000L).count()
      assert(lateOut == 1L,
        s"too-late row emitted $lateOut times — Spark's one-directional watermark " +
          "behavior changed; revisit StreamFuzzer's injection design")
    } finally deleteRecursively(base.toFile)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
