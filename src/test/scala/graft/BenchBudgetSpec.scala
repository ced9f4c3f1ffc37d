package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-budget lint (round-9 verdict ask #3): the driver runs `graft.Bench`
  * under a 330 s wall budget on a host that stalls 2-3×, and the registry
  * has only ever grown — round 9 finished at 321 s of 330 (a 2.7% margin).
  * This spec projects the driver's wall time from the COMMITTED bench
  * series and fails BEFORE a commit ships a registry the budget can't hold,
  * instead of the breach surfacing in the driver artifact a round later.
  *
  * Projection model (matches Bench.scala's phases):
  *   wall ≈ warmup + pass1 + pass2, where pass2 self-limits at
  *   budget−55 s by construction — so the artifact is only at risk if
  *   warmup + pass1 alone crowd the retime window. The lint therefore
  *   bounds warmup + pass1 ≤ PassOneShare × (budget − 55): pass 1 must fit
  *   well inside the pre-deadline window, leaving the rest as stall
  *   tolerance and retime room.
  *
  * Inputs: the latest committed series `bench_runs/benchrN*_*.json`
  * (highest round number N). pass1 is estimated as the per-query MAX
  * across the series (single readings, pessimistic); a registered query
  * with no committed reading yet (added mid-round) is charged a
  * conservative default instead of failing, so the lint stays runnable
  * between the registry edit and the end-of-round bench refresh. */
class BenchBudgetSpec extends AnyFunSuite {

  private val BudgetSec = 330.0
  private val RetimeReserve = 55.0
  /** Fallback warmup wall when the committed series predates the
    * `warmup_s` artifact field (pre-round-12): entry + concurrent builds +
    * the concurrent drain stage measured t≈40 s, padded for drift. When
    * the series carries measured `warmup_s` values, the projection uses
    * their max instead (round-10 ask #1: measured, not a constant). */
  private val WarmupFallbackSec = 50.0
  /** warmup+pass1 may fill at most this share of the pre-deadline window;
    * the remainder is host-stall tolerance (the documented 20-70× stall
    * windows land on whatever is running) plus retime room. */
  private val PassOneShare = 0.85
  private val DefaultNewQuerySec = 1.5

  test("committed bench series projects inside the driver budget") {
    val dir = new java.io.File("bench_runs")
    val series = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("benchr\\d+[a-z]?_\\d\\.json"))
    assume(series.nonEmpty, "no committed bench series to lint")
    // latest series = highest (round, letter) — matching closing_state.py.
    // Pooling every same-round series would fold in pre-refresh runs from
    // older code (and the worst host-stall window of the round) and lint a
    // registry that no longer exists.
    def key(f: java.io.File) = {
      val m = "benchr(\\d+)([a-z]?)_".r.findFirstMatchIn(f.getName).get
      (m.group(1).toInt, m.group(2))
    }
    val top = series.map(key).max
    val latest = series.filter(key(_) == top)
    val round = s"${top._1}${top._2}"
    // one-line JSON; extract the "queries" object's "name":value pairs
    val pair = """"(q_[a-zA-Z0-9_]+)":(-?\d+(?:\.\d+)?(?:E-?\d+)?)""".r
    val warmupField = """"warmup_s":(\d+(?:\.\d+)?)""".r
    val perQuery = scala.collection.mutable.Map.empty[String, Double]
    var warmupMeasured = List.empty[Double]
    val texts = latest.map(f => scala.io.Source.fromFile(f).mkString).toSeq
    for (txt <- texts) {
      // Parse ONLY the `queries` object: since round 12 the artifact also
      // carries a `drains` object keyed by the same q_stream_* names with
      // the REAL per-gate drain seconds — warmup wall, already inside
      // warmup_s; folding those into the pass-1 estimate would double-count
      // the drain family (~25 s) against the ceiling.
      val qObj = txt.indexOf("\"queries\":{") match {
        case -1 => txt
        case i => txt.substring(i, txt.indexOf('}', i).max(i))
      }
      for (m <- pair.findAllMatchIn(qObj)) {
        val (name, v) = (m.group(1), m.group(2).toDouble)
        if (v >= 0) perQuery(name) = math.max(perQuery.getOrElse(name, 0.0), v)
      }
      warmupMeasured = warmupField.findFirstMatchIn(txt).map(_.group(1).toDouble).toList ::: warmupMeasured
    }
    assume(perQuery.nonEmpty, s"benchr$round series parsed to no query timings")
    val registered = SparkEntry.queries.keySet
    val missing = registered -- perQuery.keySet
    val pass1Est = registered.toSeq.map(perQuery.getOrElse(_, DefaultNewQuerySec)).sum
    val ceiling = PassOneShare * (BudgetSec - RetimeReserve)
    // Stage-cache-aware split (round 16): a cached series mixes one MISS
    // run (full builds + cache writes — the once-per-corpus case) with HIT
    // runs (parquet loads — the driver's steady state). The steady-state
    // projection holds hit warmup (the series MIN) to the 0.85 ceiling;
    // the miss run only has to fit the raw pass-1 deadline (budget−15):
    // it is one-time, self-healing (even a watchdog-halted miss leaves the
    // cache written for the next attempt), and allowed to consume the
    // stall-tolerance share.
    val cached = texts.exists(_.contains("\"stage_cache\":{\"enabled\":true"))
    val warmupSteady =
      if (warmupMeasured.isEmpty) WarmupFallbackSec
      else if (cached) warmupMeasured.min
      else warmupMeasured.max
    val projected = warmupSteady + pass1Est
    info(f"benchr$round series: pass1 est $pass1Est%.1f s over ${registered.size} queries " +
      f"(${missing.size} uncommitted @ $DefaultNewQuerySec/q), steady warmup " +
      f"$warmupSteady%.1f s (${if (cached) "cache-hit min" else if (warmupMeasured.nonEmpty) "measured max" else "fallback"}), " +
      f"projected warmup+pass1 $projected%.1f s vs ceiling $ceiling%.1f s")
    assert(projected <= ceiling,
      f"projected warmup+pass1 $projected%.1f s exceeds $ceiling%.1f s — the registry has " +
        "outgrown the driver bench budget; stage or shed cost before committing " +
        "(see Bench.scala's warmup-stage pattern)")
    if (cached && warmupMeasured.nonEmpty) {
      val missProjected = warmupMeasured.max + pass1Est
      info(f"miss-run projection ${missProjected}%.1f s vs pass-1 deadline ${BudgetSec - 15}%.1f s")
      assert(missProjected <= BudgetSec - 15,
        f"first-run (cache-miss) projection $missProjected%.1f s exceeds the pass-1 deadline — " +
          "even the once-per-corpus staging run would skip queries on a NORMAL window")
    }
  }

  /** Round-16 verdict #1: BENCH_r15 skipped 21 queries when a ~1.7×-slow
    * host window inflated the 83 s warmup — so this test red-lights any
    * committed registry whose projection would lose pass-1 coverage at a
    * 2× warmup window. Drift factors are the round-15 driver measurements:
    * builds/drains (checkpoint- and write-heavy, where host stalls land)
    * drifted 1.7-2.1×, modeled at 2.0; the timed in-memory queries drifted
    * median 1.09 / worst 1.53, modeled at 1.5 across the whole pass —
    * both at or above the worst observed. The warmup estimate is the MIN
    * measured `warmup_s` across the latest committed series: with the
    * stage cache, the steady driver state is a cache HIT (the first-ever
    * run writes the cache through and is the one run allowed to degrade),
    * and the min of a series that contains hit runs is the hit cost. Only
    * meaningful once the committed series carries the `stage_cache` field,
    * so it assumes (skips) on pre-cache series. */
  test("pass-1 coverage survives a 2x slow warmup window (stage-cache hit state)") {
    val WarmupDrift = 2.0
    val Pass1Drift = 1.5
    val EmitMargin = 15.0 // Bench's pass-1 deadline is budget-15
    val dir = new java.io.File("bench_runs")
    val series = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("benchr\\d+[a-z]?_\\d\\.json"))
    assume(series.nonEmpty, "no committed bench series to lint")
    def key(f: java.io.File) = {
      val m = "benchr(\\d+)([a-z]?)_".r.findFirstMatchIn(f.getName).get
      (m.group(1).toInt, m.group(2))
    }
    val top = series.map(key).max
    val latest = series.filter(key(_) == top)
    val texts = latest.map(f => scala.io.Source.fromFile(f).mkString).toSeq
    assume(texts.exists(_.contains("\"stage_cache\":{\"enabled\":true")),
      "latest committed series predates the stage cache — the hit-state projection needs a cached series")
    val pair = """"(q_[a-zA-Z0-9_]+)":(-?\d+(?:\.\d+)?(?:E-?\d+)?)""".r
    val warmupField = """"warmup_s":(\d+(?:\.\d+)?)""".r
    val perQuery = scala.collection.mutable.Map.empty[String, Double]
    var warmups = List.empty[Double]
    for (txt <- texts) {
      val qObj = txt.indexOf("\"queries\":{") match {
        case -1 => txt
        case i => txt.substring(i, txt.indexOf('}', i).max(i))
      }
      for (m <- pair.findAllMatchIn(qObj)) {
        val (name, v) = (m.group(1), m.group(2).toDouble)
        if (v >= 0) perQuery(name) = math.max(perQuery.getOrElse(name, 0.0), v)
      }
      warmups = warmupField.findFirstMatchIn(txt).map(_.group(1).toDouble).toList ::: warmups
    }
    assume(warmups.nonEmpty && perQuery.nonEmpty, "series parsed to no warmup/query readings")
    val warmupHit = warmups.min
    val registered = SparkEntry.queries.keySet
    val pass1Est = registered.toSeq.map(perQuery.getOrElse(_, DefaultNewQuerySec)).sum
    val projected = WarmupDrift * warmupHit + Pass1Drift * pass1Est
    val ceiling = BudgetSec - EmitMargin
    info(f"hit-state warmup $warmupHit%.1f s (min of ${warmups.size} runs), pass1 est " +
      f"$pass1Est%.1f s; 2x-window projection $projected%.1f s vs ceiling $ceiling%.1f s")
    assert(projected <= ceiling,
      f"2x-slow-window projection $projected%.1f s exceeds $ceiling%.1f s — pass-1 coverage " +
        "would be lost on a bad host window even with a warm stage cache; shed warmup or " +
        "registry cost (the BENCH_r15 failure class)")
  }
}
