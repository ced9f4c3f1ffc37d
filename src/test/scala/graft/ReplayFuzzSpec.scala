package graft

import graft.fuzz.ReplayFuzzer

/** In-suite half of the DSv2 replay-source fuzzer (round-17 verdict #6 —
  * the last bespoke component without randomized evidence). The bulk runs
  * live out-of-suite (`runMain graft.ReplayFuzzMain <seed> <count>` —
  * committed seeds in bench_runs/fuzz_diff_r17.json); in-suite: generation
  * determinism, a small drained sample guaranteed to cover the restart and
  * HTTP axes, and the red-path control that keeps an all-green run from
  * being vacuous.
  */
class ReplayFuzzSpec extends SparkSpec {

  test("replay plan generation is deterministic in (seed, index)") {
    val a = ReplayFuzzer.plans(17003L, 40)
    assert(a == ReplayFuzzer.plans(17003L, 40))
    assert(a != ReplayFuzzer.plans(30071L, 40))
  }

  test("12 seeded replay plans drain green, covering restart and HTTP axes") {
    val pool = ReplayFuzzer.plans(909015L, 60)
    // 12 drains at ~1-2 s each: the first 8 plans plus enough extras to
    // guarantee a mid-stream restart, an HTTP transport, and a restarted
    // HTTP plan are all in the drained sample regardless of draw order
    val picks = (pool.take(8) ++ Seq(
      pool.find(p => p.cut > 0).get,
      pool.find(p => p.http).get,
      pool.find(p => p.http && p.cut > 0).get,
      pool.find(p => p.maxRows == 0 || p.maxRows < p.rowsPerBatch).get
    )).distinct.take(12)
    assert(picks.exists(_.cut > 0) && picks.exists(_.http))
    picks.foreach { p =>
      val r = ReplayFuzzer.run(spark, p)
      assert(r.ok, s"plan ${p.idx} ($p): ${r.detail}")
    }
  }

  test("RED PATH: a tampered oracle reds the replay compare") {
    val p = ReplayFuzzer.plans(909015L, 60).find(p => p.maxRows > 5).get
    val r = ReplayFuzzer.run(spark, p, tamperOracle = true)
    assert(!r.ok, "tampered-oracle control came back green — the compare is vacuous")
  }
}
