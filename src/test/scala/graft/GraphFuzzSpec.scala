package graft

import graft.fuzz.GraphFuzzer
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** In-suite half of the GRAPH-kernel differential fuzzer — the third leg
  * of the randomized programme (SqlFuzzer: relational core vs DuckDB;
  * StreamFuzzer: stateful half vs batch recomputation; this: the 12 graph
  * kernels vs plain-Scala brute-force oracles on seeded random graphs,
  * where previously each kernel was pinned by ONE curated corpus graph).
  * The bulk run lives out-of-suite (`runMain graft.GraphFuzzMain <seed>
  * <count>`); this spec pins (1) generation determinism, (2) a 24-plan
  * in-suite run — kernel choice cycles by index, so every kernel runs
  * exactly twice on two different random graphs — and (3) the red-path
  * tamper control on both compare classes (exact multiset and
  * tolerance-banded rank vector), without which an all-green run would be
  * indistinguishable from a vacuous compare.
  */
class GraphFuzzSpec extends SparkSpec {

  test("graph plan generation is deterministic in (seed, index)") {
    val a = GraphFuzzer.plans(606060L, 24)
    assert(a == GraphFuzzer.plans(606060L, 24))
    assert(a.map(_.edges) != GraphFuzzer.plans(616161L, 24).map(_.edges))
    // index cycling covers every kernel exactly count/12 times
    assert(a.groupBy(_.kernel).forall(_._2.size == 2))
  }

  test("24 seeded random graphs agree with brute-force oracles on all 12 kernels") {
    val plans = GraphFuzzer.plans(606060L, 24)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val results = try {
      val futs = plans.map(p => Future(GraphFuzzer.run(spark, p)))
      futs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
    val bad = results.filterNot(_.ok)
    assert(bad.isEmpty,
      bad.map(r => s"plan ${r.idx} (${r.kernel}): ${r.detail}").mkString("\n"))
    // non-vacuity: the kernels actually produced rows to compare
    assert(results.map(_.engineRows).sum > 100L)
  }

  test("RED PATH: a tampered oracle reds both compare classes") {
    // exact-multiset class: drop one oracle row (cc, plan 0 — a random
    // graph's component labeling is never empty at these densities)
    val ccPlan = GraphFuzzer.plans(606060L, 24).find(_.kernel == "cc").get
    assert(!GraphFuzzer.run(spark, ccPlan, tamperOracle = true).ok,
      "dropped-row control came back green — the multiset compare is vacuous")
    // tolerance-band class: shift one rank by 1e-6 (tolerance is 1e-9)
    val prPlan = GraphFuzzer.plans(606060L, 24).find(_.kernel == "pagerank").get
    assert(!GraphFuzzer.run(spark, prPlan, tamperOracle = true).ok,
      "rank-shift control came back green — the tolerance compare is vacuous")
  }
}
