package graft

import graft.fuzz.VectorFuzzer
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** In-suite half of the VECTOR/ANN differential fuzzer — fourth leg of the
  * randomized programme. The bulk run lives out-of-suite (`runMain
  * graft.VectorFuzzMain <seed> <count>`); this spec pins (1) generation
  * determinism, (2) a 28-plan in-suite run — kind choice cycles by index,
  * so each of the 7 kinds runs four times on different random vector sets
  * (including the planted all-zero vector's null-cosine path on ~1/3 of
  * plans) — and (3) the red-path tamper control on all three compare
  * classes (exact multiset for the top-k kinds, tolerance band for the
  * moment kinds, and the boundary-robust ivf_pq compare whose control is
  * a perturbed oracle-side query). The load-bearing plan kind is `ivf_full`: a full probe of the
  * IVF index must equal exact brute-force search REGARDLESS of what the
  * k-means quantizer learned — the one ANN property that is
  * recall-independent and therefore exactly checkable.
  */
class VectorFuzzSpec extends SparkSpec {

  test("vector plan generation is deterministic in (seed, index)") {
    val a = VectorFuzzer.plans(808080L, 28)
    assert(a == VectorFuzzer.plans(808080L, 28))
    assert(a.map(_.vectors) != VectorFuzzer.plans(818181L, 28).map(_.vectors))
    assert(a.groupBy(_.kind).forall(_._2.size == 4))
  }

  test("28 seeded vector sets agree with linear-algebra oracles on all 7 kinds") {
    val plans = VectorFuzzer.plans(808080L, 28)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val results = try {
      val futs = plans.map(p => Future(VectorFuzzer.run(spark, p)))
      futs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
    val bad = results.filterNot(_.ok)
    assert(bad.isEmpty,
      bad.map(r => s"plan ${r.idx} (${r.kind}): ${r.detail}").mkString("\n"))
    assert(results.map(_.engineRows).sum > 100L)
  }

  test("RED PATH: a tampered oracle reds all three compare classes") {
    val plans = VectorFuzzer.plans(808080L, 28)
    val brute = plans.find(_.kind == "brute").get
    assert(!VectorFuzzer.run(spark, brute, tamperOracle = true).ok,
      "dropped-row control came back green — the multiset compare is vacuous")
    val stats = plans.find(_.kind == "dimstats").get
    assert(!VectorFuzzer.run(spark, stats, tamperOracle = true).ok,
      "moment-shift control came back green — the tolerance compare is vacuous")
    val pq = plans.find(_.kind == "ivf_pq").get
    assert(!VectorFuzzer.run(spark, pq, tamperOracle = true).ok,
      "perturbed-query control came back green — the boundary-robust ADC compare is vacuous")
  }
}
