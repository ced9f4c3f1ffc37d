package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pass-1 ordering lint + stalled-window simulation (round 19, r18 verdict
  * #7): Bench pass 1 used to iterate alphabetically, so a host stall always
  * ate an alphabetically-contiguous tail — BENCH_r18 budget-skipped 27
  * queries (q_token_histogram..q_zscore_outliers) that together cost ~10 s
  * at healthy speed. Pass 1 now iterates in ascending committed duration
  * (bench_durations.txt, a resource generated from the last healthy
  * full-coverage artifact), unknown/new queries first. This spec pins the
  * ordering contract and REPLAYS the r18 stall shape against both orders:
  * under the same time budget, ascending order must cover strictly more
  * queries than alphabetical, and every query it skips must be at least as
  * expensive as every query it covered — "skips land on expensive retimes,
  * never on coverage" made checkable. */
class BenchOrderSpec extends AnyFunSuite {

  private def ledger: Map[String, Double] = Bench.committedDurations()

  test("durations ledger loads and covers the bulk of the registry") {
    val dur = ledger
    assert(dur.size >= 200, s"ledger has only ${dur.size} entries")
    val registered = SparkEntry.queries.keySet
    val stale = dur.keySet.diff(registered)
    assert(stale.isEmpty, s"ledger names not in the registry: $stale")
    assert(dur.values.forall(v => v >= 0 && v < 120),
      "ledger durations out of the plausible per-query range")
  }

  test("pass-1 order: unknowns first alphabetically, then ascending duration") {
    val dur = Map("a_known" -> 2.0, "b_cheap" -> 0.1, "c_mid" -> 0.5)
    val qs = Seq("a_known", "z_new", "b_cheap", "m_new", "c_mid").map(_ -> ())
    val got = Bench.pass1Order(qs, dur).map(_._1)
    assert(got == Seq("m_new", "z_new", "b_cheap", "c_mid", "a_known"))
  }

  test("pass-1 order is deterministic and a permutation of the registry") {
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    val o1 = Bench.pass1Order(qs).map(_._1)
    val o2 = Bench.pass1Order(qs.reverse).map(_._1)
    assert(o1 == o2, "order must not depend on input order")
    assert(o1.sorted == qs.map(_._1).sorted, "order must be a permutation")
  }

  test("stalled-window replay: ascending order out-covers alphabetical and skips only the expensive head") {
    val dur = ledger
    val names = SparkEntry.queries.keySet.toSeq.sorted
    // charge unledgered (new) queries the ledger median — the simulation
    // must not go vacuous between a registry edit and the ledger refresh
    val med = dur.values.toSeq.sorted.apply(dur.size / 2)
    def cost(n: String): Double = dur.getOrElse(n, med)
    // r18 stall shape: the whole window runs STALL× slower and pass 1 has
    // `window` seconds before the budget line. BENCH_r18's healthy-speed
    // pass-1 work is ~segment sum; its run skipped 27 of 239 under
    // alphabetical order.
    val stall = 4.0
    val window = 150.0
    def covered(order: Seq[String]): Seq[String] = {
      var left = window
      order.takeWhile { n => left -= cost(n) * stall; left >= 0 }
    }
    val alpha = covered(names)
    val asc = covered(Bench.pass1Order(names.map(_ -> ()), dur).map(_._1))
    assert(asc.size > alpha.size,
      s"ascending covered ${asc.size} <= alphabetical ${alpha.size}")
    // the queries ascending order skips are each at least as expensive as
    // every query it covered (coverage-first, accuracy last)
    val skipped = names.toSet.diff(asc.toSet)
    if (skipped.nonEmpty && asc.nonEmpty) {
      val maxCovered = asc.map(cost).max
      assert(skipped.forall(cost(_) >= maxCovered - 1e-9),
        "ascending order skipped a query cheaper than one it covered")
    }
  }
}
