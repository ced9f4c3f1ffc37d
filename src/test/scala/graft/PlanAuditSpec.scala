package graft

/** Plan-shape regression gate (round-10 ask #5): PLANS.md documents, per
  * query, the physical plan that IS the feature — the broadcast that keeps
  * a 100 TB fact from shuffling for a dimension, the WindowGroupLimit that
  * caps a shuffle at k rows per group, the filter that reaches the parquet
  * scan before a row-multiplying explode. Until round 12 those claims were
  * manually re-audited each round (`PlanAuditMain`); this spec pins the
  * load-bearing ones so a plan regression (a lost hint, a rewrite rule no
  * longer firing, an operator reordered behind the explode) fails the suite
  * instead of surfacing as a 100× scale-up surprise.
  *
  * Everything asserted here is STATIC — visible in the pre-execution
  * physical plan — so the sweep costs planning time only. AQE-dependent
  * shapes (runtime broadcast conversions, skew splits) are deliberately
  * not asserted: the initial plan doesn't carry them, and they are
  * environment-adaptive by design. Streaming gate queries are excluded:
  * their returned frame is a localCheckpoint scan of an already-drained
  * sink (constructing one RUNS the drain), and the drain harness's shape
  * is pinned by the streaming specs and in-gate require()s instead. */
class PlanAuditSpec extends SparkSpec {

  /** Pre-execution physical plan per query, built once for the suite.
    * Construction may build memoized session artifacts (index fits, staged
    * truths) shared with the other suites via the common session. */
  private lazy val plans: Map[String, String] =
    SparkEntry.queries.collect {
      case (n, fn) if !n.startsWith("q_stream_") =>
        n -> fn(spark, sf).queryExecution.executedPlan.toString
    }

  private def plan(n: String): String =
    plans.getOrElse(n, fail(s"$n is not in the audited plan set"))

  test("no registered query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.toSeq.sorted.mkString(", ")} — every " +
        "documented all-pairs baseline must ride a broadcast nested-loop join")
  }

  test("top-k-per-group queries keep their WindowGroupLimit prune") {
    // rank-filter shapes where InferWindowGroupLimit's map-side prune is
    // the difference between shuffling k rows per group and shuffling the
    // corpus (PLANS.md rows: q_mode_value, q_hard_negatives,
    // q_stratum_topk)
    for (n <- Seq("q_mode_value", "q_hard_negatives", "q_stratum_topk"))
      assert(plan(n).contains("WindowGroupLimit"),
        s"$n lost its WindowGroupLimit prune:\n${plan(n)}")
  }

  test("global top-k queries plan TakeOrderedAndProject, not a global sort") {
    // per-partition heaps + a k-row merge; a full Sort here would be a
    // single-task global order at corpus scale (PLANS.md rows: q_topk,
    // q_bm25, q_pmi_bigrams, q_pagination_keyset)
    for (n <- Seq("q_topk", "q_bm25", "q_pmi_bigrams", "q_pagination_keyset"))
      assert(plan(n).contains("TakeOrderedAndProject"),
        s"$n lost its TakeOrderedAndProject top-k:\n${plan(n)}")
  }

  test("documented small sides broadcast") {
    // explicit broadcast() sites where the other side is a fact table that
    // must never shuffle for the join (PLANS.md rows: q_join_dims dims,
    // q_tpch_q5 dims, q_length_deciles / q_value_histogram / q_cusum
    // 1-row bounds, q_interpolate type dim, q_seasonal_anomaly baseline)
    for (n <- Seq("q_join_dims", "q_tpch_q5", "q_length_deciles",
        "q_value_histogram", "q_cusum", "q_interpolate", "q_seasonal_anomaly"))
      assert(plan(n).contains("BroadcastExchange"),
        s"$n lost its broadcast small side:\n${plan(n)}")
  }

  test("filters reach the parquet scan where the scan order is the feature") {
    // the pushed filter must appear in the SCAN's PushedFilters list, not
    // as a post-scan Filter only (PLANS.md rows; q_explode_tokens is the
    // canonical prune-before-Generate case)
    val expected = Seq(
      "q_pending" -> "IsNotNull(doc_id)",
      "q_explode_tokens" -> "LessThan(doc_id,25)",
      "q_window_firstlast" -> "LessThan(o_custkey,50)",
      "q_scd2" -> "LessThan(user_id,30)")
    for ((n, pushed) <- expected) {
      val scanLines = plan(n).linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
      assert(scanLines.contains(pushed),
        s"$n: expected '$pushed' in PushedFilters, scan lines were:\n$scanLines\n" +
          s"full plan:\n${plan(n)}")
    }
  }
}
