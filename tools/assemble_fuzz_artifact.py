#!/usr/bin/env python3
"""Assemble bench_runs/fuzz_diff_r{N}.json from a regen directory's JSONL
logs (one line per FuzzMain / StreamFuzzMain / GraphFuzzMain / VectorFuzzMain
/ ReplayFuzzMain run) plus the compare_oracle log for the SQL half. Keeps the artifact a
faithful record of what actually ran: every number is read from a run log
or derived from the spec/generator sources, never typed in — and a
regeneration carries forward BOTH result-bearing sections of the previous
artifact (divergences_found AND robustness_spot), so re-running the script
never silently drops committed evidence (round-15 ADVICE).

Usage: assemble_fuzz_artifact.py <regenDir> <outPath> [prevArtifact]
(prevArtifact defaults to outPath if it already exists)
"""
import json
import os
import re
import sys


def spec_count(path, pattern, what):
    """Read a count out of a Scala source so the in_suite sentence can't go
    stale against the spec it describes (round-15 ADVICE: the hardcoded
    text said 20 plans / 5 kinds after ivf_q8 made it 24 / 6)."""
    with open(path) as f:
        m = re.search(pattern, f.read())
    assert m, f"cannot derive {what} from {path} (pattern {pattern})"
    return int(m.group(1))


def lines(path):
    try:
        with open(path) as f:
            return [json.loads(x) for x in f if x.strip()]
    except FileNotFoundError:
        return []


def main():
    d, out = sys.argv[1], sys.argv[2]
    sql = lines(f"{d}/sql.jsonl")
    stream = lines(f"{d}/stream.jsonl")
    graph = lines(f"{d}/graph.jsonl")
    vector = lines(f"{d}/vector.jsonl")
    replay = lines(f"{d}/replay.jsonl")
    compares = {}
    with open(f"{d}/sql_compare.log") as f:
        for ln in f:
            m = re.match(r"seed=(\d+) sf=(\S+) (ok=\d+ no_oracle=\d+ bad=\d+)", ln)
            if m:
                compares[(int(m.group(1)), m.group(2))] = m.group(3)

    runs = []
    for r in sql:
        sf = r["sf_dir"].split("/")[-1]
        cmp_line = compares.get((r["seed"], sf))
        assert cmp_line, f"no compare line for seed {r['seed']} {sf}"
        assert r["failed"] == 0, f"seed {r['seed']} had execution failures"
        assert " bad=0" in " " + cmp_line, f"seed {r['seed']} has bad rows: {cmp_line}"
        runs.append({
            "seed": r["seed"], "count": r["count"], "sf_dir": r["sf_dir"],
            "executed": r["executed"], "failed": r["failed"],
            "zero_row_plans": r["zero_row_plans"], "compare": cmp_line,
        })
    for r in stream + graph + vector + replay:
        assert r["bad"] == 0, f"non-SQL run {r['seed']} has bad plans: {r}"

    artifact = {
        "harness": ("graft.FuzzMain + tools/compare_oracle.py (SQL half, DuckDB oracle), "
                    "graft.StreamFuzzMain (streaming half, batch-recomputation oracle, Spark-vs-Spark), "
                    "graft.GraphFuzzMain (graph kernels vs plain-Scala brute-force oracles on random multigraphs), "
                    "graft.VectorFuzzMain (ANN/embedding operators vs plain-Scala linear algebra on random vectors), "
                    "graft.ReplayFuzzMain (custom DSv2 replay source vs its own pure generator function)"),
        "generator": ("graft.fuzz.SqlFuzzer — seeded, (seed,index)->SQL stable per JDK Random spec; 21 plan kinds: "
                      "the 18 round-15-closing kinds (filter/project/distinct, group-agg+HAVING, inner/left equi-joins (+agg), "
                      "windows, set ops, nested post-agg filters, IN/NOT IN/EXISTS/NOT EXISTS subqueries, CTE joins, "
                      "ROLLUP/CUBE with GROUPING markers, FULL OUTER joins, 3-table chain joins, null-injected derived tables, "
                      "aggregate FILTER clauses, RIGHT OUTER joins, explicit GROUPING SETS, RANGE window frames, "
                      "correlated scalar subqueries, deep CASE/string expression trees) plus nonEquiJoin — "
                      "pure-inequality and BETWEEN-band joins between GROUP-BY-bounded derived tables (BroadcastNestedLoopJoin "
                      "planning, <=256-row worst case at any SF), equi-joins with non-equi ON-clause residuals, and correlated "
                      "non-equi [NOT] EXISTS — plus, round 17: lateralQ (correlated LATERAL subqueries in FROM, scalar-agg and "
                      "multi-row shapes — the LateralJoin/DecorrelateInnerQuery path) and qualifyQ (QUALIFY-pattern windowed "
                      "filtering: rank/dense_rank cutoffs and running-sum predicates over a shared full ORDER BY, filtered "
                      "above the window)"),
        "stream_generator": ("graft.fuzz.StreamFuzzer — seeded stateful plans, now ELEVEN kinds: tumbling/sliding-window "
                             "aggregation, session windows, watermark dedup, versioned-merge upsert, stream-stream INTERVAL "
                             "JOINS (random lo/hi time bounds), and — round 16 — the two CHAINED multi-stateful classes: "
                             "join_agg (interval join feeding a windowed agg, BOTH stages randomized; oracle encodes the "
                             "propagated cutoff windowEnd <= wm - max(lo, hi)) and rollup2 (two-level windowed rollup with a "
                             "random aligned level-2 multiple; cutoff w2End <= wm), the transformWithState-v2 profile kind (ValueState + "
                             "newest-K ListState on RocksDB), and — round 17 — interval_outer (LEFT OUTER interval join: null-pad "
                             "emission only once wm > a_ts + hi, never both padded and matched, under a +-5 ms boundary band; "
                             "oracle watermark = min over the parity sides' own maxima, ms-floored — the engine-fidelity rule the "
                             "kind's first smoke run caught; since round 18 the band normalization removes AT MOST ONE pad per "
                             "in-band a_id, so an in-band duplicate pad reds) and v2_session (event-time TIMER-driven sessionization on "
                             "transformWithState, same gaps-and-islands oracle as the session_window kind); round 18 adds a state-TTL "
                             "axis to the profile kind (~half the plans run both column families under an hours-scale processing-time "
                             "TTLConfig + TimeMode.ProcessingTime — inert by construction inside a seconds-scale drain, so the no-TTL "
                             "oracle stands; that expiry actually fires is StreamFuzzSpec's ttl~0 red-path control). Randomized window/slide/gap/delay/key-mod/"
                             "slicing/sentinel/in-horizon late injection/re-delivery, and the restart axis (1/3 of plans split "
                             "staging across two query lifetimes on one checkpoint). Interval-join soundness: a late "
                             "in-horizon row's partner satisfies ts >= late_ts - hi > wm - hi, the join-state eviction bound"),
        "graph_generator": ("graft.fuzz.GraphFuzzer — seeded random multigraphs (sparse ids, duplicate edges, self-loops, "
                            "disconnected components); all 12 graph kernels vs plain-Scala brute-force oracles sharing no "
                            "code with the implementations (union-find, exhaustive triple scan, synchronous Bellman-Ford, "
                            "re-derived power iteration at 1e-9; integer kernels exact-multiset). Kernel cycles by index"),
        "vector_generator": ("graft.fuzz.VectorFuzzer — seeded random float vector sets (4-16 dims, ~1/3 of plans plant an "
                             "all-zero vector for the try_divide null-cosine path); brute-force top-k, FULL-PROBE IVF == exact "
                             "search (k-means-independent), partial probe replayed from the engine's own centroids/assignments, "
                             "int8 retrieve-then-rerank (ivf_q8), and — round 16 — the IVF+PQ ADC path (ivf_pq) under a "
                             "BOUNDARY-ROBUST compare: exact replay of probe/LUT/ADC/rerank from the engine's own model "
                             "artifacts, exact multiset compare unless the ADC survivor-boundary gap is inside 1e-9 relative, "
                             "then an admissibility check (no flaky fresh seeds by construction). Plus dim-stats and whitened "
                             "norms vs direct moments. Cosine oracles replay vec_dot/vec_norm's documented index-order sums"),
        "replay_generator": ("graft.fuzz.ReplayFuzzer — seeded plans over the custom DSv2 review-replay source: random "
                             "page size, feed length (zero included), partition fan-out re-randomized across a MID-STREAM "
                             "restart (lifetime 1 stops the feed at a generally non-page-aligned cut; lifetime 2 resumes the "
                             "same checkpoint), and transport (in-memory generator vs a literal HTTP stub with injected 503s "
                             "exercising the retry ladder). Oracle = the source's own pure row function: every row exactly "
                             "once, no micro-batch above the page size"),
        "runs": runs,
        "stream_runs": [
            {k: r[k] for k in ("seed", "count", "sf_dir", "ok", "bad", "kinds",
                               "restart_plans", "late_rows_injected", "zero_row_plans", "wall_s")}
            for r in stream],
        "graph_runs": [
            {k: r[k] for k in ("seed", "count", "ok", "bad", "kernels",
                               "engine_rows_total", "wall_s")} for r in graph],
        "vector_runs": [
            {k: r[k] for k in ("seed", "count", "ok", "bad", "kinds",
                               "engine_rows_total", "wall_s")} for r in vector],
        "replay_runs": [
            {k: r[k] for k in ("seed", "count", "ok", "bad", "restart_plans",
                               "http_plans", "zero_row_plans", "wall_s")} for r in replay],
    }
    # Result-bearing sections of the previous artifact carry forward — a
    # regeneration documents new runs, it must never drop committed evidence.
    prev_path = sys.argv[3] if len(sys.argv) > 3 else (out if os.path.exists(out) else None)
    prev = json.load(open(prev_path)) if prev_path else {}
    artifact["divergences_found"] = prev.get("divergences_found", [])
    if "robustness_spot" in prev:
        artifact["robustness_spot"] = prev["robustness_spot"]
    # in_suite counts derived from the spec/generator sources, not typed in
    src = "src/main/scala/graft/fuzz"
    tst = "src/test/scala/graft"
    # kind count = the number of quoted entries in VectorFuzzer.kinds
    with open(f"{src}/VectorFuzzer.scala") as f:
        v_kinds = len(re.findall(r'"\w+"', re.search(
            r'val kinds: Vector\[String\] =\s*Vector\(([^)]*)\)', f.read()).group(1)))
    v_plans = spec_count(f"{tst}/VectorFuzzSpec.scala",
                         r'VectorFuzzer\.plans\(808080L, (\d+)\)', "vector in-suite plans")
    g_plans = spec_count(f"{tst}/GraphFuzzSpec.scala",
                         r'GraphFuzzer\.plans\([0-9]+L?, (\d+)\)', "graph in-suite plans")
    artifact["in_suite"] = (
        "FuzzDifferentialSpec (SQL: determinism + 40 executed plans + partition invariance + the ROLLUP pin), "
        "StreamFuzzSpec (stream: seeded plans incl. interval joins drained green, red-path delay-override "
        "controls for both join polarities, the state-TTL green/red pair, the too-late-admission pin and the "
        f"outer-join late-admission pin), GraphFuzzSpec ({g_plans} plans covering all 12 kernels + dropped-row and "
        f"rank-shift tamper controls), VectorFuzzSpec ({v_plans} plans covering all {v_kinds} kinds + tamper controls on all "
        "three compare classes), ReplayFuzzSpec (12 drained plans covering the restart + HTTP axes + tamper control)")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    total_sql = sum(r["count"] for r in runs)
    print(f"wrote {out}: {len(runs)} SQL runs ({total_sql} plans), "
          f"{len(stream)} stream, {len(graph)} graph, {len(vector)} vector, {len(replay)} replay runs")


if __name__ == "__main__":
    main()
