#!/usr/bin/env python3
"""Cross-engine bench column (dev harness, NOT part of the engine): time
each oracle's DuckDB execution over the same parquet tables the Spark bench
reads, so BASELINE.md can carry measured Spark/DuckDB ratios instead of a
self-referential gate.

Method: per query, one untimed warmup execution then best-of-`reps` timed
executions (fetchall forced — DuckDB is lazy until materialization).
DuckDB here is the single-node reference point: an embedded OLAP engine
with no JVM/codegen overhead, which makes it a demanding baseline for
scan/agg shapes and an inapplicable one for queries whose oracle is a
degenerate recomputation (those are labeled by the caller, not here).

Usage: python3 tools/bench_oracle.py <sfDir> <verifyOutDir> [reps] [benchJson] [> out.json]
Output: one JSON object {"sf_dir":…, "queries": {name: best_sec}, "errors": {...}}

Staged-fair column (round-12 verdict #2): when a Spark bench artifact path
is passed as the 4th arg, its `staged` list — the queries whose SPARK timing
is a read of a warmup-memoized payload while DuckDB recomputes from scratch —
is excluded from a second total, `total_sec_recomputed`, over the remaining
queries. Comparing that against the Spark sum over the same non-staged keys
gives the apples-to-apples ratio; the full totals stay in the artifact with
the caveat machine-readable instead of prose-only.
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, reps=3, bench_json=None):
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times, errors = {}, {}
    for name, sql in sorted(oracle.items()):
        try:
            con.sql(sql).fetchall()  # warmup (I/O cache, catalog)
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
        except Exception as e:
            errors[name] = str(e).split("\n")[0][:200]
    out = {"sf_dir": sf_dir, "reps": reps, "n": len(times),
           "total_sec": round(sum(times.values()), 2),
           "queries": times, "errors": errors}
    if bench_json:
        bench = json.load(open(bench_json))
        staged = set(bench.get("staged", []))
        # Both sums run over the SAME key set: non-staged queries with a
        # valid time in BOTH engines (round-13 ADVICE: summing Spark over
        # v >= 0 while DuckDB kept every non-staged entry let a Spark
        # skip/failure silently deflate the Spark side and flatter the
        # ratio). Excluded names are emitted — the no-silent-caps rule.
        spark_times = bench.get("queries", {})
        both = {k for k in times
                if k not in staged and spark_times.get(k, -1) >= 0}
        dropped = sorted((set(times) - staged) - both)
        out["staged_excluded"] = sorted(staged & set(times))
        out["recomputed_dropped"] = dropped  # non-staged but invalid in Spark
        out["n_recomputed"] = len(both)
        out["total_sec_recomputed"] = round(sum(times[k] for k in both), 2)
        out["spark_total_sec_recomputed"] = round(
            sum(spark_times[k] for k in both), 2)
        if out["total_sec_recomputed"] > 0:
            out["ratio_recomputed"] = round(
                out["spark_total_sec_recomputed"] / out["total_sec_recomputed"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         sys.argv[4] if len(sys.argv) > 4 else None)
