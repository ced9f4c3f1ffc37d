#!/usr/bin/env python3
"""Third-engine spot check (round-14 verdict stretch #7): the differential
oracle rules are tuned against DuckDB's quirks (HUGEINT widening, binary
rounding) — a rule that silently encoded DuckDB-SPECIFIC behavior as
"correct" would be invisible to the two-engine compare. This re-runs a
committed fuzz dump's plans through BOTH DuckDB and stdlib sqlite3 over the
same data and diffs them; Spark already agrees with DuckDB on every dump
(compare_oracle.py), so sqlite agreement closes the triangle.

Only the sqlite-expressible subset runs (sqlite 3.40 lacks GROUPING
SETS/ROLLUP/CUBE/GROUPING(), year(), concat(), reverse(), greatest/least;
everything else the grammar emits — window frames incl. RANGE, FILTER
clauses, RIGHT/FULL joins, IS DISTINCT FROM, correlated scalar subqueries,
CTEs, set ops, NULLS FIRST/LAST — is supported and checked). Timestamps
never reach payloads except via year(), so excluding year() removes the
type entirely and the tables load without their timestamp columns.

Known benign representation differences normalized here, each verified to
be representation-only (not a semantics difference):
  - integer division: both engines' / on two INTEGERs truncates identically
    (sqlite) vs DuckDB's float division — the grammar never emits bare /,
    only %, so no rule needed;
  - sqlite has no BIGINT-vs-HUGEINT split: all integers are 64-bit, so the
    CAST(SUM(..) AS BIGINT) rule is a no-op there (exactly the point: the
    rule exists FOR DuckDB, and results still agree).

Usage: sqlite_spot.py <fuzzDumpDir> <sfDir> [maxPlans]
  <fuzzDumpDir> must contain oracle_sql.json (a FuzzMain output dir).
Exit 1 on any divergence.
"""
import json
import sqlite3
import sys

import duckdb
import pandas as pd

UNSUPPORTED = ("ROLLUP", "CUBE", "GROUPING", "year(", "concat(",
               "reverse(", "greatest(", "least(")

TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents"]
DROP_COLS = {"ts", "o_orderdate", "l_shipdate", "text", "props", "embedding"}


def load_sqlite(sf_dir):
    con = sqlite3.connect(":memory:")
    dk = duckdb.connect()
    for t in TABLES:
        df = dk.sql(f"SELECT * FROM '{sf_dir}/{t}.parquet'").fetchdf()
        df = df[[c for c in df.columns if c not in DROP_COLS]]
        df.to_sql(t, con, index=False)
    return con


def load_duckdb(sf_dir):
    dk = duckdb.connect()
    for t in TABLES:
        dk.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return dk


def canon(df):
    """Column-name-sorted, float-rounded, row-sorted frame — the
    compare_oracle.py convention."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            # sqlite returns ints for COUNT even when duckdb says int32 etc.
            pass
    return df.sort_values(by=list(df.columns), na_position="first") \
             .reset_index(drop=True)


def main():
    dump_dir, sf_dir = sys.argv[1], sys.argv[2]
    max_plans = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    with open(f"{dump_dir}/oracle_sql.json") as f:
        plans = json.load(f)
    lite = load_sqlite(sf_dir)
    duck = load_duckdb(sf_dir)
    ran, ok, bad, skipped = 0, 0, [], 0
    for name, sql in plans.items():
        if ran >= max_plans:
            break
        if any(u in sql for u in UNSUPPORTED):
            skipped += 1
            continue
        try:
            lf = pd.read_sql_query(sql, lite)
        except Exception as e:
            # sqlite parse/feature gap, not a divergence — record and move on
            print(f"SKIP {name}: sqlite cannot run it: {str(e)[:120]}")
            skipped += 1
            continue
        ran += 1
        df = duck.sql(sql).fetchdf()
        a, b = canon(lf), canon(df)
        if len(a) != len(b):
            bad.append((name, f"rows {len(a)} vs {len(b)}"))
            continue
        try:
            # align dtypes family-wise: sqlite loses widths, so compare values
            b.columns = a.columns
            same = True
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    import numpy as np
                    same &= bool(np.allclose(av.astype(float).fillna(1e308),
                                             bv.astype(float).fillna(1e308),
                                             rtol=1e-6, atol=1e-6))
                else:
                    same &= av.astype(object).where(pd.notna(av), None) \
                        .equals(bv.astype(object).where(pd.notna(bv), None))
            if not same:
                bad.append((name, "value mismatch"))
                continue
        except Exception as e:
            bad.append((name, f"compare error: {e}"))
            continue
        ok += 1
        print(f"OK   {name}")
    for name, why in bad:
        print(f"BAD  {name}: {why}")
    print(f"ran={ran} ok={ok} bad={len(bad)} skipped={skipped}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
