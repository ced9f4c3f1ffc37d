#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

For every query dumped by graft.Verify, runs the matching oracle SQL in
DuckDB over the same parquet tables and compares:
  - row count
  - values (rows sorted by all columns, column order = sorted names)
  - pandas dtypes (int64-vs-float64 is a hash mismatch driver-side even
    when every value agrees — e.g. DuckDB sum(BIGINT) widening to HUGEINT
    comes back as float64; CORRECTNESS_r04's one red row)
Queries with no oracle entry are listed as no_oracle.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(outdir)
                    if os.path.isdir(f"{outdir}/{d}"))
    bad, no_oracle, ok = [], [], 0
    for name in dumped:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            bad.append((name, "no parquet written (query failed?)"))
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        if name not in oracles:
            no_oracle.append((name, len(spark)))
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}"))
            continue
        if len(spark) != len(oracle):
            bad.append((name, f"rows {len(spark)} vs oracle {len(oracle)}"))
            continue
        cols = sorted(oracle.columns)
        if sorted(spark.columns) != cols:
            bad.append((name, f"cols {sorted(spark.columns)} vs {cols}"))
            continue
        s = spark[cols].copy()
        o = oracle[cols].copy()
        # Dtype families must agree (int64-vs-float64 was CORRECTNESS_r04's
        # one red row), but width within a family must not: the driver
        # hashed float32-vs-float64 `cos` columns green in r04, so flagging
        # those here would be a local-only false positive. Upcast floats to
        # float64 and compare at 6 significant-ish digits.
        def fam(dt):
            k = str(dt)
            return ("float" if k.startswith("float")
                    else "int" if k.startswith("int") or k.startswith("uint")
                    else k)
        dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in cols
              if fam(s[c].dtype) != fam(o[c].dtype)]
        if dt:
            bad.append((name, f"dtype mismatch {dt}"))
            continue
        # round BEFORE sorting: sorting on raw floats then rounding lets a
        # cross-engine near-tie (0.4999999 vs 0.5000001) order rows
        # differently on the two sides and report a false mismatch after
        # both round to the same value
        for c in cols:
            if fam(s[c].dtype) == "float":
                s[c] = s[c].astype("float64").round(6)
                o[c] = o[c].astype("float64").round(6)
        s = s.sort_values(cols).reset_index(drop=True)
        o = o.sort_values(cols).reset_index(drop=True)
        neq = (s != o) & ~(s.isna() & o.isna())
        if neq.any().any():
            n = int(neq.any(axis=1).sum())
            bad.append((name, f"{n} mismatched rows"))
            continue
        ok += 1
    print(f"ok={ok} no_oracle={len(no_oracle)} bad={len(bad)} "
          f"dumped={len(dumped)} oracles={len(oracles)}")
    for name, nrows in no_oracle:
        flag = "  <-- ZERO ROWS" if nrows == 0 else ""
        print(f"  no_oracle {name} rows={nrows}{flag}")
    for name, why in bad:
        print(f"  BAD {name}: {why}")
    # An oracle with no dumped result means the Spark side never executed
    # (Verify/FuzzMain caught a failure) — that is a FAILURE of the compare
    # surface, not an informational footnote: exiting 0 here let a fuzz or
    # verify round read green while a plan silently never ran (round-14
    # review catch; the no-silent-caps rule).
    missing_dump = sorted(set(oracles) - set(dumped))
    if missing_dump:
        print(f"  ORACLE-WITHOUT-DUMP (Spark side never produced a result): "
              f"{missing_dump}")
    return 1 if bad or missing_dump else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
