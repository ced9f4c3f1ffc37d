#!/usr/bin/env python3
"""Dev harness mirroring the driver's correctness gate (NOT part of the
engine — the Scala library has no Python/duckdb dependency).

Runs DuckDB over the same parquet tables, executes each oracle SQL from
Verify's oracle_sql.json, and diffs against the parquet the Spark side wrote.
Rows are canonicalized (columns sorted by name, rows sorted, doubles rounded)
before comparison, which is the strictest plausible driver behavior.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import decimal, json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if (not math.isnan(v) and v == 0) else (round(v, 6) if not math.isnan(v) else "NaN")
            elif isinstance(v, decimal.Decimal):
                # scale-preserving, and deliberately distinct from the float
                # repr: a DECIMAL column on one side vs DOUBLE on the other
                # must FAIL here (the round-5 q_decimal_money lesson — see
                # tools/decimal_repro.py for the cast-model sensitivity check)
                v = f"decimal:{v}"
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.sql(sql)
            # The driver compares via pandas (fetchdf), which renders HUGEINT
            # and DECIMAL as float64/object — a dtype family the Spark side
            # can never produce, so rows/schema pass but the hash reds (the
            # round-8 q_stream_window_agg/q_stream_profile failure class).
            # fetchall() below is blind to it (HUGEINT -> Python int), so gate
            # on the declared output types: any sum() over BIGINT must carry
            # an outer CAST(... AS BIGINT) in the oracle SQL.
            bad = [(c, str(t)) for c, t in zip(o.columns, o.types)
                   if any(x in str(t).upper() for x in ("HUGEINT", "DECIMAL"))]
            if bad:
                print(f"FAIL {name}: driver-incompatible oracle output types {bad}: "
                      f"wrap with an outer CAST (e.g. CAST(sum(x) AS BIGINT))")
                n_fail += 1
                continue
            o_rows, o_cols = canon(o.fetchall(), list(o.columns))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_rows, s_cols = canon(s.fetchall(), list(s.columns))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ: oracle={o_cols} spark={s_cols}")
            n_fail += 1
        elif len(o_rows) != len(s_rows):
            print(f"FAIL {name}: row count: oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1
        elif o_rows != s_rows:
            diffs = [(a, b) for a, b in zip(o_rows, s_rows) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (oracle vs spark): {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} with oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
