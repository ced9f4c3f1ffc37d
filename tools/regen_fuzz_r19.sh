#!/bin/bash
# Round-19 fuzz regeneration. No grammar deltas this round - every committed
# seed re-runs under the current build (near-dup bound internals changed:
# jaccard-truth artifact, incremental single-pass bound; LPA cut cadence;
# the fuzz generators themselves are untouched), plus the r19 rotation
# seed per leg (strictly-growing seed lists, round-15 standing rule). Grammar deltas this round: the STREAM generator
# grew a TTL axis on the profile kind (StreamPlan.ttlSec, drawn LAST so every
# earlier field of the committed plans is unchanged) and the interval_outer
# compare's band normalization now removes AT MOST ONE pad per in-band a_id
# (duplicate pads red). Every committed seed re-runs on EVERY leg under the
# current build (the r17 convention — the artifact records runs of the
# current binaries, never carried rows), plus one FRESH rotation seed per leg
# (round-18 verdict #7: seed lists strictly grow on all five legs).
#
# THIRD-ENGINE STEP (round-18 verdict #6, standing rule made unskippable):
# the sqlite spot re-closes the DuckDB/sqlite/Spark triangle on the current
# 21-kind SQL grammar — it runs INSIDE this script so a grammar change that
# regenerates fuzz evidence cannot skip it again (round 17 did).
#
# Emits the regen dir assemble_fuzz_artifact.py expects: sql.jsonl +
# sql_compare.log + stream.jsonl + graph.jsonl + vector.jsonl + replay.jsonl,
# plus sqlite_spot.log for bench_runs/sqlite_spot_r19.json.
set -u
D=${1:-/tmp/regen_r19}
mkdir -p "$D"
cd /root/repo

run_sql() { # seed count sfdir [keepDir]
  local seed=$1 count=$2 sf=$3 keep=${4:-}
  local out="/tmp/fuzz_r19_${seed}_$(basename $sf)"
  rm -rf "$out"
  sbt -batch -error "runMain graft.FuzzMain $seed $count /root/testdata/$sf $out" \
    2>"$D/sql_${seed}.err" | grep '"seed"' >> "$D/sql.jsonl"
  echo "seed=$seed sf=$sf $(python3 tools/compare_oracle.py "$out" /root/testdata/$sf 2>>"$D/sql_${seed}.err" | head -1)" \
    >> "$D/sql_compare.log"
  if [ -n "$keep" ]; then rm -rf "$keep"; cp -r "$out" "$keep"; fi
  rm -rf "$out"
}

: > "$D/sql.jsonl"; : > "$D/sql_compare.log"
: > "$D/stream.jsonl"; : > "$D/graph.jsonl"; : > "$D/vector.jsonl"; : > "$D/replay.jsonl"

# SQL: all committed seeds + the FRESH r18 rotation seed (kept for sqlite)
run_sql 20260815 300 sf0.001
run_sql 14141414 300 sf0.01
run_sql 777000777 300 sf0.01
run_sql 424242 200 sf0.1
run_sql 99000099 1000 sf0.01
run_sql 31337 500 sf0.1
run_sql 8151515 500 sf0.01
run_sql 20260816 500 sf0.01
run_sql 20260817 500 sf0.01
run_sql 20260818 500 sf0.01
run_sql 20260819 500 sf0.01
run_sql 20260820 500 sf0.01 "$D/sqlite_dump"   # FRESH (r19 rotation)

# sqlite third-engine triangle on the 21-kind grammar (expressible subset)
python3 tools/sqlite_spot.py "$D/sqlite_dump" /root/testdata/sf0.01 60 \
  > "$D/sqlite_spot.log" 2>&1 || { echo "SQLITE SPOT FAILED"; tail -5 "$D/sqlite_spot.log"; exit 1; }
tail -1 "$D/sqlite_spot.log"

# STREAM: full committed-seed re-run under the TTL'd grammar + one FRESH
sbt -batch -error "runMain graft.StreamFuzzMain 909015 150 /root/testdata/sf0.001"   2>"$D/s1.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 161616 120 /root/testdata/sf0.001"   2>"$D/s2.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 16077016 120 /root/testdata/sf0.001" 2>"$D/s3.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 17100 120 /root/testdata/sf0.001"    2>"$D/s4.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 18200 120 /root/testdata/sf0.001"    2>"$D/s5.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 19300 120 /root/testdata/sf0.001"    2>"$D/s6.err" | grep '"seed"' >> "$D/stream.jsonl"  # FRESH (r19 rotation)

# GRAPH: per-round re-run + FRESH
sbt -batch -error "runMain graft.GraphFuzzMain 909091 240 6" 2>"$D/g1.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 31415 120 6"  2>"$D/g2.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 123321 120 6" 2>"$D/g3.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 232425 120 6" 2>"$D/g4.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 181818 120 6" 2>"$D/g5.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 191919 120 6" 2>"$D/g6.err" | grep '"seed"' >> "$D/graph.jsonl"  # FRESH (r19 rotation)

# VECTOR: committed seeds + FRESH
sbt -batch -error "runMain graft.VectorFuzzMain 505050 105 6" 2>"$D/v1.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 271828 105 6" 2>"$D/v2.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 161803 105 6" 2>"$D/v3.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 414243 105 6" 2>"$D/v4.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 515253 105 6" 2>"$D/v5.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 616263 105 6" 2>"$D/v6.err" | grep '"seed"' >> "$D/vector.jsonl"  # FRESH (r19 rotation)

# REPLAY: committed seeds + FRESH
sbt -batch -error "runMain graft.ReplayFuzzMain 17003 40 6"  2>"$D/r1.err" | grep '"seed"' >> "$D/replay.jsonl"
sbt -batch -error "runMain graft.ReplayFuzzMain 424243 40 6" 2>"$D/r2.err" | grep '"seed"' >> "$D/replay.jsonl"
sbt -batch -error "runMain graft.ReplayFuzzMain 181001 40 6" 2>"$D/r3.err" | grep '"seed"' >> "$D/replay.jsonl"
sbt -batch -error "runMain graft.ReplayFuzzMain 191001 40 6" 2>"$D/r4.err" | grep '"seed"' >> "$D/replay.jsonl"  # FRESH (r19 rotation)

echo "REGEN DONE"
cat "$D/sql_compare.log"
tail -n +1 "$D"/{stream,graph,vector,replay}.jsonl 2>/dev/null | tail -30
