#!/bin/bash
# Round-16 fuzz regeneration: every committed seed re-run under the current
# grammars (stream 8 kinds incl. chained; vector 7 kinds incl. ivf_pq; SQL
# grammar unchanged but re-run against this round's build) plus one FRESH
# seed per leg (the standing rotation rule). Emits the regen dir the
# assemble_fuzz_artifact.py contract expects: sql.jsonl + sql_compare.log +
# stream.jsonl + graph.jsonl + vector.jsonl.
set -u
D=${1:-/tmp/regen_r16}
mkdir -p "$D"
cd /root/repo

run_sql() { # seed count sfdir
  local seed=$1 count=$2 sf=$3
  local out="/tmp/fuzz_r16_${seed}_$(basename $sf)"
  rm -rf "$out"
  sbt -batch -error "runMain graft.FuzzMain $seed $count /root/testdata/$sf $out" \
    2>"$D/sql_${seed}.err" | grep '"seed"' >> "$D/sql.jsonl"
  echo "seed=$seed sf=$sf $(python3 tools/compare_oracle.py "$out" /root/testdata/$sf 2>>"$D/sql_${seed}.err" | head -1)" \
    >> "$D/sql_compare.log"
  rm -rf "$out"
}

: > "$D/sql.jsonl"; : > "$D/sql_compare.log"
: > "$D/stream.jsonl"; : > "$D/graph.jsonl"; : > "$D/vector.jsonl"
run_sql 20260815 300 sf0.001
run_sql 14141414 300 sf0.01
run_sql 777000777 300 sf0.01
run_sql 424242 200 sf0.1
run_sql 99000099 1000 sf0.01
run_sql 31337 500 sf0.1
run_sql 8151515 500 sf0.01
run_sql 20260816 500 sf0.01
run_sql 20260817 500 sf0.01    # FRESH (round-16 rotation)

# the stream leg (previously missing — the header promised stream.jsonl but
# nothing produced it, so a regeneration would have silently carried a stale
# or absent stream artifact into assemble_fuzz_artifact.py)
sbt -batch -error "runMain graft.StreamFuzzMain 909015 150 /root/testdata/sf0.001"   2>"$D/s1.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 161616 120 /root/testdata/sf0.001"   2>"$D/s2.err" | grep '"seed"' >> "$D/stream.jsonl"
sbt -batch -error "runMain graft.StreamFuzzMain 16077016 120 /root/testdata/sf0.001" 2>"$D/s3.err" | grep '"seed"' >> "$D/stream.jsonl"

sbt -batch -error "runMain graft.GraphFuzzMain 909091 240 6" 2>"$D/g1.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 31415 120 6"  2>"$D/g2.err" | grep '"seed"' >> "$D/graph.jsonl"
sbt -batch -error "runMain graft.GraphFuzzMain 123321 120 6" 2>"$D/g3.err" | grep '"seed"' >> "$D/graph.jsonl"  # FRESH

sbt -batch -error "runMain graft.VectorFuzzMain 505050 105 6" 2>"$D/v1.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 271828 105 6" 2>"$D/v2.err" | grep '"seed"' >> "$D/vector.jsonl"
sbt -batch -error "runMain graft.VectorFuzzMain 161803 105 6" 2>"$D/v3.err" | grep '"seed"' >> "$D/vector.jsonl"  # FRESH

echo "REGEN DONE"
cat "$D/sql_compare.log"
tail -n +1 "$D"/{stream,graph,vector}.jsonl 2>/dev/null | tail -20
