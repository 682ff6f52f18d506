#!/bin/bash
# One gate-slope TRIO (1x/10x/100x) plus a trailing 1x window-anchor
# re-run: accepts the set only if every leg's stream-phase steal is
# clean AND the two 1x readings agree within ANCHOR_TOL (the host's
# non-steal throttling shows up as anchor drift even when steal ticks
# read clean). Appends accepted legs to $OUT; exits 0 on acceptance.
set -u
OUT=${OUT:-/tmp/gate_trio.jsonl}
ANCHOR_TOL=${ANCHOR_TOL:-0.15}
TRIES=${TRIES:-3}
BENCH_ENV=(SPARK_GRAFT_INGEST_BATCHES=4 SPARK_GRAFT_DELTA_BOUND=5000 \
  SPARK_GRAFT_CPUS=32)

run_leg() { # dir -> JSON line (or empty)
  env "${BENCH_ENV[@]}" SPARK_GRAFT_SF_DIR="$1" ${EXTRA_ENV:-} \
    sbt -batch "runMain graft.GateIngestBench" 2>&1 \
    | grep -E '^\{"metric"' | tail -1
}

val() { python3 -c "import json,sys; print(json.loads(sys.argv[1])['$2'])" "$1"; }

clean() { # JSON -> 0 if stream steal < 2.5% of stream capacity
  python3 -c "
import json,sys
j=json.loads(sys.argv[1])
ok = j.get('steal_stream',0) <= 0.025*j['wall_sec']*32*100
sys.exit(0 if ok else 1)" "$1"
}

for t in $(seq 1 "$TRIES"); do
  a1=$(run_leg /root/testdata/sf0.1); echo "[trio] 1x: $a1" >&2
  [ -n "$a1" ] && clean "$a1" || { echo "[trio] 1x dirty, retry" >&2; continue; }
  b=$(run_leg /tmp/scale10); echo "[trio] 10x: $b" >&2
  [ -n "$b" ] && clean "$b" || { echo "[trio] 10x dirty, retry" >&2; continue; }
  c=$(run_leg /tmp/scale100); echo "[trio] 100x: $c" >&2
  [ -n "$c" ] && clean "$c" || { echo "[trio] 100x dirty, retry" >&2; continue; }
  a2=$(run_leg /root/testdata/sf0.1); echo "[trio] 1x anchor: $a2" >&2
  [ -n "$a2" ] && clean "$a2" || { echo "[trio] anchor dirty, retry" >&2; continue; }
  drift=$(python3 -c "
import json,sys
v1=json.loads(sys.argv[1])['value']; v2=json.loads(sys.argv[2])['value']
print(abs(v2-v1)/v1)" "$a1" "$a2")
  if python3 -c "import sys; sys.exit(0 if float('$drift') <= $ANCHOR_TOL else 1)"; then
    for l in "$a1" "$b" "$c" "$a2"; do echo "$l" >> "$OUT"; done
    echo "[trio] ACCEPTED (anchor drift $drift)" >&2
    exit 0
  fi
  echo "[trio] anchor drift $drift > $ANCHOR_TOL — window moved, retry" >&2
done
echo "[trio] no stable window in $TRIES tries" >&2
exit 1
