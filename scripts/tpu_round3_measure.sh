#!/bin/bash
# Round-3 TPU measurement queue — run when the tunnel chip is reachable.
# ONE process may hold the TPU at a time; each step waits for the previous
# to fully exit plus a release gap. Logs land in /tmp/r3_*.log; bench JSON
# lines in /tmp/r3_*.json.
set -u
cd "$(dirname "$0")/.."
GAP="${GAP:-45}"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  /usr/bin/timeout 3000 env "$@" > "/tmp/r3_${name}.json" 2> "/tmp/r3_${name}.log"
  echo "--- exit=$? tail:"
  tail -3 "/tmp/r3_${name}.json"
  sleep "$GAP"
}

# 1. strict (reference-exact resize) 7B — the VERDICT item-1 number
step strict BENCH_ALIGN=0 BENCH_RUNS=3 python bench.py

# 2. aligned 7B (round-2 headline protocol, for the delta)
step aligned BENCH_ALIGN=1 BENCH_RUNS=2 python bench.py

# 3. hour-long 3600-frame 7B (r2 protocol: flat448 source, int8 KV, 2^17)
step hour BENCH_FRAMES=3600 BENCH_SOURCE=flat448 BENCH_KV_DTYPE=int8 \
  BENCH_CAP_LOG2=17 BENCH_ALIGN=1 BENCH_RUNS=2 BENCH_ATTRIBUTION=0 python bench.py

echo "done — see /tmp/r3_*.json"
