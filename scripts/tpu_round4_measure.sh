#!/bin/bash
# Round-4 TPU measurement queue — run when the tunnel chip is reachable.
# ONE process may hold the TPU at a time; each step waits for the previous
# to fully exit plus a release gap. Logs land in /tmp/r4_*.log; bench JSON
# lines in /tmp/r4_*.json.
#
# Order: the round-4 headline (strict reference-exact resize, VERDICT item 1)
# first, then the secondary/trade rows, then the long hour-scale protocols.
set -u
cd "$(dirname "$0")/.."
GAP="${GAP:-45}"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  /usr/bin/timeout 5400 env "$@" > "/tmp/r4_${name}.json" 2> "/tmp/r4_${name}.log"
  echo "--- exit=$? tail:"
  tail -3 "/tmp/r4_${name}.json"
  sleep "$GAP"
}

# 1. strict (reference-exact resize) 7B — THE headline (bench.py default now)
step strict BENCH_RUNS=3 python bench.py

# 2. aligned 7B (window-aligned resize — labeled secondary row)
step aligned BENCH_ALIGN=1 BENCH_RUNS=2 python bench.py

# 3. int8-KV at the strict shape (VERDICT item 7: measure + state the trade)
step strict_i8kv BENCH_KV_DTYPE=int8 BENCH_RUNS=2 python bench.py

# 4. hour-long 3600-frame 7B (r2 protocol: flat448 source, int8 KV, 2^17;
#    int8 activations are now default — target <=20 s, reference README.md:44)
step hour BENCH_FRAMES=3600 BENCH_SOURCE=flat448 BENCH_KV_DTYPE=int8 \
  BENCH_CAP_LOG2=17 BENCH_ALIGN=1 BENCH_RUNS=2 BENCH_ATTRIBUTION=0 python bench.py

# 5. hour-long B-frame movie e2e (decode-bound protocol; non-ref skip engaged)
step movie_bframe python benchmarks/movie_bench.py --seconds 3600 --bframes 2 \
  --runs 2

echo "done — see /tmp/r4_*.json"
