#!/bin/bash
# Round-5 TPU measurement queue — run when the tunnel chip is reachable.
# ONE process may hold the TPU at a time; steps run sequentially with a
# release gap. Logs land in /tmp/r5_*.log; bench JSON lines in /tmp/r5_*.json.
#
# Round-5 deltas vs round 4: fused dual-GEMM+SwiGLU+quantize vision MLP
# (-7.5 ms/group measured at the strict shape), kv_cache_dtype=auto
# (bf16 at demo scale, int8 at hour scale), and the strict-resize hour row
# the round-4 verdict asked for (textured fixture, reference-exact resize).
set -u
cd "$(dirname "$0")/.."
GAP="${GAP:-45}"

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  /usr/bin/timeout 5400 env "$@" > "/tmp/r5_${name}.json" 2> "/tmp/r5_${name}.log"
  echo "--- exit=$? tail:"
  tail -3 "/tmp/r5_${name}.json"
  sleep "$GAP"
}

# 1. strict (reference-exact resize) 7B first-token headline
step strict BENCH_RUNS=3 python bench.py

# 2. the apples-to-apples FULL 128-token demo protocol (spans exactly what
#    the reference's 27.65 s spans)
step strict_128 BENCH_MAX_NEW=128 BENCH_RUNS=2 python bench.py

# 3. STRICT-RESIZE hour-long 3600-frame 7B (round-4 verdict item 2: the
#    textured fixture with reference-exact resize; kv auto resolves int8
#    at 2^17 slots)
step hour_strict BENCH_FRAMES=3600 BENCH_SOURCE=textured448 \
  BENCH_CAP_LOG2=17 BENCH_RUNS=2 BENCH_ATTRIBUTION=0 python bench.py

# 4. decode ms/token at the headline occupancy (single-dispatch protocol —
#    no per-chunk fetch; see benchmarks/decode_ablation_probe.py)
step decode python benchmarks/decode_ablation_probe.py 43000

echo "done — see /tmp/r5_*.json"
