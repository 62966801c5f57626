#!/usr/bin/env bash
# Baseline arm (reference lvu/scripts/timing_baseline.sh): native decoder
# disabled is meaningless here (it IS the framework decoder), so baseline =
# sync engine, no grouping (video_group_size 0 -> single group), no pruning.
set -euo pipefail
cd "$(dirname "$0")/.."
VIDEO=${1:?usage: timing_baseline.sh VIDEO [RUNS]}
RUNS=${2:-10}
for i in $(seq "$RUNS"); do
  python -m quickvideo_tpu.lvu_cli \
    --model_name_or_path "${MODEL:-qwen25-vl-3b}" \
    --model_type qwen25_lvu \
    --video_path "$VIDEO" --fps 1 \
    --video_group_size 0 --top_p -1 \
    --max_new_tokens 16 --json
done
