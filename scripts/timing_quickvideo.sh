#!/usr/bin/env bash
# QuickVideo arm (reference lvu/scripts/timing_quickvideo.sh): batch decode +
# grouped prefill (group 32) + key-norm rho=0.5 pruning.
set -euo pipefail
cd "$(dirname "$0")/.."
VIDEO=${1:?usage: timing_quickvideo.sh VIDEO [RUNS]}
RUNS=${2:-10}
export QUICKCODEC_CORES=${QUICKCODEC_CORES:-16}
for i in $(seq "$RUNS"); do
  python -m quickvideo_tpu.lvu_cli \
    --model_name_or_path "${MODEL:-qwen25-vl-3b}" \
    --model_type qwen25_lvu \
    --video_path "$VIDEO" --fps 1 \
    --video_group_size 32 --top_p 0.5 \
    --max_new_tokens 16 --json
done
