#!/usr/bin/env bash
# Smoke check for the QA-eval plumbing (EVAL.md): 3 synthetic MC samples on
# the tiny model, no checkpoints or datasets needed. Validates video decode
# -> chat template -> grouped prefill+pruning -> answer extraction -> report.
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
import json, tempfile, os
from quickvideo_tpu.video import quickdecode as qd
from quickvideo_tpu.api import LVU
from quickvideo_tpu.config import LVUConfig
from quickvideo_tpu.evaluation.qa import QASample, run_qa_eval

video = os.path.join(tempfile.gettempdir(), "qa_smoke.mp4")
if not os.path.exists(video):
    qd.encode_test_video(video, width=112, height=112, nframes=32, fps=8, gop=16)
samples = [
    QASample(video=video, question=f"Q{i}: what is shown?",
             options=["A. x", "B. y", "C. z", "D. w"], answer="A", id=str(i))
    for i in range(3)
]
lvu = LVU(LVUConfig(
    model_name_or_path="tiny", model_type="qwen25_lvu",
    video_group_size=4, top_k=16, num_frames=8,
    max_decode_tokens=8, dtype="float32",
))
report = run_qa_eval(lvu, samples, max_new_tokens=4)
print(json.dumps(report if isinstance(report, dict) else report.__dict__, default=str))
PY
