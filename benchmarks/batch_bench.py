"""Batched-QA throughput probe: B questions on one decoded video — the
shared-prefill/cache-fork batch engine vs B sequential single-request
runs. Real 3B shapes, 512-frame video."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from quickvideo_tpu.api import LVU
from quickvideo_tpu.config import LVUConfig
from quickvideo_tpu.engines.qwen25 import _fetch_frames
from quickvideo_tpu.prefill.batch import BatchedQAEngine
from quickvideo_tpu.tokenization import build_chat_ids
from quickvideo_tpu.utils.timing import SpanTimer
from quickvideo_tpu.video import quickdecode as qd
from quickvideo_tpu.video import reader as vreader

FRAMES = int(os.environ.get("BB_FRAMES", 512))
B = int(os.environ.get("BB_B", 4))
NEW = int(os.environ.get("BB_NEW", 16))

QUESTIONS = [
    "Describe this video in detail.",
    "What is the dominant color pattern across the clip?",
    "Summarize any motion you observe.",
    "Does the scene change over time? Answer yes or no and explain briefly.",
][:B]


def main():
    path = "/tmp/batch_bench_clip.mp4"
    if not os.path.exists(path):
        qd.encode_test_video(
            path, width=448, height=448, nframes=FRAMES, fps=24, gop=48
        )
    cfg = LVUConfig(
        model_name_or_path="qwen25-vl-3b",
        model_type="qwen25_lvu",
        video_group_size=32,
        top_p=0.5,
        num_frames=FRAMES,
        max_decode_tokens=NEW,
        kv_cache_capacity=1 << 15,
        align_resize_to_window=True,
        decode_output="yuv420",
        dtype="bfloat16",
    )
    lvu = LVU(cfg)
    timer = SpanTimer()
    frames, plan, native_hw = _fetch_frames(lvu, path, timer)
    n_vid = sum(plan.tokens_per_group)
    reqs = [
        vreader.build_prefill_inputs_from_frames(
            frames, plan,
            build_chat_ids(lvu.tokenizer, lvu.model_config, q, n_vid),
            native_hw=native_hw,
        )
        for q in QUESTIONS
    ]
    eos = [lvu.tokenizer.eos_token_id]

    # sequential: warm then timed
    lvu.engine.generate(reqs[0], max_new_tokens=NEW, eos_token_ids=eos)
    t0 = time.perf_counter()
    for r in reqs:
        lvu.engine.generate(r, max_new_tokens=NEW, eos_token_ids=eos)
    seq_s = time.perf_counter() - t0

    beng = BatchedQAEngine(lvu.engine)
    beng.generate_batch(reqs, NEW, eos_token_ids=eos)  # warm
    t0 = time.perf_counter()
    beng.generate_batch(reqs, NEW, eos_token_ids=eos)
    bat_s = time.perf_counter() - t0

    print(f"frames={FRAMES} B={B} new={NEW}")
    print(f"sequential: {seq_s:.2f}s total, {seq_s/B:.2f}s/question")
    print(f"batched:    {bat_s:.2f}s total, {bat_s/B:.2f}s/question "
          f"({seq_s/bat_s:.2f}x)")


if __name__ == "__main__":
    main()
