"""Multi-turn chat latency: incremental KV reuse vs per-turn re-prefill.

The reference re-runs the whole decode+prefill for every conversation turn;
ChatSession keeps the pruned video cache resident and appends only each
follow-up's question tokens. This bench asks N questions about one
1024-frame video and prints per-turn wall-clock.

Usage: python benchmarks/chat_session_bench.py [--turns 4]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--model", default="qwen25-vl-7b")
    ap.add_argument("--param-dtype", default="int8")
    ap.add_argument("--max-new", type=int, default=32)
    args = ap.parse_args()

    from quickvideo_tpu.api import LVU
    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.video import quickdecode as qd

    video = os.path.join(
        tempfile.gettempdir(), f"bench_{args.frames}f.mp4"
    )
    if not os.path.exists(video):
        qd.encode_test_video(
            video, width=448, height=448, nframes=args.frames, fps=24, gop=48
        )

    lvu = LVU(LVUConfig(
        model_name_or_path=args.model,
        model_type="qwen25_lvu_interleaved",
        video_group_size=32,
        top_p=0.5,
        num_frames=args.frames,
        max_decode_tokens=max(args.max_new, 32),
        kv_cache_capacity=1 << 16,
        decode_output="yuv420",
        align_resize_to_window=True,
        dtype="bfloat16",
        param_dtype=args.param_dtype,
    ))
    # warmup: compile everything on a throwaway session
    s0 = lvu.start_chat(video)
    s0.ask("warmup", max_new_tokens=2)
    s0.ask("again", max_new_tokens=2)
    del s0

    session = lvu.start_chat(video)
    questions = [
        "Describe this video.",
        "What changes over time?",
        "Summarize the color palette.",
        "Anything unusual near the end?",
    ] * ((args.turns + 3) // 4)
    per_turn = []
    for i, q in enumerate(questions[: args.turns]):
        t0 = time.perf_counter()
        session.ask(q, max_new_tokens=args.max_new)
        per_turn.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({
        "metric": (
            f"multi-turn chat per-turn wall-clock, {args.frames}-frame "
            f"video, {args.model} {args.param_dtype} weights, "
            f"{args.max_new} new tokens/turn (turn 1 = full video "
            f"prefill; turns 2+ = incremental KV reuse)"
        ),
        "per_turn_s": per_turn,
        "turn1_s": per_turn[0],
        "followup_avg_s": round(
            sum(per_turn[1:]) / max(1, len(per_turn) - 1), 2
        ),
    }))


if __name__ == "__main__":
    main()
