"""Hour-long 1080p end-to-end protocol (VERDICT r1 item 3).

The reference's e2e timing scripts run a 90-min 1080p BluRay movie through
the interleaved engine 10 times (reference lvu/scripts/timing_*.sh,
lvu/lvu.py demo protocol). This bench synthesizes a textured 1080p movie
(dense residuals — the decode-stressed analogue available offline; cached in
/tmp), samples it at 1 fps, and runs the full overlapped pipeline:
native interval decode + in-decoder LANCZOS resize -> streaming groups ->
grouped prefill with rho=0.5 key-norm pruning -> first token.

It also times the SAME decode+resize workload standalone (sequential
1-thread and threaded batch) so the overlap win is quantified: e2e should
sit near max(decode, prefill), not their sum.

Usage:
  python benchmarks/movie_bench.py [--seconds 3600] [--fps 12]
      [--model qwen25-vl-7b] [--param-dtype int8] [--video PATH] [--runs 2]
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


def log(msg):
    print(f"[movie {time.time() % 10000:.1f}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=3600)
    ap.add_argument("--fps", type=int, default=12)  # fixture encode fps
    ap.add_argument("--model", default="qwen25-vl-7b")
    ap.add_argument("--param-dtype", default="int8")
    ap.add_argument("--video", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--group", type=int, default=32)
    # bframes>0 synthesizes a BluRay-like GOP structure (I/P/B): the decoder's
    # non-reference-frame skipping (round 3) only has work to drop on B-frame
    # content, which is what real movies are.
    ap.add_argument("--bframes", type=int, default=0)
    ap.add_argument("--decode-only", action="store_true")
    args = ap.parse_args()

    from quickvideo_tpu.video import quickdecode as qd

    if args.video:
        video = args.video
    else:
        suffix = f"_b{args.bframes}" if args.bframes else ""
        video = os.path.join(
            tempfile.gettempdir(),
            f"movie_tex_{args.seconds}s_{args.fps}fps_1080p{suffix}.mp4",
        )
        if not os.path.exists(video):
            log(f"synthesizing {args.seconds}s 1080p textured movie "
                f"({args.seconds * args.fps} frames; one-time, cached)")
            t0 = time.time()
            qd.encode_textured_video(
                video, width=1920, height=1080,
                nframes=args.seconds * args.fps, fps=args.fps, gop=48,
                bframes=args.bframes,
            )
            log(f"fixture ready in {time.time()-t0:.0f}s "
                f"({os.path.getsize(video)/1e6:.0f} MB)")

    # --- standalone decode arms (same 1-fps sampling + in-decoder resize) ---
    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.video.reader import open_reader, plan_from_reader

    cfg_probe = LVUConfig(
        model_name_or_path=args.model, num_frames=args.seconds,
        video_group_size=args.group,
    )
    name, reader = open_reader(video, 16)
    plan = plan_from_reader(reader, cfg_probe)
    reader.close()
    idx = plan.indices.tolist()
    rh, rw = plan.resized_height, plan.resized_width

    def decode_batch(threads):
        vr = qd.VideoReader(video, num_threads=threads)
        vr.height, vr.width = rh, rw
        vr.interpolation = "LANCZOS"
        t0 = time.perf_counter()
        batch = vr.get_batch(idx)
        dt = time.perf_counter() - t0
        vr.close()
        assert batch.shape[0] == len(idx)
        return dt

    decode_seq_s = decode_batch(1)
    log(f"sequential 1-thread decode+resize of {len(idx)} frames: "
        f"{decode_seq_s:.1f}s")
    decode_mt_s = decode_batch(int(os.environ.get("QUICKCODEC_CORES", "16")))
    log(f"threaded batch decode+resize: {decode_mt_s:.1f}s "
        f"(1-core host: thread scaling not demonstrable)")
    if args.decode_only:
        print(json.dumps({
            "metric": f"decode+resize {len(idx)} frames 1080p->{rw}x{rh}",
            "sequential_s": round(decode_seq_s, 2),
            "threaded_s": round(decode_mt_s, 2),
        }))
        return

    # --- full e2e through the overlapped engine ---
    from quickvideo_tpu.api import LVU

    cfg = LVUConfig(
        model_name_or_path=args.model,
        model_type="qwen25_lvu_interleaved",
        video_group_size=args.group,
        top_p=0.5,
        top_k_predict_type="key_norms_small",
        num_frames=args.seconds,  # 1 fps over the whole duration
        max_decode_tokens=16,
        kv_cache_capacity=1 << int(os.environ.get("MOVIE_CAP_LOG2", "17")),
        kv_cache_dtype="int8",
        decode_output="yuv420",
        align_resize_to_window=os.environ.get("BENCH_ALIGN", "1") == "1",
        decode_threads=int(os.environ.get("QUICKCODEC_CORES", "16")),
        dtype="bfloat16",
        param_dtype=args.param_dtype,
    )
    t0 = time.time()
    lvu = LVU(cfg)
    log(f"LVU init {time.time()-t0:.1f}s")
    t0 = time.time()
    # short warmup (decode dominates this protocol; the full-length
    # L-dependent programs compile during run 1, which best-of absorbs)
    lvu.generate("warmup", video, max_new_tokens=2,
                 num_frames=4 * args.group)
    log(f"warmup {time.time()-t0:.1f}s")
    best = None
    for i in range(args.runs):
        lvu.generate("Describe this video.", video, max_new_tokens=1)
        r = lvu.last_result
        log(f"run {i+1}/{args.runs}: e2e {r.timings['e2e']:.1f}s "
            f"(frame_fetch span {r.timings.get('frame_fetch', 0):.1f}s)")
        if best is None or r.timings["e2e"] < best.timings["e2e"]:
            best = r
    print(json.dumps({
        "metric": (
            f"hour-long 1080p e2e through first token ({args.seconds}s movie,"
            f" bframes={args.bframes},"
            f" 1 fps, {args.model} {args.param_dtype}-weights, interleaved,"
            f" rho=0.5, int8 KV)"
        ),
        "value": round(best.timings["e2e"], 2),
        "unit": "s",
        "decode_seq_standalone_s": round(decode_seq_s, 2),
        "decode_threaded_standalone_s": round(decode_mt_s, 2),
        "prefill_tokens": int(best.prefill_tokens),
        "timings": {k: round(v, 2) for k, v in best.timings.items()},
    }))


if __name__ == "__main__":
    main()
