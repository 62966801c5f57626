"""CPU decode microbenchmarks — the reference's three protocols
(reference timing.py, sparsity_timing.py, video_length_timings.py):

  threads   — decode wall time vs thread count {2,4,8,16,32}, 448x448 out,
              1-fps sampling, 5 runs with 95% CI (timing.py:17-99)
  sparsity  — sample interval {1,2,4,8,16} s (sparsity_timing.py:21-123)
  duration  — video length scaling at fixed threads
              (video_length_timings.py:30-129)

The reference benches deepcodec vs torchcodec vs decord; decord/torchcodec
are not in this environment, so arms are QuickDecode batch vs QuickDecode
single-thread (the sequential baseline the 2-3x claim is against,
reference README.md:48-50) vs QuickDecode interleaved streaming — plus an
independent third-party arm: OpenCV VideoCapture (FFmpeg-backed, sequential
grab/retrieve + LANCZOS4 resize), playing the role decord plays in the
reference protocol (reference timing.py:30-42).

Usage: python benchmarks/decode_bench.py [threads|sparsity|duration] \
           [--video PATH] [--runs 5]
Without --video a synthetic fixture is generated (mpeg4; for real-codec
numbers point --video at an h264 movie).
"""

import argparse
import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from quickvideo_tpu.video import quickdecode as qd  # noqa: E402


def ci95(xs):
    if len(xs) < 2:
        return 0.0
    return 1.96 * statistics.stdev(xs) / math.sqrt(len(xs))


def run_batch(path, threads, indices, out_hw=(448, 448)):
    vr = qd.VideoReader(path, num_threads=threads)
    vr.height, vr.width = out_hw
    vr.interpolation = "LANCZOS"
    t0 = time.perf_counter()
    batch = vr.get_batch(indices)
    dt = time.perf_counter() - t0
    vr.close()
    assert batch.shape[0] == len(indices)
    return dt


def run_interleaved(path, threads, indices, out_hw=(448, 448), intervals=64):
    vr = qd.InterleavedVideoReader(
        path, num_threads=threads, num_intervals=intervals
    )
    vr.height, vr.width = out_hw
    vr.interpolation = "LANCZOS"
    t0 = time.perf_counter()
    vr.process(indices)
    vr.frame_iter = 32
    n = sum(b.shape[0] for b in vr)
    dt = time.perf_counter() - t0
    vr.close()
    assert n == len(indices)
    return dt


def run_opencv(path, indices, out_hw=(448, 448)):
    """Independent baseline: OpenCV VideoCapture (FFmpeg), sequential scan.

    grab() decodes-without-converting the frames between samples (the same
    skip pattern decord's sequential reader uses); sampled frames get
    retrieve() + LANCZOS4 resize, matching the reference arms' 448x448
    resized output (reference timing.py:83-99). Runs through the SHIPPED
    fallback backend (video/cv2_reader.py — the registered degradation path
    behind quickdecode), so this arm benches the product code.
    """
    from quickvideo_tpu.video.cv2_reader import Cv2VideoReader

    vr = Cv2VideoReader(path)
    vr.height, vr.width = out_hw
    vr.interpolation = "LANCZOS"
    t0 = time.perf_counter()
    batch = vr.get_batch(indices)
    dt = time.perf_counter() - t0
    vr.close()
    assert batch.shape[0] == len(indices)
    return dt


def sample_1fps(path):
    vr = qd.VideoReader(path, num_threads=1)
    fps = vr.get_fps()
    total = len(vr)
    vr.close()
    step = max(1, round(fps))
    return list(range(0, total, step))


def bench(fn, runs, *args, **kw):
    times = [fn(*args, **kw) for _ in range(runs)]
    return {
        "mean_s": round(statistics.mean(times), 3),
        "ci95_s": round(ci95(times), 3),
        "runs": runs,
    }


def make_fixture(seconds=60, fps=24, wh=(1920, 1080), gop=48, textured=True):
    """Synthetic movie, cached in /tmp. Default = textured 1080p: dense
    residuals approximating BluRay decode load (reference protocol decodes
    90-min 1080p movies, lvu/scripts/timing_*.sh / video_length_timings.py);
    the flat fixture decodes ~10x too fast to stress anything."""
    kind = "tex" if textured else "flat"
    path = os.path.join(
        tempfile.gettempdir(),
        f"decbench_{kind}_{seconds}s_{fps}fps_{wh[0]}x{wh[1]}.mp4",
    )
    if not os.path.exists(path):
        enc = qd.encode_textured_video if textured else qd.encode_test_video
        enc(
            path, width=wh[0], height=wh[1], nframes=seconds * fps, fps=fps,
            gop=gop,
        )
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="threads",
                    choices=["threads", "sparsity", "duration"])
    ap.add_argument("--video", default=None)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--seconds", type=int, default=60)
    args = ap.parse_args()

    results = []
    if args.mode == "threads":
        video = args.video or make_fixture(args.seconds)
        idx = sample_1fps(video)
        for nt in (2, 4, 8, 16, 32):
            row = {"arm": "quickdecode_batch", "threads": nt,
                   "frames": len(idx)}
            row.update(bench(run_batch, args.runs, video, nt, idx))
            results.append(row)
            row = {"arm": "quickdecode_interleaved", "threads": nt,
                   "frames": len(idx)}
            row.update(bench(run_interleaved, args.runs, video, nt, idx))
            results.append(row)
        row = {"arm": "sequential_baseline", "threads": 1, "frames": len(idx)}
        row.update(bench(run_batch, args.runs, video, 1, idx))
        results.append(row)
        row = {"arm": "opencv_sequential", "threads": 1, "frames": len(idx)}
        row.update(bench(run_opencv, args.runs, video, idx))
        results.append(row)
    elif args.mode == "sparsity":
        video = args.video or make_fixture(args.seconds)
        vr = qd.VideoReader(video, num_threads=1)
        fps, total = vr.get_fps(), len(vr)
        vr.close()
        for interval_s in (1, 2, 4, 8, 16):
            step = max(1, round(fps * interval_s))
            idx = list(range(0, total, step))
            row = {"arm": "quickdecode_batch", "interval_s": interval_s,
                   "frames": len(idx), "threads": 16}
            row.update(bench(run_batch, args.runs, video, 16, idx))
            results.append(row)
            row = {"arm": "opencv_sequential", "interval_s": interval_s,
                   "frames": len(idx), "threads": 1}
            row.update(bench(run_opencv, args.runs, video, idx))
            results.append(row)
    else:  # duration — to the reference's 1-hour axis
        # (video_length_timings.py:30-52). One 3600 s textured 1080p fixture;
        # each duration decodes its PREFIX (keyframe-aligned intervals adapt
        # to the requested index range, so an N-second prefix is the same
        # decode workload as an N-second file) — avoids re-encoding a
        # multi-GB fixture per duration on the 1-core host.
        movie = os.path.join(
            tempfile.gettempdir(), "movie_tex_3600s_12fps_1080p.mp4"
        )  # shared with benchmarks/movie_bench.py
        video = args.video or (
            movie if os.path.exists(movie) else make_fixture(3600, fps=12)
        )
        all_idx = sample_1fps(video)
        vr = qd.VideoReader(video, num_threads=1)
        fps = vr.get_fps()
        vr.close()
        for seconds in (60, 300, 900, 1800, 3600):
            idx = [i for i in all_idx if i < seconds * fps]
            for arm, nt in (
                ("quickdecode_batch", 16),
                ("sequential_baseline", 1),
            ):
                row = {"arm": arm, "duration_s": seconds, "fps": fps,
                       "frames": len(idx), "threads": nt, "wh": "1920x1080"}
                row.update(bench(run_batch, max(2, args.runs // 2), video,
                                 nt, idx))
                results.append(row)
                print(json.dumps(row), file=sys.stderr, flush=True)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
