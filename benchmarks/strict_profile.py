"""Isolated per-program profiling of the strict vs aligned bench shapes.

The headline bench (textured-1080p, 1024f, group 32) runs two resize modes:
  strict  (reference-exact): 308x560 -> vision grid (16, 22, 40), 3520
          video tokens/group
  aligned (window-snapped):  224x560 -> vision grid (16, 16, 40), 2560
          video tokens/group

e2e strict is ~19 s vs aligned ~12 s while the token ratio is only 1.375x —
this script attributes the gap with trustworthy program-level timings
(sync spans overstate on the tunneled device: one transport RTT per span
edge; see BENCH_RESULTS.md). Method: dispatch R dependent reps of ONE
program, force a single host fetch at the end, subtract the measured
fetch RTT, divide by R.

Run on the real TPU:  python benchmarks/strict_profile.py
int8 activations:     QV_INT8_ACT=1 python benchmarks/strict_profile.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen25-vl-7b")
    ap.add_argument("--param-dtype", default="int8")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--capacity", type=int, default=1 << 16)
    ap.add_argument("--skip-vision", action="store_true")
    ap.add_argument("--skip-group", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel
    from quickvideo_tpu.models.qwen25_vl.language import StepSpec
    from quickvideo_tpu.models.qwen25_vl.rope import (
        precompute_mrope_cos_sin_device,
        text_positions,
    )
    from quickvideo_tpu.ops import kv_cache as kvc
    from quickvideo_tpu.prefill.engine import LVUEngine, enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = get_config(args.model)
    t = cfg.text

    if args.param_dtype == "int8":
        from quickvideo_tpu.ops.quantization import init_params_fast_quantized

        params = init_params_fast_quantized(cfg, jnp.bfloat16)
    else:
        params = qmodel.init_params_fast(cfg, jnp.bfloat16)

    lvu = LVUConfig(
        model_name_or_path=args.model,
        top_p=0.5,
        top_k_predict_type="key_norms_small",
        kv_cache_capacity=args.capacity,
        max_decode_tokens=16,
    )
    eng = LVUEngine(params, cfg, lvu, jnp.bfloat16)

    # fetch RTT: host fetch of a FRESH device array each probe — jax caches
    # the host copy after the first np.asarray of a given array, so probing
    # one materialized array re-reads host memory and reports ~0 ms while
    # the true tunnel round-trip is ~20 ms
    _probe = jax.jit(lambda x: x + 1.0)
    base = jnp.zeros((8,), jnp.float32)
    np.asarray(_probe(base))  # warm
    rtts = []
    for _ in range(5):
        fresh = _probe(base)
        fresh.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fresh)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"fetch RTT {rtt*1e3:.1f} ms", file=sys.stderr)

    results = []

    def report(name, ms):
        print(f"{name:48s} {ms:9.1f} ms", file=sys.stderr, flush=True)
        results.append({"program": name, "ms": round(ms, 2)})

    # default grids = textured-1080p fixture; SP_GRIDS overrides (the
    # textured448 headline fixture runs strict (16,26,26) / aligned
    # (16,24,24) — 364px vs 336px smart-resize of the 448 source)
    import ast

    GRIDS = {
        f"{t},{h},{w}": (t, h, w)
        for t, h, w in ast.literal_eval(os.environ["SP_GRIDS"])
    } if os.environ.get("SP_GRIDS") else {
        "strict(16,22,40)": (16, 22, 40),
        "aligned(16,16,40)": (16, 16, 40),
    }

    if not args.skip_vision:
        vc = cfg.vision
        for name, grid in GRIDS.items():
            s = grid[0] * grid[1] * grid[2]
            pixels = jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (s, vc.patch_input_dim)
                ),
                jnp.bfloat16,
            )
            la = eng._layout_arrays(grid)
            out = eng._vision_jit(params, cfg, pixels, grid, la)
            np.asarray(out[:1, :8])  # warm compile + materialize
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = eng._vision_jit(params, cfg, pixels, grid, la)
            np.asarray(out[:1, :8])
            dt = (time.perf_counter() - t0 - rtt) / args.reps
            report(f"vision {name} S={s}", dt * 1e3)

    if not args.skip_group:
        # group prefill at mid-run occupancy (acap bucket 32768); R reps
        # append R*keep_k so start occupancy keeps the bucket valid
        for name, grid in GRIDS.items():
            q_len = grid[0] * (grid[1] // 2) * (grid[2] // 2)
            keep_k = q_len // 2
            occ0 = 16384
            acap = 32768
            n_pad = q_len + (-q_len) % 64
            ids_j = jnp.full((n_pad,), cfg.video_token_id, jnp.int32)
            pos = text_positions(0, n_pad)
            cos, sin = precompute_mrope_cos_sin_device(
                jnp.asarray(pos, jnp.int32), t.head_dim, t.mrope_section,
                t.rope_theta,
            )
            vis = jnp.zeros((q_len, t.hidden_size), jnp.bfloat16)
            spec = StepSpec(
                cfg=t, q_len=q_len, keep_k=keep_k,
                predict_type="key_norms_small",
                active_cap=0 if acap >= args.capacity else acap,
            )

            def fresh_cache():
                c = kvc.init_cache(
                    t.num_hidden_layers, t.num_key_value_heads,
                    args.capacity, t.head_dim, dtype=jnp.bfloat16,
                )
                return c.replace(
                    length=jnp.full(
                        (t.num_hidden_layers,), occ0, jnp.int32
                    )
                )

            cache = fresh_cache()
            cache = eng._group_jit(
                params["language"], cache, ids_j, cos, sin, np.int32(0),
                vis, None, np.int32(0), spec=spec,
            )
            np.asarray(cache.length[:1])  # warm
            cache = fresh_cache()
            t0 = time.perf_counter()
            for r in range(args.reps):
                cache = eng._group_jit(
                    params["language"], cache, ids_j, cos, sin, np.int32(0),
                    vis, None, np.int32(r), spec=spec,
                )
            np.asarray(cache.length[:1])
            dt = (time.perf_counter() - t0 - rtt) / args.reps
            report(f"group-prefill {name} q={q_len} acap={acap}", dt * 1e3)

    act = os.environ.get("QV_INT8_ACT", "1")
    print(json.dumps({
        "metric": "strict-vs-aligned program profile",
        "model": args.model,
        "param_dtype": args.param_dtype,
        "int8_act": act,
        "fetch_rtt_ms": round(rtt * 1e3, 1),
        "results": results,
    }))


if __name__ == "__main__":
    main()
