"""Group-prefill step ablation at the 7B strict shape — attributes the
~375 ms/group (strict_profile.py) between the projection/MLP matmuls, the
unified flash attention, and the predictor+prune+compact machinery.

Arms (each a fresh jit of the SAME engine group program with one component
monkeypatched to a shape-preserving identity):
  full                 the production group step
  flash ablated        flash_past_attention -> zeros PartialAttn (appends
                       and prune still run)
  prune ablated        select_and_compact -> first-keep_k slice (predictor
                       scoring + top-k + gather removed; appends still run)
  flash+prune ablated  both: ~matmul+norm+rope+append floor

Method: fetch-forced timing (block_until_ready lies on this transport),
R reps, best-of. Run on the real TPU:
  python benchmarks/group_ablation_bench.py [--model qwen25-vl-7b]
      [--grid 16,22,40] [--acap 32768] [--reps 6]
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
    ap.add_argument("--grid", default="16,22,40")
    ap.add_argument("--capacity", type=int, default=1 << 16)
    ap.add_argument("--acap", type=int, default=32768)
    ap.add_argument("--occ0", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--kv-dtype", default="bfloat16",
                    choices=["bfloat16", "int8"])
    ap.add_argument("--arms", default="all",
                    help="comma list: full,flash,prune,both (default all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel
    from quickvideo_tpu.models.qwen25_vl import language as L
    from quickvideo_tpu.models.qwen25_vl.language import StepSpec
    from quickvideo_tpu.models.qwen25_vl.rope import (
        precompute_mrope_cos_sin_device,
        text_positions,
    )
    from quickvideo_tpu.ops import kv_cache as kvc
    from quickvideo_tpu.ops import prune as prune_ops
    from quickvideo_tpu.ops import flash_attention as fa
    from quickvideo_tpu.ops.attention import PartialAttn
    from quickvideo_tpu.prefill.engine import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = get_config(args.model)
    t = cfg.text

    if args.param_dtype == "int8":
        from quickvideo_tpu.ops.quantization import init_params_fast_quantized

        params = init_params_fast_quantized(cfg, jnp.bfloat16)
    else:
        params = qmodel.init_params_fast(cfg, jnp.bfloat16)

    grid = tuple(int(x) for x in args.grid.split(","))
    q_len = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    keep_k = q_len // 2
    n_pad = q_len + (-q_len) % 64
    ids = jnp.full((n_pad,), cfg.video_token_id, jnp.int32)
    pos = text_positions(0, n_pad)
    cos, sin = precompute_mrope_cos_sin_device(
        jnp.asarray(pos, jnp.int32), t.head_dim, t.mrope_section, t.rope_theta
    )
    vis = jnp.zeros((q_len, t.hidden_size), jnp.bfloat16)
    kv_quant = args.kv_dtype == "int8"
    spec = StepSpec(
        cfg=t, q_len=q_len, keep_k=keep_k,
        predict_type="key_norms_small",
        active_cap=0 if args.acap >= args.capacity else args.acap,
        kv_quant=kv_quant,
    )

    def fresh_cache():
        c = kvc.init_cache(
            t.num_hidden_layers, t.num_key_value_heads, args.capacity,
            t.head_dim, dtype=jnp.bfloat16, quantized=kv_quant,
        )
        return c.replace(
            length=jnp.full((t.num_hidden_layers,), args.occ0, jnp.int32)
        )

    # the engine group program, re-jitted fresh per arm (monkeypatched
    # component is baked in at trace time)
    from quickvideo_tpu.prefill.engine import LVUEngine

    lvu = LVUConfig(
        model_name_or_path=args.model, top_p=0.5,
        top_k_predict_type="key_norms_small",
        kv_cache_capacity=args.capacity, max_decode_tokens=16,
        kv_cache_dtype=args.kv_dtype,
    )
    eng = LVUEngine(params, cfg, lvu, jnp.bfloat16)

    def run(tag):
        f = eng._group_jit
        cache = fresh_cache()
        cache = f(params["language"], cache, ids, cos, sin, np.int32(0),
                  vis, None, np.int32(0), spec=spec)
        np.asarray(cache.length[:1])  # warm
        cache = fresh_cache()
        t0 = time.perf_counter()
        for r in range(args.reps):
            cache = f(params["language"], cache, ids, cos, sin, np.int32(0),
                      vis, None, np.int32(r), spec=spec)
        np.asarray(cache.length[:1])
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{tag:28s} {dt*1e3:9.1f} ms", file=sys.stderr, flush=True)
        return dt * 1e3

    arms = set(args.arms.split(",")) if args.arms != "all" else {
        "full", "flash", "prune", "both"
    }
    results = {}
    if "full" in arms:
        results["full"] = run("full")

    orig_flash = fa.flash_past_attention

    def fake_flash(q, k_all, v_all, length, **kw):
        hq, g, d = q.shape
        return PartialAttn(
            jnp.zeros((hq, g, d), jnp.float32) + q.astype(jnp.float32),
            jnp.zeros((hq, g), jnp.float32),
        )

    orig_sac = prune_ops.select_and_compact

    def fake_prune(predict_type, keep_k, k_grp, v_grp, **kw):
        return prune_ops.PruneResult(
            k_keep=k_grp[:, :keep_k],
            v_keep=v_grp[:, :keep_k],
            indices=jnp.arange(keep_k, dtype=jnp.int32),
            accum_keep=None,
        )

    try:
        if "flash" in arms:
            fa.flash_past_attention = fake_flash
            jax.clear_caches()
            results["flash_ablated"] = run("flash ablated")
            fa.flash_past_attention = orig_flash
        if "both" in arms:
            fa.flash_past_attention = fake_flash
            prune_ops.select_and_compact = fake_prune
            jax.clear_caches()
            results["flash_prune_ablated"] = run("flash+prune ablated")
            fa.flash_past_attention = orig_flash
            prune_ops.select_and_compact = orig_sac
        if "prune" in arms:
            prune_ops.select_and_compact = fake_prune
            jax.clear_caches()
            results["prune_ablated"] = run("prune ablated")
    finally:
        fa.flash_past_attention = orig_flash
        prune_ops.select_and_compact = orig_sac

    print(json.dumps({
        "metric": "7B group-step ablation",
        "model": args.model,
        "grid": grid, "q_len": q_len, "acap": args.acap,
        "kv_dtype": args.kv_dtype,
        "int8_act": os.environ.get("QV_INT8_ACT", "1"),
        "int8_qk": os.environ.get("QV_INT8_QK", "1"),
        "results_ms": {k: round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
