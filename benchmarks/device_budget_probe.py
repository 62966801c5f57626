"""Device-time budget model of the strict 7B bench run.

The strict e2e plateaued at ~14.0 s while the flash kernel improved 10% in
isolation — so is the run device-bound (keep attacking kernels) or
host/pipeline-bound (attack decode/H2D/dispatch)? This probe measures the
ACTUAL per-group programs at every (occupancy, active_cap) bucket the
32-group strict run visits, sums them into a predicted device-busy total,
and prints it next to the measured e2e. predicted ~= e2e -> device-bound;
predicted << e2e -> the gap is host/pipeline time the kernels can't fix.

Method per program: dispatch R dependent reps, one host fetch at the end
(fetch-forced program timing; sync spans overstate through the tunnel).

Run on the real TPU: python benchmarks/device_budget_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

GRID = (16, 22, 40)  # strict group grid of the 448px textured bench fixture
CAPACITY = 1 << 16
REPS = int(os.environ.get("PROBE_REPS", "6"))
N_GROUPS = int(os.environ.get("PROBE_GROUPS", "32"))


def main():
    import jax
    import jax.numpy as jnp

    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl.language import StepSpec
    from quickvideo_tpu.models.qwen25_vl.rope import (
        precompute_mrope_cos_sin_device,
        text_positions,
    )
    from quickvideo_tpu.ops import kv_cache as kvc
    from quickvideo_tpu.ops.quantization import init_params_fast_quantized
    from quickvideo_tpu.prefill.engine import LVUEngine, enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = get_config("qwen25-vl-7b")
    t = cfg.text
    params = init_params_fast_quantized(cfg, jnp.bfloat16)
    lvu = LVUConfig(
        model_name_or_path="qwen25-vl-7b",
        top_p=0.5,
        top_k_predict_type="key_norms_small",
        kv_cache_capacity=CAPACITY,
        max_decode_tokens=16,
    )
    eng = LVUEngine(params, cfg, lvu, jnp.bfloat16)

    s = GRID[0] * GRID[1] * GRID[2]
    q_len = s // 4  # post-merge tokens per group
    keep_k = q_len // 2
    gran = max(8192, CAPACITY // 8)

    # the run's (occupancy, acap) sequence: group i starts at occ=i*keep_k
    buckets = {}
    for i in range(N_GROUPS):
        occ = i * keep_k
        needed = occ + q_len
        acap = max(8192, -(-needed // gran) * gran)
        key = (occ // gran) * gran, acap  # round occ to the bucket floor
        buckets.setdefault(key, [0, occ])
        buckets[key][0] += 1

    # --- vision program (one shape for all groups) ---
    vc = cfg.vision
    pixels = jnp.asarray(
        np.random.default_rng(0).standard_normal((s, vc.patch_input_dim)),
        jnp.bfloat16,
    )
    la = eng._layout_arrays(GRID)
    out = eng._vision_jit(params, cfg, pixels, GRID, la)
    np.asarray(out[:1, :8])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = eng._vision_jit(params, cfg, pixels, GRID, la)
    np.asarray(out[:1, :8])
    vis_ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"vision S={s}: {vis_ms:.1f} ms", file=sys.stderr, flush=True)

    n_pad = q_len + (-q_len) % 64
    ids_j = jnp.full((n_pad,), cfg.video_token_id, jnp.int32)
    pos = text_positions(0, n_pad)
    cos, sin = precompute_mrope_cos_sin_device(
        jnp.asarray(pos, jnp.int32), t.head_dim, t.mrope_section, t.rope_theta
    )
    vis = jnp.zeros((q_len, t.hidden_size), jnp.bfloat16)

    total_group_ms = 0.0
    rows = []
    for (occ_b, acap), (count, occ) in sorted(buckets.items()):
        spec = StepSpec(
            cfg=t, q_len=q_len, keep_k=keep_k,
            predict_type="key_norms_small",
            active_cap=0 if acap >= CAPACITY else acap,
        )

        def fresh():
            c = kvc.init_cache(
                t.num_hidden_layers, t.num_key_value_heads, CAPACITY,
                t.head_dim, dtype=jnp.bfloat16,
            )
            return c.replace(
                length=jnp.full((t.num_hidden_layers,), occ, jnp.int32)
            )

        cache = fresh()
        cache = eng._group_jit(
            params["language"], cache, ids_j, cos, sin, np.int32(0),
            vis, None, np.int32(0), spec=spec,
        )
        np.asarray(cache.length[:1])  # warm
        cache = fresh()
        # length must be reset to the bucket's representative occupancy each
        # rep: chained steps otherwise grow it by keep_k per rep, violating
        # the StepSpec active_cap contract near the acap ceiling (silently
        # truncated attention) and overrunning capacity in the top bucket.
        occ_vec = jnp.full((t.num_hidden_layers,), occ, jnp.int32)
        t0 = time.perf_counter()
        for r in range(REPS):
            cache = eng._group_jit(
                params["language"], cache.replace(length=occ_vec), ids_j,
                cos, sin, np.int32(0), vis, None, np.int32(r), spec=spec,
            )
        np.asarray(cache.length[:1])
        ms = (time.perf_counter() - t0) / REPS * 1e3
        total_group_ms += ms * count
        rows.append({"occ": occ, "acap": acap, "count": count,
                     "ms": round(ms, 1)})
        print(f"group occ={occ:6d} acap={acap:6d} x{count}: {ms:.1f} ms",
              file=sys.stderr, flush=True)

    predicted = (total_group_ms + vis_ms * N_GROUPS) / 1e3
    print(json.dumps({
        "metric": "predicted device-busy total for the strict 32-group run",
        "vision_ms": round(vis_ms, 1),
        "group_total_s": round(total_group_ms / 1e3, 2),
        "vision_total_s": round(vis_ms * N_GROUPS / 1e3, 2),
        "predicted_s": round(predicted, 2),
        "buckets": rows,
    }))


if __name__ == "__main__":
    main()
