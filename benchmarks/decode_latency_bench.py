"""Decode latency: ms/token vs the HBM roofline (VERDICT r1 item 7).

Decode streams every weight byte per token, so the floor is
weight_bytes / HBM_bandwidth plus the KV-cache read for attention:

    floor_ms = (weight_bytes + kv_read_bytes) / 819e9 * 1e3   (v5e)

This bench prefill-fills a cache to a configurable occupancy, then times
chunked greedy decode (the engine's production path: 32-token device-side
chunks) and reports ms/token against that floor.

Usage: python benchmarks/decode_latency_bench.py [--model qwen25-vl-7b]
           [--param-dtype int8] [--occupancy 36920] [--tokens 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen25-vl-7b")
    ap.add_argument("--param-dtype", default="int8")
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--occupancy", type=int, default=36920)  # 1024f rho=0.5
    ap.add_argument("--capacity", type=int, default=1 << 16)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--attn-impl", default=None,
                    help="flash | xla (attribution: the q=1 kernel choice)")
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
    cfg = get_config(args.model)
    t = cfg.text
    dtype = jnp.bfloat16
    if args.param_dtype == "int8":
        from quickvideo_tpu.ops.quantization import init_params_fast_quantized

        params = init_params_fast_quantized(cfg, dtype)
        wbytes = sum(
            a.size * a.dtype.itemsize
            for a in jax.tree.leaves(params["language"])
        )
    else:
        params = qmodel.init_params_fast(cfg, dtype)
        wbytes = sum(
            a.size * a.dtype.itemsize
            for a in jax.tree.leaves(params["language"])
        )

    lvu = LVUConfig(
        model_name_or_path=args.model, kv_cache_dtype=args.kv_dtype,
        max_decode_tokens=max(args.tokens, 32),
    )
    eng = LVUEngine(params, cfg, lvu, dtype)
    quant = args.kv_dtype == "int8"
    cache = kvc.init_cache(
        t.num_hidden_layers, t.num_key_value_heads, args.capacity,
        t.head_dim, dtype=dtype, quantized=quant,
    )
    # mark `occupancy` slots valid (contents are zeros — bytes read are what
    # matters for the roofline)
    cache = cache.replace(
        length=jnp.full((t.num_hidden_layers,), args.occupancy, jnp.int32)
    )
    pos = text_positions(args.occupancy, args.tokens + 64)
    cos, sin = precompute_mrope_cos_sin_device(
        jnp.asarray(pos, jnp.int32), t.head_dim, t.mrope_section, t.rope_theta
    )
    active = max(4096, -(-(args.occupancy + args.tokens + 64) // 4096) * 4096)
    dspec_kw = dict(
        cfg=t, q_len=1, keep_k=0, kv_quant=quant,
        active_cap=0 if active >= args.capacity else active,
    )
    if args.attn_impl:
        dspec_kw["attn_impl"] = args.attn_impl
    dspec = StepSpec(**dspec_kw)

    chunk = 32
    # warmup
    import jax.numpy as jnp
    no_eos = jnp.asarray([-1], jnp.int32)  # never fires: sustained decode
    cache, toks = eng._decode_chunk_jit(
        params["language"], cache, np.int32(1), cos[:chunk], sin[:chunk],
        no_eos, np.int32(chunk), spec=dspec,
    )
    np.asarray(toks)
    n_chunks = args.tokens // chunk
    t0 = time.perf_counter()
    last = np.int32(1)
    for i in range(n_chunks):
        cache, toks = eng._decode_chunk_jit(
            params["language"], cache, last,
            cos[i * chunk : (i + 1) * chunk], sin[i * chunk : (i + 1) * chunk],
            no_eos, np.int32(chunk), spec=dspec,
        )
        last = np.int32(np.asarray(toks)[-1])
    dt = time.perf_counter() - t0
    ms_per_tok = dt / (n_chunks * chunk) * 1e3

    kv_itemsize = 1 if quant else 2
    kv_read = (
        t.num_hidden_layers * t.num_key_value_heads * args.occupancy
        * t.head_dim * 2 * kv_itemsize
    )
    floor_ms = (wbytes + kv_read) / 819e9 * 1e3
    print(json.dumps({
        "metric": f"decode ms/token, {args.model} {args.param_dtype} weights,"
                  f" {args.kv_dtype} KV, occupancy {args.occupancy}",
        "ms_per_token": round(ms_per_tok, 2),
        "hbm_floor_ms": round(floor_ms, 2),
        "efficiency_vs_floor": round(floor_ms / ms_per_tok, 3),
        "weight_bytes_gb": round(wbytes / 1e9, 2),
        "kv_read_gb_per_tok": round(kv_read / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
