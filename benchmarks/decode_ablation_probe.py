"""Decode-step component attribution (VERDICT r4 item 7).

decode_latency_bench showed ms/token at 83% of its floor with an
occupancy-INDEPENDENT ~2.1-2.4 ms residual — so the attention kernel scales
at roofline and the residual lives in the per-token fixed work. This probe
splits that fixed work by ablation, each arm a fresh jit of the same
production _decode_chunk_body:

  A  full production step (reference point)
  B  logits head ablated (compute_logits -> row sum) — isolates the lm_head
     stream + softmax-side glue
  C  attention ablated (flash_past_attention -> q) — isolates the whole
     attention read at this occupancy
  D  B+C together — pure per-layer projection/MLP weight stream + glue

Also prints the corrected HBM floor: the embed table is NOT streamed at
decode (qtake reads one row), so the old floor overstated by its bytes.

Run: python benchmarks/decode_ablation_probe.py [occupancy]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    occ = int(sys.argv[1]) if len(sys.argv) > 1 else 43000
    tokens = 96
    import jax
    import jax.numpy as jnp

    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import language as lang
    from quickvideo_tpu.models.qwen25_vl.language import StepSpec
    from quickvideo_tpu.models.qwen25_vl.rope import (
        precompute_mrope_cos_sin_device,
        text_positions,
    )
    from quickvideo_tpu.ops import kv_cache as kvc
    from quickvideo_tpu.ops import flash_attention as fa
    from quickvideo_tpu.ops.quantization import init_params_fast_quantized
    from quickvideo_tpu.prefill.engine import (
        LVUEngine,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = get_config("qwen25-vl-7b")
    t = cfg.text
    params = init_params_fast_quantized(cfg, jnp.bfloat16)
    lvu = LVUConfig(model_name_or_path="qwen25-vl-7b",
                    max_decode_tokens=max(tokens, 32))
    eng = LVUEngine(params, cfg, lvu, jnp.bfloat16)
    capacity = 1 << 16

    def fresh_cache():
        return kvc.init_cache(
            t.num_hidden_layers, t.num_key_value_heads, capacity,
            t.head_dim, dtype=jnp.bfloat16,
        ).replace(length=jnp.full((t.num_hidden_layers,), occ, jnp.int32))

    pos = text_positions(occ, tokens + 64)
    cos, sin = precompute_mrope_cos_sin_device(
        jnp.asarray(pos, jnp.int32), t.head_dim, t.mrope_section,
        t.rope_theta,
    )
    active = max(4096, -(-(occ + tokens + 64) // 4096) * 4096)
    dspec = StepSpec(cfg=t, q_len=1, keep_k=0, attn_impl="pallas",
                     active_cap=0 if active >= capacity else active)
    no_eos = jnp.asarray([-1], jnp.int32)
    chunk = 32

    def run(tag):
        # donate the cache (the production jit does): without donation the
        # appended copy doubles the 3.8 GB cache beside the 8.3 GB weights
        f = jax.jit(eng._decode_chunk_body, static_argnames=("spec",),
                    donate_argnames=("cache",))
        cache = fresh_cache()
        cache, toks = f(params["language"], cache, np.int32(1),
                        cos[:chunk], sin[:chunk], no_eos, np.int32(chunk),
                        spec=dspec)
        np.asarray(toks)
        n_chunks = tokens // chunk
        t0 = time.perf_counter()
        for i in range(n_chunks):
            cache, toks = f(params["language"], cache, np.int32(1),
                            cos[i * chunk:(i + 1) * chunk],
                            sin[i * chunk:(i + 1) * chunk],
                            no_eos, np.int32(chunk), spec=dspec)
        np.asarray(toks)
        ms = (time.perf_counter() - t0) / tokens * 1e3
        print(f"{tag:28s} {ms:7.2f} ms/token", file=sys.stderr, flush=True)
        return ms

    res = {"occupancy": occ}
    res["A_full"] = run("A full")

    orig_logits = lang.compute_logits
    lang.compute_logits = lambda p, h, c: jnp.broadcast_to(
        jnp.sum(h).astype(jnp.float32), (c.vocab_size,)
    )
    try:
        res["B_no_head"] = run("B logits head ablated")
    finally:
        lang.compute_logits = orig_logits

    orig_fa = fa.flash_past_attention
    import types

    def fake_attention(q, *a, **kw):
        return types.SimpleNamespace(out=q.astype(jnp.float32), lse=None)

    fa.flash_past_attention = fake_attention
    try:
        res["C_no_attn"] = run("C attention ablated")
        lang.compute_logits = lambda p, h, c: jnp.broadcast_to(
            jnp.sum(h).astype(jnp.float32), (c.vocab_size,)
        )
        try:
            res["D_no_attn_no_head"] = run("D both ablated")
        finally:
            lang.compute_logits = orig_logits
    finally:
        fa.flash_past_attention = orig_fa

    wl = params["language"]
    stream_bytes = sum(
        a.size * a.dtype.itemsize
        for key in ("layers", "norm", "lm_head")
        for a in jax.tree.leaves(wl[key])
    )
    kv_read = (t.num_hidden_layers * t.num_key_value_heads * occ
               * t.head_dim * 2 * 2)
    res["floor_corrected_ms"] = round(
        (stream_bytes + kv_read) / 819e9 * 1e3, 2)
    res["attn_cost_ms"] = round(res["A_full"] - res["C_no_attn"], 2)
    res["head_cost_ms"] = round(res["A_full"] - res["B_no_head"], 2)
    res["layers_resid_ms"] = round(res["D_no_attn_no_head"], 2)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
