"""Fused dual-GEMM+SwiGLU+quantize vision MLP (ops/fused_vision_mlp.py)
vs the XLA chain it replaces — interpret-mode parity on CPU.

The fused kernel's only numerical divergence from the chain is silu*mul in
f32 instead of bf16 (<=1 bf16 ulp pre-quantization); both paths then
quantize to int8, so outputs agree within one quantization step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import vision as V
from quickvideo_tpu.ops import fused_vision_mlp as FM
from quickvideo_tpu.ops import quantization as qz

CFG = get_config("tiny").vision


def _quantized_block(seed=0):
    c, i = CFG.hidden_size, CFG.intermediate_size
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s) * 0.05, jnp.float32
    )
    return {
        "ln2": jnp.asarray(1.0 + rng.standard_normal(c) * 0.02, jnp.bfloat16),
        "wg": qz.quantize_weight(mk(c, i)),
        "wu": qz.quantize_weight(mk(c, i)),
        "wd": qz.quantize_weight(mk(i, c)),
        "bg": mk(i).astype(jnp.bfloat16),
        "bu": mk(i).astype(jnp.bfloat16),
        "bd": mk(c).astype(jnp.bfloat16),
    }


def test_weight_prep_shapes_and_idempotence():
    bp = _quantized_block()
    stacked = {"blocks": jax.tree.map(lambda a: a[None], bp)}
    prepped = FM.fuse_vision_mlp_weights(stacked, CFG)
    blocks = prepped["blocks"]
    i = CFG.intermediate_size
    np_ = FM._round_up(i, FM.LANE)
    assert blocks["wgu_p"]["q8"].shape == (1, CFG.hidden_size, 2 * np_)
    assert blocks["wgu_p"]["sc"].shape == (1, 2 * np_)
    assert blocks["bgu_p"].shape == (1, 1, 2 * np_)
    assert blocks["wd_p"]["q8"].shape == (1, np_, CFG.hidden_size)
    # pad q8 columns are zero; pad wd rows are zero
    assert int(jnp.abs(blocks["wgu_p"]["q8"][0, :, i:np_]).max()) == 0
    assert int(jnp.abs(blocks["wgu_p"]["q8"][0, :, np_ + i:]).max()) == 0
    assert int(jnp.abs(blocks["wd_p"]["q8"][0, i:]).max()) == 0
    # idempotent
    assert FM.fuse_vision_mlp_weights(prepped, CFG) is prepped
    # unquantized towers pass through untouched
    bf = {"blocks": {"wg": jnp.zeros((1, 4, 4)), "wd": jnp.zeros((1, 4, 4))}}
    assert FM.fuse_vision_mlp_weights(bf, CFG) is bf


@pytest.mark.parametrize("s_len", [256, 250])  # aligned + needs row padding
def test_fused_mlp_matches_chain(monkeypatch, s_len):
    if not qz.vision_mlp_act_quant():
        pytest.skip("vision MLP act-quant disabled in this env")
    bp = _quantized_block()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((s_len, CFG.hidden_size)) * 0.1,
                    jnp.bfloat16)
    ref = V._vision_mlp(bp, x, CFG)  # chain (no fused leaves present)

    stacked = {"blocks": jax.tree.map(lambda a: a[None], bp)}
    bp_f = jax.tree.map(
        lambda a: a[0], FM.fuse_vision_mlp_weights(stacked, CFG)["blocks"]
    )
    monkeypatch.setenv("QV_PALLAS_INTERPRET", "1")
    out = V._vision_mlp(bp_f, x, CFG)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    # the disabled-flag escape hatch falls back to the chain exactly
    monkeypatch.setenv("QV_FUSED_VISION_MLP", "0")
    off = V._vision_mlp(bp_f, x, CFG)
    np.testing.assert_array_equal(
        np.asarray(off, np.float32), np.asarray(ref, np.float32)
    )


@pytest.mark.parametrize("s_len", [128, 100])  # aligned + needs row padding
def test_ln_in_kernel_matches_outside(s_len):
    """ln_dual_gemm_silu_quant (round 5: rmsnorm + quantize in-kernel) vs
    the quantize-outside entry fed by _rms_norm + quantize_act — the
    in-kernel math is operation-for-operation the same (f32 mean/rsqrt,
    bf16 round-trip, quantize_act's scale rule), so interpret-mode outputs
    agree to within one int8 quantization step."""
    c = CFG.hidden_size
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((s_len, c)) * 0.1, jnp.bfloat16)
    bp = _quantized_block(5)
    stacked = {"blocks": jax.tree.map(lambda a: a[None], bp)}
    bf = jax.tree.map(
        lambda a: a[0], FM.fuse_vision_mlp_weights(stacked, CFG)["blocks"]
    )
    h = V._rms_norm(x, bp["ln2"], CFG.rms_norm_eps)
    xq, xs = qz.quantize_act(h)
    qo, so = FM.dual_gemm_silu_quant(
        xq, xs, bf["wgu_p"], bf["bgu_p"], interpret=True)
    qn, sn = FM.ln_dual_gemm_silu_quant(
        x, bp["ln2"], bf["wgu_p"], bf["bgu_p"],
        eps=CFG.rms_norm_eps, interpret=True)
    assert qn.shape == qo.shape and sn.shape == so.shape
    np.testing.assert_allclose(np.asarray(sn), np.asarray(so), rtol=1e-5)
    step = float(np.asarray(so).max())
    np.testing.assert_allclose(
        np.asarray(qn, np.float32) * np.asarray(sn),
        np.asarray(qo, np.float32) * np.asarray(so),
        atol=step * 1.01,
    )


@pytest.mark.parametrize("s_len", [128, 90])  # aligned + needs row padding
def test_ln_gemm_bias_matches_act_quant_chain(s_len):
    """ln_gemm_bias (fused QKV projection candidate) vs the materialized
    rmsnorm -> quantize_act -> qdot_pre -> bias chain. Both act-quantize
    with the same scale rule; residual diffs are single int8 rounding
    flips at quantize boundaries (bounded by ~1 step through the dot)."""
    c, n = CFG.hidden_size, 2 * CFG.hidden_size
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((s_len, c)) * 0.1, jnp.bfloat16)
    ln = jnp.asarray(1.0 + rng.standard_normal(c) * 0.02, jnp.bfloat16)
    w = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32))
    b = jnp.asarray(rng.standard_normal(n) * 0.05, jnp.bfloat16)
    eps = CFG.rms_norm_eps
    out = FM.ln_gemm_bias(x, ln, w, b, eps=eps, bm=64, interpret=True)
    assert out.shape == (s_len, n) and out.dtype == jnp.bfloat16
    h = V._rms_norm(x, ln, eps)
    xq, xs = qz.quantize_act(h)
    ref = qz.qdot_pre(xq, xs, w).astype(x.dtype) + b
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_fused_qkv_tower_close_to_weight_only(monkeypatch):
    """Whole tiny vision tower with QV_FUSED_VISION_QKV=1 (interpret) vs
    the production weight-only QKV path — guards the vision_block wiring.
    The fused path act-quantizes the QKV input, so outputs differ by int8
    quantization noise only."""
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel
    from quickvideo_tpu.models.qwen25_vl import vision as VV
    from quickvideo_tpu.ops.quantization import quantize_vision_params

    cfg = get_config("tiny")
    vc = cfg.vision
    t, h, w = 2, 8, 8
    layout = VV.build_layout(
        (t, h, w), vc.patch_size, vc.spatial_merge_size, vc.window_size,
        vc.head_dim,
    )
    params = qmodel.init_params(cfg, seed=3, dtype=jnp.bfloat16)["vision"]
    params = jax.jit(quantize_vision_params)(params)
    params = VV.add_padded_block_weights(params, vc)
    rng = np.random.default_rng(7)
    px = jnp.asarray(
        rng.standard_normal((t * h * w, vc.patch_input_dim)) * 0.1,
        jnp.bfloat16,
    )
    monkeypatch.setenv("QV_PALLAS_INTERPRET", "1")
    ref = VV.vision_forward(params, px, layout, vc)
    monkeypatch.setenv("QV_FUSED_VISION_QKV", "1")
    out = VV.vision_forward(params, px, layout, vc)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.1,
    )


def test_dual_gemm_matches_chain_math():
    """Kernel (interpret) vs an exact numpy replay of the chain's math on a
    small shape — pins the rescale order, bias dtype, and quantize scale."""
    c, i = CFG.hidden_size, CFG.intermediate_size
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, c)) * 0.1, jnp.bfloat16)
    bp = _quantized_block(3)
    xq, xs = qz.quantize_act(x)
    stacked = {"blocks": jax.tree.map(lambda a: a[None], bp)}
    bf = FM.fuse_vision_mlp_weights(stacked, CFG)["blocks"]
    mq8, ms = FM.dual_gemm_silu_quant(
        xq, xs, jax.tree.map(lambda a: a[0], bf["wgu_p"]),
        bf["bgu_p"][0], interpret=True,
    )
    np_ = FM._round_up(i, FM.LANE)
    assert mq8.shape == (64, np_) and ms.shape == (64, 1)
    # pad columns quantize to exact zeros
    assert int(jnp.abs(mq8[:, i:]).max()) == 0
    # chain math
    g = qz.qdot_pre(xq, xs, bp["wg"]).astype(jnp.bfloat16) + bp["bg"]
    u = qz.qdot_pre(xq, xs, bp["wu"]).astype(jnp.bfloat16) + bp["bu"]
    gf = np.asarray(g, np.float32)
    uf = np.asarray(u, np.float32)
    m = gf / (1.0 + np.exp(-gf)) * uf
    s = np.maximum(np.abs(m).max(-1, keepdims=True), qz._EPS) / 127.0
    np.testing.assert_allclose(np.asarray(ms), s, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mq8[:, :i], np.float32) * np.asarray(ms),
        np.clip(np.round(m / s), -127, 127) * s,
        atol=float(s.max()) * 1.01,  # <=1 quantization step
    )
