"""Pallas flash kernel vs the XLA oracle (interpret mode on CPU; the same
kernel runs compiled on TPU — see bench/verify drives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quickvideo_tpu.ops import attention
from quickvideo_tpu.ops.flash_attention import flash_past_attention

HQ, HKV, D = 8, 2, 128
SCALE = D ** -0.5


def oracle(q, k, v, length):
    cap = k.shape[1]
    g = q.shape[1]
    mask = jnp.broadcast_to(jnp.arange(cap)[None] < length, (g, cap))
    return attention._partial_attention(q, k, v, mask, SCALE)


@pytest.mark.parametrize("g,cap,length", [
    (256, 1024, 700),
    (256, 1024, 0),
    (100, 1500, 1500),   # padding on both axes
    (256, 2048, 1),
])
def test_flash_matches_oracle(rng_np, g, cap, length):
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    got = flash_past_attention(
        q, k, v, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True,
    )
    ref = oracle(q, k, v, jnp.int32(length))
    np.testing.assert_allclose(got.out, ref.out, rtol=3e-5, atol=3e-5)
    # lse comparison only where defined (length > 0)
    if length > 0:
        np.testing.assert_allclose(got.lse, ref.lse, rtol=3e-5, atol=3e-4)


def test_flash_then_merge_equals_concat(rng_np):
    """Full grouped-attention assembly with the Pallas partial."""
    g, cap, length = 128, 1024, 511
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    kbuf = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    vbuf = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    kg = jnp.asarray(rng_np.standard_normal((HKV, g, D)).astype(np.float32))
    vg = jnp.asarray(rng_np.standard_normal((HKV, g, D)).astype(np.float32))
    pp = flash_past_attention(
        q, kbuf, vbuf, jnp.int32(length), scale=SCALE, interpret=True
    )
    cmask = jnp.tril(jnp.ones((g, g), bool))
    pg = attention._partial_attention(q, kg, vg, cmask, SCALE)
    out, _ = attention.merge_partials(pp, pg)
    # oracle
    ref_out, _ = attention.grouped_attention(
        q, kg, vg, kbuf, vbuf, jnp.int32(length), scale=SCALE
    )
    np.testing.assert_allclose(out, ref_out, rtol=3e-5, atol=3e-5)


def test_flash_int8_matches_dequant_oracle(rng_np):
    """int8-cache kernel vs oracle over explicitly dequantized buffers."""
    from quickvideo_tpu.ops.kv_cache import dequantize_kv, quantize_kv

    g, cap, length = 128, 1024, 700
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    got = flash_past_attention(
        q, kq, vq, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True, k_scale=ks, v_scale=vs, int8_qk=False,
    )
    kd = dequantize_kv(kq, ks)
    vd = dequantize_kv(vq, vs)
    ref = oracle(q, kd, vd, jnp.int32(length))
    np.testing.assert_allclose(got.out, ref.out, rtol=2e-4, atol=2e-4)


def test_flash_int8k_matches_dequant_oracle(rng_np):
    """K-only int8 mode (kv_cache 'int8k'): K stored int8 + per-token scale,
    V stays bf16/f32 — QK runs at the s8xs8 MXU rate while PV keeps the
    full-rate unquantized path. Oracle = dequantized K with the ORIGINAL V."""
    from quickvideo_tpu.ops.kv_cache import dequantize_kv, quantize_kv

    g, cap, length = 128, 1024, 700
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    kq, ks = quantize_kv(k)
    kd = dequantize_kv(kq, ks)
    for int8_qk, causal in ((False, False), (True, False), (True, True)):
        got = flash_past_attention(
            q, kq, v, jnp.int32(length), scale=SCALE, block_q=128,
            block_k=256, interpret=True, k_scale=ks, v_scale=None,
            int8_qk=int8_qk, causal=causal,
        )
        if causal:
            # unified mode: row i attends buffer slots [0, length + i]
            cap_ = kd.shape[1]
            row = jnp.broadcast_to(jnp.arange(g)[:, None], (g, cap_))
            col = jnp.broadcast_to(jnp.arange(cap_)[None], (g, cap_))
            mask = col < jnp.minimum(length + row + 1, cap_)
            ref = attention._partial_attention(q, kd, v, mask, SCALE)
        else:
            ref = oracle(q, kd, v, jnp.int32(length))
        tol = 2e-4 if not int8_qk else 0.03  # int8_qk adds q rounding
        np.testing.assert_allclose(got.out, ref.out, rtol=tol, atol=tol)


def test_flash_int8_qk_matches_dequant_oracle(rng_np):
    """int8-QK mode (per-row quantized q, s8xs8 QK matmul) vs the oracle on
    EXPLICITLY dequantized q/k/v: the kernel's extra rounding is exactly the
    q/k quantization, so against the dequantized operands it must be tight;
    against full-precision q the drift stays at 1/127-rounding scale."""
    from quickvideo_tpu.ops.kv_cache import dequantize_kv, quantize_kv

    g, cap, length = 128, 1024, 700
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    got = flash_past_attention(
        q, kq, vq, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True, k_scale=ks, v_scale=vs, int8_qk=True,
    )
    # oracle on the SAME rounded operands: mirror the kernel wrapper's f32
    # quantization bit-for-bit (scale*log2e folds into the row scale before
    # rounding; dividing it back yields natural-scale dequantized q)
    LOG2E = 1.4426950408889634
    qf32 = q.astype(jnp.float32) * (SCALE * LOG2E)
    qs = jnp.maximum(
        jnp.max(jnp.abs(qf32), axis=-1, keepdims=True), 1e-20
    ) / 127.0
    qd = (
        jnp.clip(jnp.round(qf32 / qs), -127, 127) * qs / (SCALE * LOG2E)
    ).astype(jnp.float32)
    kd = dequantize_kv(kq, ks)
    vd = dequantize_kv(vq, vs)
    ref = oracle(qd, kd, vd, jnp.int32(length))
    np.testing.assert_allclose(got.out, ref.out, rtol=2e-4, atol=2e-4)
    # and vs full precision: bounded by quantization noise
    ref_fp = oracle(q, k, v, jnp.int32(length))
    assert np.max(np.abs(np.asarray(got.out) - np.asarray(ref_fp.out))) < 0.05
    # MARGINAL cost of quantizing q, on top of the int8 cache the mode
    # requires: must be the same order as the k-quantization error that is
    # already accepted (q and k rounding are symmetric score perturbations)
    got_fpq = flash_past_attention(
        q, kq, vq, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True, k_scale=ks, v_scale=vs, int8_qk=False,
    )
    err_kv_only = np.max(np.abs(np.asarray(got_fpq.out) - np.asarray(ref_fp.out)))
    err_marginal = np.max(np.abs(np.asarray(got.out) - np.asarray(got_fpq.out)))
    assert err_marginal < 2.0 * err_kv_only, (err_marginal, err_kv_only)


@pytest.mark.parametrize("li", [0, 2])
def test_flash_stacked_matches_flat(rng_np, li):
    """Stacked-cache mode (4D k/v + layer_idx scalar prefetch) must equal the
    flat per-layer call on the same layer's buffers."""
    L, g, cap, length = 3, 128, 1024, 700
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((L, HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((L, HKV, cap, D)).astype(np.float32))
    got = flash_past_attention(
        q, k, v, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True, layer_idx=jnp.int32(li),
    )
    ref = flash_past_attention(
        q, k[li], v[li], jnp.int32(length), scale=SCALE, block_q=128,
        block_k=256, interpret=True,
    )
    np.testing.assert_allclose(got.out, ref.out, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got.lse, ref.lse, rtol=1e-6, atol=1e-6)


def test_flash_stacked_active_cap(rng_np):
    """active_cap bounds the k-grid: with valid length below the bound the
    result must be identical to the unbounded call (bound rounds up to a
    whole block; slots beyond `length` are masked regardless)."""
    L, g, cap, length = 2, 64, 2048, 300
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((L, HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((L, HKV, cap, D)).astype(np.float32))
    got = flash_past_attention(
        q, k, v, jnp.int32(length), scale=SCALE, block_q=64, block_k=256,
        interpret=True, layer_idx=jnp.int32(1), active_cap=512,
    )
    ref = flash_past_attention(
        q, k, v, jnp.int32(length), scale=SCALE, block_q=64, block_k=256,
        interpret=True, layer_idx=jnp.int32(1),
    )
    np.testing.assert_allclose(got.out, ref.out, rtol=1e-6, atol=1e-6)


def test_flash_with_lse_false_matches(rng_np):
    """with_lse=False skips the lse output entirely; the attention output is
    bit-identical to the with_lse=True kernel (hot-path mode — the unified
    kernel never merges, so the lse store is pure overhead unless the
    predictor needs probs)."""
    g, cap, length = 256, 1024, 700
    q = jnp.asarray(rng_np.standard_normal((HQ, g, D)).astype(np.float32))
    k = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    v = jnp.asarray(rng_np.standard_normal((HKV, cap, D)).astype(np.float32))
    full = flash_past_attention(
        q, k, v, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True, causal=True,
    )
    slim = flash_past_attention(
        q, k, v, jnp.int32(length), scale=SCALE, block_q=128, block_k=256,
        interpret=True, causal=True, with_lse=False,
    )
    assert slim.lse is None
    np.testing.assert_array_equal(np.asarray(slim.out), np.asarray(full.out))
