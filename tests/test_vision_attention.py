"""Fused block-diagonal vision attention kernel vs the XLA batched oracle
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quickvideo_tpu.models.qwen25_vl import vision as V
from quickvideo_tpu.ops.vision_attention import block_diag_attention

NH, HD = 4, 16
SCALE = HD ** -0.5


@pytest.mark.parametrize("span,nspan", [(8, 12), (24, 4), (96, 2)])
def test_kernel_matches_batched_oracle(rng_np, span, nspan):
    s = span * nspan
    q = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)

    out = block_diag_attention(q, k, v, span, scale=SCALE, interpret=True)

    qb = q.reshape(nspan, span, NH, HD)
    kb = k.reshape(nspan, span, NH, HD)
    vb = v.reshape(nspan, span, NH, HD)
    ref = V._block_attention(qb, kb, vb, None, SCALE).reshape(s, NH, HD)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_kernel_single_span_no_mask(rng_np):
    # span == tile: the mask branch compiles away (full per-frame attention)
    s = 128
    q = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)
    out = block_diag_attention(q, q, q, s, scale=SCALE, interpret=True)
    ref = V._block_attention(
        q[None], q[None], q[None], None, SCALE
    ).reshape(s, NH, HD)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_kernel_rejects_ragged():
    q = jnp.zeros((100, NH, HD))
    with pytest.raises(ValueError, match="not a multiple"):
        block_diag_attention(q, q, q, 64, scale=SCALE, interpret=True)


def test_masked_kernel_matches_padded_oracle(rng_np):
    """Padded-window variant: per-column validity penalty == the XLA
    batched path's mask (pad rows' outputs are dead, not compared)."""
    nw, mw = 6, 128  # tq multiple of 128 required for the penalty operand
    s = nw * mw
    q = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((s, NH, HD)), jnp.float32)
    valid = np.ones((nw, mw), bool)
    valid[1, 100:] = False  # ragged window
    valid[4, 7:] = False

    out = block_diag_attention(
        q, k, v, mw, scale=SCALE, valid=jnp.asarray(valid.reshape(-1)),
        interpret=True,
    )
    ref = V._block_attention(
        q.reshape(nw, mw, NH, HD), k.reshape(nw, mw, NH, HD),
        v.reshape(nw, mw, NH, HD), jnp.asarray(valid), SCALE,
    ).reshape(s, NH, HD)
    vm = valid.reshape(-1)
    np.testing.assert_allclose(
        np.asarray(out)[vm], np.asarray(ref)[vm], rtol=2e-5, atol=2e-5
    )


def test_vision_tower_ragged_kernel_matches_xla(rng_np, monkeypatch):
    """Non-aligned grid (ragged windows): the padded-gather + masked kernel
    path equals the pure-XLA tower."""
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel

    cfg = get_config("tiny")
    vc = cfg.vision
    t, h, w = 2, 6, 10  # unit grid not divisible by the window edge
    layout = V.build_layout(
        (t, h, w), vc.patch_size, vc.spatial_merge_size, vc.window_size,
        vc.head_dim,
    )
    if layout.win_uniform:
        pytest.skip("grid unexpectedly uniform")
    params = qmodel.init_params(cfg, seed=5, dtype=jnp.float32)["vision"]
    px = jnp.asarray(
        rng_np.standard_normal((t * h * w, vc.patch_input_dim)), jnp.float32
    )
    ref = V.vision_forward(params, px, layout, vc)
    monkeypatch.setenv("QV_PALLAS_INTERPRET", "1")
    out = V.vision_forward(params, px, layout, vc)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_bf16_rotary_close_to_f32(rng_np):
    """Vision rotary computes in the activation dtype for bf16 (perf: the
    f32 round-trip was ~30% of the tower on v5e); error vs the f32 path
    must stay at bf16-ulp scale."""
    L, H, HD2 = 64, 4, 32
    x = jnp.asarray(rng_np.standard_normal((L, H, HD2)), jnp.bfloat16)
    ang = rng_np.uniform(0, 6.28, (L, HD2))
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    out = V._apply_vision_rotary(x, cos, sin)
    assert out.dtype == jnp.bfloat16
    xf = x.astype(jnp.float32)
    ref = xf * cos[:, None] + V._rotate_half(xf) * sin[:, None]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )
    # f32 inputs still take the exact path
    out32 = V._apply_vision_rotary(xf, cos, sin)
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_vision_tower_kernel_path_matches_xla(rng_np, monkeypatch):
    """Whole tower with QV_PALLAS_INTERPRET (kernel path, interpret) vs the
    default XLA path on an aligned (uniform-window) grid."""
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel

    cfg = get_config("tiny")
    vc = cfg.vision
    t, h, w = 2, 8, 8  # aligned: vit window edge divides the unit grid
    layout = V.build_layout(
        (t, h, w), vc.patch_size, vc.spatial_merge_size, vc.window_size,
        vc.head_dim,
    )
    assert layout.win_uniform
    params = qmodel.init_params(cfg, seed=3, dtype=jnp.float32)["vision"]
    px = jnp.asarray(
        rng_np.standard_normal((t * h * w, vc.patch_input_dim)), jnp.float32
    )

    ref = V.vision_forward(params, px, layout, vc)
    monkeypatch.setenv("QV_PALLAS_INTERPRET", "1")
    out = V.vision_forward(params, px, layout, vc)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    # engine weight prep: precomputed stacked padded leaves (wqkv_p/...)
    # must give the identical tower output as the inline-pad path above
    prepped = V.add_padded_block_weights(params, vc)
    assert "wqkv_p" in prepped["blocks"]
    out_p = V.vision_forward(prepped, px, layout, vc)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out), rtol=1e-6, atol=1e-6
    )
    # idempotent: a second prep call returns the tree unchanged
    assert V.add_padded_block_weights(prepped, vc) is prepped


def test_bucketed_ragged_forward_kernel_matches_xla(monkeypatch):
    """Ragged grid through the full tower: per-bucket kernel calls +
    frame-permuted full-attention (interpret mode) vs the pure-XLA path."""
    import jax
    import jax.numpy as jnp
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel
    from quickvideo_tpu.models.qwen25_vl.vision import (
        build_layout, init_vision_params,
    )

    cfg = get_config("tiny")
    grid = (2, 12, 12)  # llm grid 6x6, window edge 4 -> ragged buckets
    L = build_layout(
        grid, cfg.vision.patch_size, cfg.vision.spatial_merge_size,
        cfg.vision.window_size, cfg.vision.head_dim,
    )
    assert not L.win_uniform and len(L.buckets) >= 2
    rng = np.random.default_rng(3)
    s = grid[0] * grid[1] * grid[2]
    pixels = rng.standard_normal(
        (s, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    params = {"vision": init_vision_params(
        cfg.vision, jax.random.key(0), jnp.float32
    )}
    ref = np.asarray(qmodel.encode_video_group(
        params, cfg, jnp.asarray(pixels), grid
    ))
    monkeypatch.setenv("QV_PALLAS_INTERPRET", "1")
    jax.clear_caches()
    got = np.asarray(qmodel.encode_video_group(
        params, cfg, jnp.asarray(pixels), grid
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("span,nspan", [(8, 12), (96, 2)])
def test_kernel2d_matches_rotate_then_attend_oracle(rng_np, span, nspan):
    """2D padded-head layout with FUSED rotary == rotate q/k then
    block-attend, per head, with pad lanes exactly zero."""
    nh, hd, dp = 3, 10, 128
    rot_half = hd // 2
    s = span * nspan
    q = rng_np.standard_normal((s, nh, hd)).astype(np.float32)
    k = rng_np.standard_normal((s, nh, hd)).astype(np.float32)
    v = rng_np.standard_normal((s, nh, hd)).astype(np.float32)
    ang = rng_np.uniform(0, 6.28, (s, rot_half))
    emb = np.concatenate([ang, ang], axis=-1)  # [h-freqs | w-freqs] layout
    cos = np.cos(emb).astype(np.float32)
    sin = np.sin(emb).astype(np.float32)

    def pad2d(x):  # (S, nh, hd) -> (S, nh*dp), pad lanes zero
        xp = np.zeros((s, nh, dp), np.float32)
        xp[:, :, :hd] = x
        return jnp.asarray(xp.reshape(s, nh * dp))

    cos_p = jnp.asarray(np.pad(cos, ((0, 0), (0, dp - hd))))
    sin_p = jnp.asarray(np.pad(sin, ((0, 0), (0, dp - hd))))
    from quickvideo_tpu.ops.vision_attention import block_diag_attention_2d

    out2 = block_diag_attention_2d(
        pad2d(q), pad2d(k), pad2d(v), span,
        scale=hd ** -0.5, nh=nh, dp=dp, cos=cos_p, sin=sin_p,
        rot_half=rot_half, interpret=True,
    )
    out2 = np.asarray(out2).reshape(s, nh, dp)

    qr = V._apply_vision_rotary(
        jnp.asarray(q), jnp.asarray(cos), jnp.asarray(sin)
    )
    kr = V._apply_vision_rotary(
        jnp.asarray(k), jnp.asarray(cos), jnp.asarray(sin)
    )
    ref = V._block_attention(
        qr.reshape(nspan, span, nh, hd), kr.reshape(nspan, span, nh, hd),
        jnp.asarray(v).reshape(nspan, span, nh, hd), None, hd ** -0.5,
    ).reshape(s, nh, hd)
    np.testing.assert_allclose(
        out2[:, :, :hd], np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    assert (out2[:, :, hd:] == 0).all()


def test_pad_head_weights_preserve_projection(rng_np):
    """_pad_head_cols / _pad_head_rows keep the projection numerics exact:
    padded-weight matmul == unpadded matmul with zeros interleaved."""
    c, nh, hd, dp = 12, 2, 6, 128
    w = rng_np.standard_normal((c, 3 * nh * hd)).astype(np.float32)
    x = rng_np.standard_normal((5, c)).astype(np.float32)
    wp = V._pad_head_cols(jnp.asarray(w), nh, hd, dp)
    assert wp.shape == (c, 3 * nh * dp)
    yp = np.asarray(x @ np.asarray(wp)).reshape(5, 3 * nh, dp)
    y = (x @ w).reshape(5, 3 * nh, hd)
    np.testing.assert_allclose(yp[:, :, :hd], y, rtol=1e-5, atol=1e-5)
    assert (yp[:, :, hd:] == 0).all()

    wo = rng_np.standard_normal((nh * hd, c)).astype(np.float32)
    wop = V._pad_head_rows(jnp.asarray(wo), nh, hd, dp)
    assert wop.shape == (nh * dp, c)
    a = rng_np.standard_normal((5, nh, hd)).astype(np.float32)
    ap = np.zeros((5, nh, dp), np.float32)
    ap[:, :, :hd] = a
    np.testing.assert_allclose(
        ap.reshape(5, -1) @ np.asarray(wop), a.reshape(5, -1) @ wo,
        rtol=1e-5, atol=1e-5,
    )
