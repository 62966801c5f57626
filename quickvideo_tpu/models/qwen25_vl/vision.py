"""Qwen2.5-VL vision tower (ViT) in JAX — TPU-native formulation.

Semantics match HF's `Qwen2_5_VisionTransformerPretrainedModel` (consulted in
the installed transformers dependency; engaged by the reference at
lvu/models/qwen25_vl.py via the HF model), but the execution strategy is
rebuilt for XLA:

  * All index bookkeeping (window permutation, rotary position tables,
    segment layouts) is precomputed host-side per `grid_thw` and cached —
    grid shapes are static per video group, so the traced program sees only
    fixed-shape gathers/reshapes.
  * HF's varlen flash-attention over `cu_seqlens` becomes BATCHED block
    attention: window-attention layers reshape to (num_windows, window_len)
    (uniform case) or gather to a padded (num_windows, max_win) layout with a
    validity mask; full-attention layers batch over temporal frames
    (t, h*w) — per HF, "full" attention is still block-diagonal per temporal
    patch (cu_seqlens = repeat_interleave(h*w, t)).
  * The Conv3d patch embed is a single matmul over the flattened
    (3 * temporal_patch * patch * patch) input — MXU-friendly.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl.config import VisionConfig
from quickvideo_tpu.ops.quantization import (
    is_quantized,
    qdot_multi,
    vision_mlp_act_quant,
)
from quickvideo_tpu.ops.quantization import qdot_vision as qdot

Array = jax.Array


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_vision_params(cfg: VisionConfig, key: Array, dtype=jnp.bfloat16):
    n, c, i = cfg.depth, cfg.hidden_size, cfg.intermediate_size
    merge_dim = c * cfg.spatial_merge_unit
    ks = jax.random.split(key, 8)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "patch_embed": nrm(ks[0], (cfg.patch_input_dim, c)),
        "blocks": {
            "ln1": jnp.ones((n, c), dtype),
            "ln2": jnp.ones((n, c), dtype),
            "wqkv": nrm(ks[1], (n, c, 3 * c)),
            "bqkv": jnp.zeros((n, 3 * c), dtype),
            "wo": nrm(ks[2], (n, c, c)),
            "bo": jnp.zeros((n, c), dtype),
            "wg": nrm(ks[3], (n, c, i)),
            "bg": jnp.zeros((n, i), dtype),
            "wu": nrm(ks[4], (n, c, i)),
            "bu": jnp.zeros((n, i), dtype),
            "wd": nrm(ks[5], (n, i, c)),
            "bd": jnp.zeros((n, c), dtype),
        },
        "merger": {
            "ln_q": jnp.ones((c,), dtype),
            "w1": nrm(ks[6], (merge_dim, merge_dim)),
            "b1": jnp.zeros((merge_dim,), dtype),
            "w2": nrm(ks[7], (merge_dim, cfg.out_hidden_size)),
            "b2": jnp.zeros((cfg.out_hidden_size,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Host-side layout precomputation (cached per grid)
# ---------------------------------------------------------------------------


class VisionLayout(NamedTuple):
    """Static index plan for one (t, h, w) patch grid."""

    grid_thw: Tuple[int, int, int]
    perm: np.ndarray  # (S,) patch-level window-order permutation
    inv_perm_units: np.ndarray  # (S/merge_unit,) undo for merger output
    cos: np.ndarray  # (S, head_dim) rotary table, window order
    sin: np.ndarray
    nw: int  # number of windows
    mw: int  # max window length in patches (uniform grids: THE length)
    win_uniform: bool  # True -> plain reshape works (no padding)
    frame_len: int  # h*w patches per temporal frame (full-attn block)
    seq_len: int
    # Ragged grids: windows are SIZE-BUCKETED in the permutation (all
    # largest-size windows first, then the next size, ...) so window
    # attention runs as one uniform block-diagonal call per bucket on a
    # contiguous slice — no padding, no masks, no gather/scatter (the old
    # padded-gather path cost ~2x tower time at strict-resize grids).
    # buckets: ((span_patches, start_row, end_row), ...) static.
    buckets: Tuple[Tuple[int, int, int], ...] = ()
    # Bucketing breaks per-temporal-slice contiguity, which the per-frame
    # full-attention layers need — they permute through these (patch-level).
    frame_perm: Optional[np.ndarray] = None  # bucket order -> frame-grouped
    frame_inv: Optional[np.ndarray] = None  # and back


@functools.lru_cache(maxsize=64)
def build_layout(
    grid_thw: Tuple[int, int, int],
    patch_size: int,
    spatial_merge_size: int,
    window_size: int,
    head_dim: int,
    theta: float = 10000.0,
) -> VisionLayout:
    t, h, w = grid_thw
    sm = spatial_merge_size
    unit = sm * sm
    lh, lw = h // sm, w // sm  # merged-unit grid
    s = t * h * w

    # --- window permutation over merge units (HF get_window_index) ---
    vit_win = window_size // sm // patch_size  # units per window edge
    pad_h = (-lh) % vit_win
    pad_w = (-lw) % vit_win
    nwh, nww = (lh + pad_h) // vit_win, (lw + pad_w) // vit_win
    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    idxp = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
    idxp[:, :lh, :lw] = idx
    idxp = (
        idxp.reshape(t, nwh, vit_win, nww, vit_win)
        .transpose(0, 1, 3, 2, 4)
        .reshape(t, nwh * nww, vit_win, vit_win)
    )
    seqlens_units = (idxp != -100).sum(axis=(2, 3)).reshape(-1)  # per window
    buckets: Tuple[Tuple[int, int, int], ...] = ()
    frame_perm = frame_inv = None
    if (seqlens_units == seqlens_units[0]).all():
        flat = idxp.reshape(-1)
        window_index = flat[flat != -100]  # (t*lh*lw,) unit-level perm
    else:
        # ragged windows: size-bucket them (stable sort, largest first) so
        # attention runs uniform per bucket (see VisionLayout docstring)
        rows = idxp.reshape(t * nwh * nww, vit_win * vit_win)
        order = np.argsort(-seqlens_units, kind="stable")
        window_index = np.concatenate(
            [rows[i][rows[i] != -100] for i in order]
        )
        sizes_sorted = seqlens_units[order]
        blist = []
        start = 0
        for size in sorted(set(sizes_sorted.tolist()), reverse=True):
            n_here = int((sizes_sorted == size).sum())
            span = size * unit
            blist.append((span, start, start + n_here * span))
            start += n_here * span
        buckets = tuple(blist)
        # full-attention layers need rows grouped by temporal slice
        units_per_slice = lh * lw
        slice_of_unit = window_index // units_per_slice
        slice_of_patch = np.repeat(slice_of_unit, unit)
        frame_perm = np.argsort(slice_of_patch, kind="stable")
        frame_inv = np.argsort(frame_perm, kind="stable")

    # patch-level permutation: each unit is `unit` consecutive patches
    perm = (window_index[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    inv_perm_units = np.argsort(window_index, kind="stable")

    # --- rotary tables (HF rot_pos_emb), then reorder to window order ---
    hp = np.arange(h).reshape(h, 1).repeat(w, 1)
    hp = (
        hp.reshape(lh, sm, lw, sm).transpose(0, 2, 1, 3).reshape(-1)
    )
    wp = np.arange(w).reshape(1, w).repeat(h, 0)
    wp = (
        wp.reshape(lh, sm, lw, sm).transpose(0, 2, 1, 3).reshape(-1)
    )
    pos_hw = np.stack([hp, wp], axis=-1)  # (h*w, 2)
    pos_hw = np.tile(pos_hw, (t, 1))  # (S, 2)
    half = head_dim // 2  # rotary dim per (h, w) axis pair
    inv_freq = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float64) / half))
    freqs = pos_hw[:, :, None].astype(np.float64) * inv_freq[None, None, :]
    rot = freqs.reshape(s, -1)  # (S, head_dim/2): [h-freqs | w-freqs]
    emb = np.concatenate([rot, rot], axis=-1)  # (S, head_dim)
    cos = np.cos(emb)[perm].astype(np.float32)
    sin = np.sin(emb)[perm].astype(np.float32)

    nw = len(seqlens_units)
    mw = int(seqlens_units.max()) * unit if nw else 0
    win_uniform = not buckets

    return VisionLayout(
        grid_thw=grid_thw,
        perm=perm,
        inv_perm_units=inv_perm_units,
        cos=cos,
        sin=sin,
        nw=nw,
        mw=mw,
        win_uniform=win_uniform,
        frame_len=h * w,
        seq_len=s,
        buckets=buckets,
        frame_perm=frame_perm,
        frame_inv=frame_inv,
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_vision_rotary(x, cos, sin):
    # x: (..., L, H, D); cos/sin: (L, D) -> broadcast over heads. HF
    # apply_rotary_pos_emb_vision upcasts to f32; here the rotation runs in
    # the activation dtype instead — for bf16 activations the inputs and
    # outputs are bf16-rounded either way, so the extra error is <=1 ulp per
    # element, and the f32 round-trip measured 59 ms/group on v5e (~30% of
    # the whole tower; see BENCH_RESULTS.md). f32 activations (tests,
    # torch-parity) still rotate in f32 exactly.
    c = cos.astype(x.dtype)[:, None, :]
    s = sin.astype(x.dtype)[:, None, :]
    return x * c + _rotate_half(x) * s


def _block_attention(q, k, v, valid, scale):
    """Batched block attention. q/k/v: (B, L, H, D); valid: (B, L) bool or
    None. Returns (B, L, H, D) in f32. Matmuls run at the input dtype
    (bf16 on TPU -> full MXU rate) with f32 accumulation; softmax in f32."""
    scores = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if valid is not None:
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhlm,bmhd->blhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out


def _pad_head_cols(w, nh: int, hd: int, dp: int):
    """Pad a (..., in, G*nh*hd) projection weight's OUTPUT columns so each
    head occupies `dp` lanes (G = 1 or 3 fused groups). Pad columns are zero
    (quantized: q8 zeros with a harmless nonzero scale), so the padded
    matmul emits exact zeros in the pad lanes — numerics unchanged, but the
    (S, G*nh*dp) output splits into lane-tile-aligned heads for FREE (the
    (S, nh, hd=80) reshape this replaces was a full cross-lane relayout)."""
    def padcols(a):
        g = a.shape[-1] // (nh * hd)
        a4 = a.reshape(*a.shape[:-1], g * nh, hd)
        a4 = jnp.pad(
            a4, [(0, 0)] * (a4.ndim - 1) + [(0, dp - hd)]
        )
        return a4.reshape(*a.shape[:-1], g * nh * dp)

    if is_quantized(w):
        return {"q8": padcols(w["q8"]),
                "sc": jnp.maximum(padcols(w["sc"]), 1e-8)}
    return padcols(w)


def _pad_head_rows(w, nh: int, hd: int, dp: int):
    """Pad a (nh*hd, out) projection weight's INPUT rows to nh*dp — the
    attention output arrives head-padded; pad rows multiply the (zero) pad
    lanes, so values are unchanged."""
    def padrows(a):
        a3 = a.reshape(nh, hd, *a.shape[1:])
        a3 = jnp.pad(a3, [(0, 0), (0, dp - hd)] + [(0, 0)] * (a3.ndim - 2))
        return a3.reshape(nh * dp, *a.shape[1:])

    if is_quantized(w):
        return {"q8": padrows(w["q8"]), "sc": w["sc"]}
    return padrows(w)


def add_padded_block_weights(vision_params: dict, cfg: VisionConfig) -> dict:
    """One-time weight prep for the 2D padded-head attention path: add
    lane-padded copies (`wqkv_p`/`bqkv_p`/`wo_p`) of the STACKED block
    projection weights. The traced forward consumes these directly —
    padding inside vision_block re-derives the same tensors per block per
    group call (weights are jit arguments, so XLA cannot hoist or
    constant-fold the pads; measured as redundant HBM write+read traffic
    of the padded qkv/wo weights every forward). Idempotent; returns a new
    dict sharing every unpadded leaf. Memory cost: (dp/hd − 1) ≈ 60% extra
    on the qkv/wo leaves only (~130 MB int8 on the 7B tower)."""
    nh, hd = cfg.num_heads, cfg.head_dim
    dp = -(-hd // 128) * 128
    blocks = vision_params.get("blocks")
    if blocks is None or dp == hd or "wqkv_p" in blocks:
        return vision_params

    def pad_cols(w):  # (..., G*nh*hd) output-column pad (quantized-aware)
        return _pad_head_cols(w, nh, hd, dp)

    def pad_rows(w):  # (depth, nh*hd, out) input-row pad, stacked
        def padrows(a):
            a4 = a.reshape(a.shape[0], nh, hd, *a.shape[2:])
            a4 = jnp.pad(
                a4,
                [(0, 0), (0, 0), (0, dp - hd)] + [(0, 0)] * (a4.ndim - 3),
            )
            return a4.reshape(a.shape[0], nh * dp, *a.shape[2:])

        if is_quantized(w):
            return {"q8": padrows(w["q8"]), "sc": w["sc"]}
        return padrows(w)

    new_blocks = dict(blocks)
    new_blocks["wqkv_p"] = jax.jit(pad_cols)(blocks["wqkv"])
    new_blocks["bqkv_p"] = jax.jit(pad_cols)(blocks["bqkv"])
    new_blocks["wo_p"] = jax.jit(pad_rows)(blocks["wo"])
    out = dict(vision_params)
    out["blocks"] = new_blocks
    return out


def vision_block(
    bp: dict,
    x: Array,  # (S, C) window order
    layout_arrays: dict,
    cfg: VisionConfig,
    *,
    full_attn: bool,
    uniform: bool,
    nw: int,
    mw: int,
    t: int,
    frame_len: int,
    buckets: Tuple[Tuple[int, int, int], ...] = (),
):
    c = cfg.hidden_size
    nh = cfg.num_heads
    hd = cfg.head_dim
    scale = hd ** -0.5
    h = _rms_norm(x, bp["ln1"], cfg.rms_norm_eps)

    s_len = x.shape[0]
    interp = bool(os.environ.get("QV_PALLAS_INTERPRET"))
    on_kernel_backend = interp or jax.default_backend() not in ("cpu", "gpu")

    def _va():
        from quickvideo_tpu.ops import vision_attention

        return vision_attention

    # --- 2D padded-head fast path -------------------------------------
    # Heads are padded to a full 128-lane tile IN THE WEIGHT, the attention
    # kernel consumes the raw (S, nh*dp) projection columns, and the rotary
    # runs inside the kernel on VMEM tiles. This removes, per block: the
    # (S, nh, hd) head-split relayout, two full-HBM rotary passes over
    # lane-padded q/k, three (S,nh,hd)->(nh,S,hd) transposes and the output
    # transpose (together ~100 of the 7B strict tower's ~200 ms/group).
    dp = -(-hd // 128) * 128
    spans_needed = (
        [(s_len, frame_len)] if full_attn
        else [(s_len, mw)] if uniform
        else [(b - a, span) for span, a, b in buckets]
    )
    use2d = (
        on_kernel_backend
        and os.environ.get("QV_VISION_2D", "1") != "0"
        and "cos_p" in layout_arrays
        and hd % 2 == 0
        and all(
            n > 0 and _va().kernel_applicable(n, span)
            for n, span in spans_needed
        )
    )
    if use2d:
        va = _va()
        # padded projection weights: precomputed stacked copies when the
        # engine prepped them (add_padded_block_weights — one-time, outside
        # the trace), inline pad otherwise (eager/test callers; inside a jit
        # this re-pads per block per call, so hot paths should prep)
        if "wqkv_p" in bp:
            wqkv_p, bqkv_p, wo_p = bp["wqkv_p"], bp["bqkv_p"], bp["wo_p"]
        else:
            wqkv_p = _pad_head_cols(bp["wqkv"], nh, hd, dp)
            bqkv_p = _pad_head_cols(bp["bqkv"], nh, hd, dp)
            wo_p = _pad_head_rows(bp["wo"], nh, hd, dp)
        from quickvideo_tpu.ops import fused_vision_mlp as FM

        if FM.fused_qkv_enabled() and is_quantized(wqkv_p):
            # ln1 + per-row act-quantize + int8 GEMM + bias in ONE Pallas
            # pass (ops/fused_vision_mlp.ln_gemm_bias). Numerics: act-quant
            # instead of the weight-only bf16 GEMM (same int8-act family as
            # the default MLP chain); QV_FUSED_VISION_QKV=0 restores it.
            qkv2 = FM.ln_gemm_bias(
                x, bp["ln1"], wqkv_p, bqkv_p,
                eps=cfg.rms_norm_eps, interpret=interp,
            )
        else:
            qkv2 = qdot(h, wqkv_p).astype(x.dtype) + bqkv_p
        q2, k2, v2 = jnp.split(qkv2, 3, axis=-1)
        cos_p = layout_arrays["cos_p"].astype(x.dtype)
        sin_p = layout_arrays["sin_p"].astype(x.dtype)
        kw2 = dict(scale=scale, nh=nh, dp=dp, rot_half=hd // 2,
                   interpret=interp)
        if full_attn and buckets:
            fp = layout_arrays["frame_perm"]
            out2 = va.block_diag_attention_2d(
                q2[fp], k2[fp], v2[fp], frame_len,
                cos=cos_p[fp], sin=sin_p[fp], **kw2,
            )[layout_arrays["frame_inv"]]
        elif full_attn:
            out2 = va.block_diag_attention_2d(
                q2, k2, v2, frame_len, cos=cos_p, sin=sin_p, **kw2,
            )
        elif uniform:
            out2 = va.block_diag_attention_2d(
                q2, k2, v2, mw, cos=cos_p, sin=sin_p, **kw2,
            )
        else:
            out2 = jnp.concatenate(
                [
                    va.block_diag_attention_2d(
                        q2[a:b], k2[a:b], v2[a:b], span,
                        cos=cos_p[a:b], sin=sin_p[a:b], **kw2,
                    )
                    for span, a, b in buckets
                ],
                axis=0,
            )
        attn_out = qdot(out2, wo_p).astype(x.dtype) + bp["bo"]
        return _vision_mlp(bp, x + attn_out, cfg)

    qkv = qdot(h, bp["wqkv"]).astype(x.dtype) + bp["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(-1, nh, hd)
    k = k.reshape(-1, nh, hd)
    v = v.reshape(-1, nh, hd)
    q = _apply_vision_rotary(q, layout_arrays["cos"], layout_arrays["sin"])
    k = _apply_vision_rotary(k, layout_arrays["cos"], layout_arrays["sin"])

    def _span_attention(qs, ks, vs, span):
        """Uniform block-diagonal attention over contiguous `span`s —
        fused kernel when applicable, XLA batched blocks otherwise."""
        n = qs.shape[0]
        if on_kernel_backend and _va().kernel_applicable(n, span):
            return _va().block_diag_attention(
                qs, ks, vs, span, scale=scale, interpret=interp
            ).astype(jnp.float32)
        ob = _block_attention(
            qs.reshape(n // span, span, nh, hd),
            ks.reshape(n // span, span, nh, hd),
            vs.reshape(n // span, span, nh, hd),
            None, scale,
        )
        return ob.reshape(n, nh, hd)

    if full_attn:
        # per-temporal-frame full attention. Ragged (bucketed) layouts
        # interleave windows of different temporal slices, so regroup rows
        # by slice through the static frame permutation first (~0.1 ms of
        # row gathers vs the padded-gather+scatter this design replaced).
        if buckets:
            fp = layout_arrays["frame_perm"]
            out = _span_attention(q[fp], k[fp], v[fp], frame_len)
            out = out[layout_arrays["frame_inv"]]
        else:
            # frames are contiguous in plain window order (windows never
            # cross temporal patches)
            out = _span_attention(q, k, v, frame_len)
    elif uniform:
        out = _span_attention(q, k, v, mw)
    else:
        # ragged windows, size-bucketed by the layout: one uniform
        # block-diagonal call per bucket on a contiguous slice. No padding,
        # no masks, no gather/scatter — the old padded-gather path measured
        # 285 vs 141 ms/group (24% vs 43% MFU) against aligned grids.
        out = jnp.concatenate(
            [
                _span_attention(q[a:b], k[a:b], v[a:b], span)
                for span, a, b in buckets
            ],
            axis=0,
        )

    attn_out = out.astype(x.dtype).reshape(s_len, c)
    attn_out = qdot(attn_out, bp["wo"]).astype(x.dtype) + bp["bo"]
    return _vision_mlp(bp, x + attn_out, cfg)


def _vision_mlp(bp: dict, x: Array, cfg: VisionConfig) -> Array:
    """ln2 + SwiGLU-style (gate/up/down) MLP with f32 matmul accumulation,
    model-dtype activations (= HF bf16 Linear). With int8 weights the MLP
    matmuls run int8 x int8 (vision_mlp_act_quant): gate/up share ONE
    activation-quantize pass via qdot_multi, and the attention projections
    stay weight-only (their K=1280 contraction loses under act-quant —
    measured; see ops/quantization.py).

    Fused fast path (TPU, int8, prepped weights): the gate/up dots + rescale
    + bias + silu*mul + act-quantize run as ONE Pallas kernel
    (ops/fused_vision_mlp.py) — the (S, I) s32/bf16 intermediates never
    touch HBM (~0.5 ms/block of structural traffic XLA cannot fuse across
    the dots; measured in benchmarks/vision_glue_probe.py)."""
    act = vision_mlp_act_quant() and is_quantized(bp["wg"])
    if act and "wgu_p" in bp:
        from quickvideo_tpu.ops import fused_vision_mlp as FM
        from quickvideo_tpu.ops.quantization import qdot_pre

        interp = bool(os.environ.get("QV_PALLAS_INTERPRET"))
        if FM.fused_mlp_enabled() and (
            interp or jax.default_backend() not in ("cpu", "gpu")
        ):
            # ln2 + quantize run INSIDE the kernel too (round 5: the
            # normed/quantized (S, C) intermediates never touch HBM)
            mq8, ms = FM.ln_dual_gemm_silu_quant(
                x, bp["ln2"], bp["wgu_p"], bp["bgu_p"],
                eps=cfg.rms_norm_eps, interpret=interp,
            )
            y = qdot_pre(mq8, ms, bp["wd_p"]).astype(x.dtype) + bp["bd"]
            return x + y
    h2 = _rms_norm(x, bp["ln2"], cfg.rms_norm_eps)
    g, u = qdot_multi(h2, (bp["wg"], bp["wu"]), act_quant=act)
    g = g.astype(x.dtype) + bp["bg"]
    u = u.astype(x.dtype) + bp["bu"]
    mlp = jax.nn.silu(g) * u
    mlp = qdot(mlp, bp["wd"], act_quant=act).astype(x.dtype) + bp["bd"]
    return x + mlp


def layout_arrays_for(layout: VisionLayout) -> dict:
    """Device-array view of a layout — passed as ARGUMENTS to the jitted
    tower (baking them in as HLO constants adds O(S * head_dim) bytes to the
    program, which overflows remote-compile transports and bloats caches)."""
    arrays = {
        "perm": jnp.asarray(layout.perm),
        "inv_perm_units": jnp.asarray(layout.inv_perm_units),
        "cos": jnp.asarray(layout.cos),
        "sin": jnp.asarray(layout.sin),
    }
    # lane-padded rotary tables for the 2D padded-head attention path:
    # (S, dp) with the head's real hd lanes carrying cos/sin and the pad
    # lanes zero (pad lanes of q/k are zero too, so rotary keeps them zero)
    hd = layout.cos.shape[1]
    dp = -(-hd // 128) * 128
    arrays["cos_p"] = jnp.asarray(
        np.pad(layout.cos, ((0, 0), (0, dp - hd)))
    )
    arrays["sin_p"] = jnp.asarray(
        np.pad(layout.sin, ((0, 0), (0, dp - hd)))
    )
    if layout.frame_perm is not None:
        arrays["frame_perm"] = jnp.asarray(layout.frame_perm)
        arrays["frame_inv"] = jnp.asarray(layout.frame_inv)
    return arrays


def vision_forward(
    params: dict,
    pixels: Array,  # (S, patch_input_dim) raster order (HF pixel_values layout)
    layout: VisionLayout,
    cfg: VisionConfig,
    layout_arrays: Optional[dict] = None,
    native_hw: Optional[Tuple[int, int]] = None,  # decoder-native (H, W) of
    # incoming frames when resize happens ON DEVICE (lvu.resize_on_device)
) -> Array:
    """Full tower: patch embed -> window-reorder -> blocks -> merger ->
    original order. Returns (S / merge_unit, out_hidden_size).

    `layout_arrays` (from layout_arrays_for) should be passed as traced
    arguments by jitted callers; when None they are materialized inline
    (eager/test use)."""
    if layout_arrays is None:
        layout_arrays = layout_arrays_for(layout)
    pdtype = params["blocks"]["ln1"].dtype
    fh = layout.grid_thw[1] * cfg.patch_size
    fw = layout.grid_thw[2] * cfg.patch_size
    # device-side resize: frames arrive at the DECODER-NATIVE size and are
    # resampled to the model grid here. On a weak host the swscale LANCZOS
    # resize dominates serial decode time (measured 5.7 s vs 1.4 s per
    # 1024-frame run when the target width is not SIMD-aligned); lanczos3
    # on the TPU is bandwidth-trivial next to the ViT and frees the host to
    # just demux+decode. (The reference resizes in-decoder because its 16
    # CPU cores are plentiful and PCIe transfer of native frames is not —
    # the opposite trade holds here.)
    sh, sw = native_hw if native_hw else (fh, fw)
    if pixels.ndim == 2 and pixels.dtype == jnp.uint8 and (
        pixels.shape[1] == sh * sw * 3 // 2
    ):
        # packed YUV420p frames (T, H*W*3/2): half the host->device bytes of
        # RGB. Chroma nearest-upsample + limited-range BT.601 matrix on
        # device (matches swscale's yuv420p->rgb within +-2 levels).
        t_frames = pixels.shape[0]
        hw = sh * sw
        y = pixels[:, :hw].reshape(t_frames, sh, sw).astype(jnp.float32)
        u = pixels[:, hw : hw + hw // 4].reshape(
            t_frames, sh // 2, sw // 2
        ).astype(jnp.float32)
        v = pixels[:, hw + hw // 4 :].reshape(
            t_frames, sh // 2, sw // 2
        ).astype(jnp.float32)
        u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
        v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
        c = (y - 16.0) * 1.1643835
        r = c + 1.5960268 * v
        g = c - 0.3917623 * u - 0.8129676 * v
        b = c + 2.0172321 * u
        pixels = jnp.clip(
            jnp.stack([r, g, b], axis=1), 0.0, 255.0
        )
        # values stay in the 0..255 domain as float32; _yuv_float routes
        # them through the uint8-affine normalize branch below (after the
        # shared 4-D patchify)
        _yuv_float = True
    else:
        _yuv_float = False
    if pixels.ndim == 4 and pixels.shape[2:] != (fh, fw):
        # native-size frames -> model grid (antialiased 3-lobe Lanczos, the
        # same family as swscale/PIL LANCZOS; parity within resampler
        # rounding, tests/test_preprocess.py)
        if pixels.dtype == jnp.uint8:
            pixels = pixels.astype(jnp.float32)
            _yuv_float = True
        pixels = jnp.clip(
            jax.image.resize(
                pixels, (*pixels.shape[:2], fh, fw), method="lanczos3",
                antialias=True,
            ),
            0.0, 255.0,
        )
    if pixels.ndim == 4:
        # raw decoded frames (T, C, H, W): patchify ON DEVICE (the HF
        # merged-unit interleave is a pure reshape/transpose — free for XLA,
        # and it takes the host entirely out of the per-pixel pipeline)
        t_frames, c, fh, fw = pixels.shape
        tps = cfg.temporal_patch_size
        ps = cfg.patch_size
        ms = cfg.spatial_merge_size
        if t_frames % tps != 0:
            pad = tps - t_frames % tps
            pixels = jnp.concatenate(
                [pixels, jnp.repeat(pixels[-1:], pad, axis=0)], axis=0
            )
            t_frames = pixels.shape[0]
        gt, gh, gw = t_frames // tps, fh // ps, fw // ps
        pixels = pixels.reshape(
            gt, tps, c, gh // ms, ms, ps, gw // ms, ms, ps
        ).transpose(0, 3, 6, 4, 7, 2, 1, 5, 8).reshape(
            gt * gh * gw, c * tps * ps * ps
        )
    if pixels.dtype == jnp.uint8 or _yuv_float:
        # raw 0..255 patches: rescale + CLIP normalize on device (tiny
        # per-channel affine; host stays out of the float pipeline)
        from quickvideo_tpu.video.preprocess import patch_norm_scale_bias

        scale, bias = patch_norm_scale_bias(
            cfg.patch_size, cfg.temporal_patch_size, cfg.in_channels
        )
        pixels = (
            pixels.astype(jnp.float32) * jnp.asarray(scale)
            + jnp.asarray(bias)
        ).astype(pdtype)
    x = qdot(pixels.astype(pdtype), params["patch_embed"]).astype(pdtype)
    x = x[layout_arrays["perm"]]
    t = layout.grid_thw[0]
    nw, mw = layout.nw, layout.mw
    # scan over blocks with a per-layer full/window flag — one compiled layer
    # body instead of a depth-unrolled HLO (32 blocks unrolled made XLA
    # compile times explode on the 670M tower)
    full_flags = jnp.asarray(
        [li in cfg.fullatt_block_indexes for li in range(cfg.depth)],
        jnp.bool_,
    )

    def body(xh, xs):
        bp, is_full = xs
        kw = dict(
            layout_arrays=layout_arrays, cfg=cfg,
            uniform=layout.win_uniform, nw=nw, mw=mw, t=t,
            frame_len=layout.frame_len, buckets=layout.buckets,
        )
        xh = jax.lax.cond(
            is_full,
            lambda h: vision_block(bp, h, full_attn=True, **kw),
            lambda h: vision_block(bp, h, full_attn=False, **kw),
            xh,
        )
        return xh, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], full_flags))
    # merger (HF Qwen2_5_VLPatchMerger): RMSNorm -> concat merge_unit patches
    # -> Linear -> GELU -> Linear
    mp = params["merger"]
    xm = _rms_norm(x, mp["ln_q"], cfg.rms_norm_eps)
    unit = cfg.spatial_merge_unit
    xm = xm.reshape(-1, unit * cfg.hidden_size)
    h1 = qdot(xm, mp["w1"]) + mp["b1"].astype(jnp.float32)
    h1 = jax.nn.gelu(h1, approximate=False).astype(x.dtype)
    out = qdot(h1, mp["w2"]).astype(x.dtype) + mp["b2"]
    return out[layout_arrays["inv_perm_units"]]
