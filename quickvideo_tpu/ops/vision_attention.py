"""Fused block-diagonal attention for the vision tower (Pallas/Mosaic).

The Qwen2.5-VL vision tower runs window attention (64-patch windows) in 28
of 32 blocks and per-frame full attention (h*w-patch spans) in the rest
(reference qwen2_5_vl modeling: window/full split via fullatt_block_indexes).
In window order both are the same op: block-diagonal attention over
contiguous, equal-size spans.

The XLA formulation (batched (nw, 16, 64, 64) matmuls + f32 softmax through
HBM) measures ~1.5% MFU on v5e — each 64x64x80 matmul underfills the MXU
and the probabilities round-trip HBM (benchmarks/vision_bench.py: 97 ms of
a 214 ms group forward). This kernel tiles several whole spans into one
(TQ, 80) VMEM block per head, computes scores/softmax/PV entirely in VMEM,
and masks cross-span scores arithmetically (Mosaic rejects vector<i1>
selects; an additive -1e30 penalty avoids them).

Uniform spans (window-aligned resize; per-frame full attention) map
directly. Ragged windows (strict reference resize) are first padded into
uniform spans by the existing XLA window-gather, then attended here with a
per-column validity penalty operand (pad rows' outputs are garbage and are
dropped by the scatter). Grids whose spans admit no 8-row-aligned tiling
fall back to the XLA path entirely (kernel_applicable).

Diagonal sub-blocking: the (TQ, dp) tile packs several spans for DMA
efficiency, but a single TQ x TQ score matmul computes TQ/span times the
block-diagonal work actually needed (8x at span=64, TQ=512) and runs the
softmax over the same inflated tile. The kernels therefore compute scores
in span-aligned SUB-BLOCKS of ~128 rows along the diagonal: same DMA tile,
1/(TQ/sb) of the MXU MACs and softmax VPU passes (measured 0.96 ->
~0.5 ms/layer on the strict 7B window layers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

Array = jax.Array

NEG = -1e30


def _sub_block(tq: int, span: int) -> int:
    """Rows per diagonal score sub-block: the smallest span multiple >= 128
    (a full lane tile keeps the MXU shape efficient) that divides the tile.
    Equal to tq when no smaller aligned divisor exists (single-shot mode)."""
    if span >= tq:
        return tq
    sb = -(-128 // span) * span
    while sb < tq and (tq % sb or sb % 8):
        sb += span
    return min(sb, tq)


def _softmax_pv(s, v):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    # fully-masked rows (pad queries): den==0 -> emit 0, dropped by scatter
    p = p / jnp.maximum(den, 1e-30)
    return lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(*refs, span: int, tq: int, scale: float, masked: bool):
    # blocks: (1, TQ, hd). Spans are contiguous and TQ is a multiple of the
    # span length, so keys for every query live in the SAME tile; scores are
    # computed in span-aligned diagonal sub-blocks (see module docstring).
    if masked:
        q_ref, k_ref, v_ref, pen_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        pen_ref = None
    sb = _sub_block(tq, span)
    for j in range(tq // sb):
        rows = slice(j * sb, (j + 1) * sb)
        q = q_ref[0, rows]
        k = k_ref[0, rows]
        v = v_ref[0, rows]
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if span != sb:
            row = lax.broadcasted_iota(jnp.int32, (sb, sb), 0) // span
            col = lax.broadcasted_iota(jnp.int32, (sb, sb), 1) // span
            s = s + (row != col).astype(jnp.float32) * NEG
        if pen_ref is not None:
            # per-column validity penalty (0 valid / NEG padded),
            # lane-aligned with the score columns ((8, TQ)
            # sublane-replicated tile, row 0)
            s = s + pen_ref[0:1, rows]
        o_ref[0, rows] = _softmax_pv(s, v).astype(o_ref.dtype)


def _spans_per_tile(nspan: int, span: int) -> int:
    """Largest spans-per-tile <= ~2048 rows such that the tile divides the
    sequence AND is sublane-aligned (tile rows % 8 == 0 — Mosaic block
    constraint). Returns 0 when no packing satisfies both (caller falls
    back to the XLA path): e.g. odd-span ragged grids.

    The tile is a DMA/grid-step amortization unit, NOT the score shape —
    scores run in span-aligned ~128-row diagonal sub-blocks (_sub_block),
    so a big tile costs VMEM linearly (operands) instead of quadratically.
    The old 512-row cap (score = tq^2 f32 then) made the window kernel
    GRID-STEP-BOUND: 336 steps/layer x ~2.2 us DMA-issue = 0.74 ms of the
    measured 0.96 ms/layer at the strict 7B shape. The span cap stays:
    a single span is one sub-block, so its span^2 f32 score must fit VMEM
    (e.g. a 2304-row per-frame span -> 21 MB -> designed XLA fallback)."""
    if span > 1536:
        return 0
    for spt in range(max(1, 2048 // span), 0, -1):
        if nspan % spt == 0 and (spt * span) % 8 == 0:
            return spt
    # spans in (1024, 1536] rows (per-frame full attention) pack 2 when it
    # helps sublane alignment
    if nspan % 2 == 0 and (2 * span) % 8 == 0:
        return 2
    return 0


def kernel_applicable(s_len: int, span: int, masked: bool = False) -> bool:
    """Can block_diag_attention handle this (sequence, span)? The masked
    (padded-window) variant additionally needs 128-lane-aligned tiles for
    the penalty operand."""
    if s_len % span:
        return False
    spt = _spans_per_tile(s_len // span, span)
    if spt == 0:
        return False
    return not masked or (spt * span) % 128 == 0


def _kernel2d(
    q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref,
    *, span: int, tq: int, scale: float, rot_half: int,
):
    """2D-layout block-diag attention with FUSED rotary. Blocks are
    (tq, dp) column tiles — head h lives at lane block h, so the operands
    are the raw (S, nh*dp) projection outputs: no (S,nh,hd) reshape, no
    (nh,S,hd) transpose, and the rotary runs on VMEM-resident tiles instead
    of two full HBM passes over padded q/k (measured 33 ms of a 200 ms
    7B-strict tower)."""
    q = q_ref[...]
    k = k_ref[...]

    def rot(x):
        # rotate_half within the head's REAL hd lanes (pad lanes hold zeros
        # in x and in cos/sin, so they stay zero through the rotation)
        return jnp.concatenate(
            [
                -x[:, rot_half: 2 * rot_half],
                x[:, :rot_half],
                x[:, 2 * rot_half:],
            ],
            axis=1,
        )

    c = cos_ref[...]
    s_ = sin_ref[...]
    q = q * c + rot(q) * s_
    k = k * c + rot(k) * s_
    sb = _sub_block(tq, span)
    for j in range(tq // sb):
        rows = slice(j * sb, (j + 1) * sb)
        s = lax.dot_general(
            q[rows], k[rows], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if span != sb:
            row = lax.broadcasted_iota(jnp.int32, (sb, sb), 0) // span
            col = lax.broadcasted_iota(jnp.int32, (sb, sb), 1) // span
            s = s + (row != col).astype(jnp.float32) * NEG
        o_ref[rows] = _softmax_pv(s, v_ref[rows]).astype(o_ref.dtype)


def block_diag_attention_2d(
    q2: Array,  # (S, nh*dp): head h at columns [h*dp, (h+1)*dp); lanes
    # beyond the real head_dim are ZERO (padded at the projection weight)
    k2: Array,
    v2: Array,
    span: int,
    *,
    scale: float,
    nh: int,
    dp: int,  # padded per-head width (128 = one lane tile)
    cos: Array,  # (S, dp) rotary tables in q2.dtype, pad lanes zero
    sin: Array,
    rot_half: int,  # head_dim // 2
    interpret: bool = False,
) -> Array:
    """Block-diagonal attention over contiguous equal `span`s, operating
    directly on the 2D projection layout with in-kernel rotary. Returns
    (S, nh*dp) in q2.dtype. Requires S % span == 0 and an 8-row-alignable
    tiling (kernel_applicable)."""
    s_len = q2.shape[0]
    assert q2.shape[1] == nh * dp, (q2.shape, nh, dp)
    nspan = s_len // span
    spt = _spans_per_tile(nspan, span)
    if spt == 0:
        raise ValueError(f"no sublane-aligned tiling for span {span}")
    tq = spt * span

    # heads iterate INNERMOST so the cos/sin tile (block index (i, 0),
    # independent of h) is revisited nh times in a row — Pallas elides the
    # repeated DMA, fetching each rotary tile once per row-tile.
    spec = pl.BlockSpec((tq, dp), lambda i, h: (i, h))
    rspec = pl.BlockSpec((tq, dp), lambda i, h: (i, 0))
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(
            _kernel2d, span=span, tq=tq, scale=scale, rot_half=rot_half,
        ),
        grid=(s_len // tq, nh),
        in_specs=[spec, spec, spec, rspec, rspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((s_len, nh * dp), q2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q2, k2, v2, cos, sin)
    return out


def block_diag_attention(
    q: Array,  # (S, nh, hd)
    k: Array,
    v: Array,
    span: int,  # tokens per attention span (window or frame length)
    *,
    scale: float,
    valid: Array | None = None,  # (S,) bool: False = padded slot (ragged
    # windows gathered into uniform spans); both its keys and its outputs
    # are dead — keys get a NEG column penalty, outputs are dropped upstream
    interpret: bool = False,
) -> Array:
    """Block-diagonal attention over contiguous equal `span`s. Returns
    (S, nh, hd) in q.dtype. Requires S % span == 0 and an 8-row-alignable
    tiling (check with kernel_applicable)."""
    s_len, nh, hd = q.shape
    if s_len % span:
        raise ValueError(f"seq {s_len} not a multiple of span {span}")
    nspan = s_len // span
    spt = _spans_per_tile(nspan, span)
    if spt == 0:
        raise ValueError(f"no sublane-aligned tiling for span {span}")
    tq = spt * span
    if valid is not None and tq % 128:
        raise ValueError(f"masked variant needs 128-aligned tiles, got {tq}")

    qt = q.transpose(1, 0, 2)  # (nh, S, hd)
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)

    spec = pl.BlockSpec((1, tq, hd), lambda h, i: (h, i, 0))
    in_specs = [spec, spec, spec]
    operands = [qt, kt, vt]
    if valid is not None:
        pen = jnp.where(valid, 0.0, NEG).astype(jnp.float32)
        operands.append(jnp.broadcast_to(pen[None, :], (8, s_len)))
        in_specs.append(pl.BlockSpec((8, tq), lambda h, i: (0, i)))
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(
            _kernel, span=span, tq=tq, scale=scale,
            masked=valid is not None,
        ),
        grid=(nh, s_len // tq),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nh, s_len, hd), q.dtype),
        # a no-smaller-divisor tiling can leave sb == tq (up to 2048 rows:
        # a 16.8 MB f32 score sub-block) — past the 16 MB default scope
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out.transpose(1, 0, 2)
