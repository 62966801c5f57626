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

Only the uniform case (all spans the same length, which window-aligned
resize guarantees and per-frame full attention always satisfies) maps to
the kernel; ragged windows fall back to the XLA padded-gather path in
models/qwen25_vl/vision.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

Array = jax.Array

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, span: int, tq: int, scale: float):
    # blocks: (1, TQ, hd). Spans are contiguous and TQ is a multiple of the
    # span length, so keys for every query in this tile live in the SAME
    # tile -> single-shot softmax, no cross-tile reduction.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if span != tq:
        row = lax.broadcasted_iota(jnp.int32, (tq, tq), 0) // span
        col = lax.broadcasted_iota(jnp.int32, (tq, tq), 1) // span
        s = s + (row != col).astype(jnp.float32) * NEG
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _spans_per_tile(nspan: int, span: int) -> int:
    """Largest spans-per-tile <= ~512 rows such that the tile divides the
    sequence AND is sublane-aligned (tile rows % 8 == 0 — Mosaic block
    constraint). Returns 0 when no packing satisfies both (caller falls
    back to the XLA path): e.g. odd-span ragged grids."""
    for spt in range(max(1, 512 // span), 0, -1):
        if nspan % spt == 0 and (spt * span) % 8 == 0:
            return spt
    # spans longer than 512 rows (per-frame full attention). Cap the tile at
    # 1536 rows: the f32 score tile (tq x tq) must fit VMEM (~16MB scoped).
    if span % 8 == 0 and span <= 1536:
        return 1
    if nspan % 2 == 0 and (2 * span) % 8 == 0 and 2 * span <= 1536:
        return 2
    return 0


def kernel_applicable(s_len: int, span: int) -> bool:
    """Can block_diag_attention handle this (sequence, span)?"""
    return s_len % span == 0 and _spans_per_tile(s_len // span, span) > 0


def block_diag_attention(
    q: Array,  # (S, nh, hd)
    k: Array,
    v: Array,
    span: int,  # tokens per attention span (window or frame length)
    *,
    scale: float,
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

    qt = q.transpose(1, 0, 2)  # (nh, S, hd)
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)

    spec = pl.BlockSpec((1, tq, hd), lambda h, i: (h, i, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, span=span, tq=tq, scale=scale),
        grid=(nh, s_len // tq),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nh, s_len, hd), q.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(1, 0, 2)
