"""Attention for grouped prefill and decode (XLA path).

The reference runs CUDA flash-attention over [past cache + current group]
(reference lvu/models/qwen25_vl.py:95-105 via HF `_flash_attention_forward`).
The TPU-native formulation avoids materializing the concatenated KV: the
past cache lives in a fixed-capacity buffer, and attention is computed as two
partial attentions — (Q -> past buffer, masked by valid length) and
(Q -> group, causal) — merged exactly with the online-softmax (log-sum-exp)
combine. This keeps every shape static across all groups.

A Pallas flash kernel (quickvideo_tpu.ops.flash_attention) replaces the
buffer-side partial attention on TPU; this module is the reference/XLA
implementation and the numerics oracle for kernel tests.

All functions operate on a single sequence (no batch dim); the engine vmaps
if needed. GQA is handled by folding query heads as (num_kv_heads, rep, ...).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e30


def causal_mask(g: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return col <= row


class PartialAttn(NamedTuple):
    """A self-contained softmax partial: `out` is the already-normalized
    attention output over this partial's keys; `lse` the log-sum-exp of its
    scores. Two partials merge exactly via `merge_partials`. Rows with no
    attendable key have out == 0 and lse == NEG_INF (weight 0 in merges)."""

    out: Array  # (Hq, Q, D) float32
    lse: Array  # (Hq, Q) float32


def _fold_gqa(q: Array, num_kv_heads: int) -> Array:
    hq, qlen, d = q.shape
    rep = hq // num_kv_heads
    return q.reshape(num_kv_heads, rep, qlen, d)


def _partial_attention(
    q: Array,  # (Hq, Q, D)
    k: Array,  # (Hkv, L, D)
    v: Array,  # (Hkv, L, D)
    mask: Optional[Array],  # (Q, L) bool; True = attend
    scale: float,
) -> PartialAttn:
    hkv = k.shape[0]
    hq, qlen, d = q.shape
    qf = _fold_gqa(q, hkv).astype(jnp.float32)  # (Hkv, rep, Q, D)
    scores = jnp.einsum("hrqd,hld->hrql", qf, k.astype(jnp.float32)) * scale
    if mask is not None:
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e29)
    p = jnp.exp(scores - m)
    if mask is not None:
        p = jnp.where(mask[None, None], p, 0.0)
    s = jnp.sum(p, axis=-1)  # (Hkv, rep, Q)
    out = jnp.einsum("hrql,hld->hrqd", p, v.astype(jnp.float32))
    out = out / jnp.maximum(s[..., None], 1e-30)
    lse = jnp.where(s > 0, m[..., 0] + jnp.log(jnp.maximum(s, 1e-30)), NEG_INF)
    return PartialAttn(out.reshape(hq, qlen, d), lse.reshape(hq, qlen))


def merge_partials(a: PartialAttn, b: PartialAttn) -> Tuple[Array, Array]:
    """Exact combine of two normalized softmax partials.

    Returns (out (Hq, Q, D) f32, total_lse (Hq, Q))."""
    m = jnp.maximum(jnp.maximum(a.lse, b.lse), -1e29)
    wa = jnp.exp(a.lse - m)
    wb = jnp.exp(b.lse - m)
    denom = jnp.maximum(wa + wb, 1e-30)
    out = (a.out * wa[..., None] + b.out * wb[..., None]) / denom[..., None]
    lse = m + jnp.log(denom)
    return out, lse


def _blockwise_partial_attention(
    q: Array,  # (Hq, Q, D)
    k: Array,  # (Hkv, L, D) fixed-capacity buffer (bf16/f32 or int8)
    v: Array,
    length: Array,  # () int32 valid prefix
    scale: float,
    block: int = 1024,
    k_scale: Optional[Array] = None,  # (Hkv, L) f32 when k is int8
    v_scale: Optional[Array] = None,
) -> PartialAttn:
    """Online-softmax partial attention over a length-masked buffer with a
    DYNAMIC trip count: a lax.fori_loop runs only ceil(length/block)
    iterations, so empty capacity costs nothing (the fixed-grid scan version
    paid for every block — catastrophic at 100k+ capacities). int8 buffers
    dequantize per block in registers; HBM reads stay int8."""
    hkv, cap, d = k.shape
    hq, qlen, _ = q.shape
    rep = hq // hkv
    nblocks = -(-cap // block)
    pad = nblocks * block - cap
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    quant = k_scale is not None
    quant_v = v_scale is not None
    if quant and pad:
        k_scale = jnp.pad(k_scale, ((0, 0), (0, pad)))
    if quant_v and pad:
        v_scale = jnp.pad(v_scale, ((0, 0), (0, pad)))
    qf = _fold_gqa(q, hkv).astype(jnp.float32)
    nvalid = jax.lax.div(length + block - 1, block)

    def body(bi, carry):
        m_prev, s_prev, o_prev = carry
        start = bi * block
        kblk = jax.lax.dynamic_slice(k, (0, start, 0), (hkv, block, d))
        vblk = jax.lax.dynamic_slice(v, (0, start, 0), (hkv, block, d))
        if quant:
            ks = jax.lax.dynamic_slice(k_scale, (0, start), (hkv, block))
            # dequant to bf16: matmuls run at full MXU rate, f32 accumulate
            kblk = (kblk.astype(jnp.float32) * ks[..., None]).astype(
                jnp.bfloat16
            )
        if quant_v:
            vs = jax.lax.dynamic_slice(v_scale, (0, start), (hkv, block))
            vblk = (vblk.astype(jnp.float32) * vs[..., None]).astype(
                jnp.bfloat16
            )
        scores = jnp.einsum(
            "hrqd,hld->hrql",
            qf.astype(kblk.dtype), kblk,
            preferred_element_type=jnp.float32,
        ) * scale
        pos = start + jnp.arange(block, dtype=jnp.int32)
        mask = pos[None, None, None, :] < length
        scores = jnp.where(mask, scores, NEG_INF)
        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m_prev, m_blk)
        m_safe = jnp.maximum(m_new, -1e29)
        p = jnp.exp(scores - m_safe[..., None])
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(jnp.maximum(m_prev, -1e29) - m_safe)
        s_new = s_prev * alpha + jnp.sum(p, axis=-1)
        o_new = o_prev * alpha[..., None] + jnp.einsum(
            "hrql,hld->hrqd", p, vblk.astype(jnp.float32)
        )
        return (m_new, s_new, o_new)

    m0 = jnp.full((hkv, rep, qlen), NEG_INF, jnp.float32)
    s0 = jnp.zeros((hkv, rep, qlen), jnp.float32)
    o0 = jnp.zeros((hkv, rep, qlen, d), jnp.float32)
    m, s, o = jax.lax.fori_loop(0, nvalid, body, (m0, s0, o0))
    out = o / jnp.maximum(s[..., None], 1e-30)
    lse = jnp.where(
        s > 0, jnp.maximum(m, -1e29) + jnp.log(jnp.maximum(s, 1e-30)), NEG_INF
    )
    return PartialAttn(out.reshape(hq, qlen, d), lse.reshape(hq, qlen))


# past-buffer sizes at/above this use the blockwise path (memory bound);
# smaller buffers use the single-shot einsum (fewer kernels)
BLOCKWISE_THRESHOLD = 4096


def past_partial_attention(
    q: Array, k_past: Array, v_past: Array, past_length: Array,
    g: int, scale: float, impl: str = "auto",
    k_scale: Optional[Array] = None, v_scale: Optional[Array] = None,
) -> PartialAttn:
    """Dispatch the past-buffer partial: 'pallas' -> flash kernel,
    'xla' -> single-shot or blockwise by capacity, 'auto' -> pallas on TPU
    backends for big buffers, xla otherwise."""
    capacity = k_past.shape[1]
    quant = k_scale is not None
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = (
            "pallas"
            if (on_tpu and capacity >= BLOCKWISE_THRESHOLD)
            else "xla"
        )
    if impl == "pallas":
        import os as _os

        from quickvideo_tpu.ops.flash_attention import flash_past_attention

        # the flash kernel consumes int8 caches natively (per-token scale
        # tiles); an explicit 'pallas' request must not silently downgrade
        # to the XLA blockwise loop just because the cache is quantized
        return flash_past_attention(
            q, k_past, v_past, past_length, scale=scale,
            k_scale=k_scale, v_scale=v_scale,
            interpret=bool(_os.environ.get("QV_PALLAS_INTERPRET")),
        )
    if capacity >= BLOCKWISE_THRESHOLD or quant:
        return _blockwise_partial_attention(
            q, k_past, v_past, past_length, scale,
            k_scale=k_scale, v_scale=v_scale,
        )
    pmask = jnp.broadcast_to(
        jnp.arange(capacity, dtype=jnp.int32)[None, :] < past_length,
        (g, capacity),
    )
    return _partial_attention(q, k_past, v_past, pmask, scale)


def grouped_attention(
    q: Array,  # (Hq, G, D) current-group queries, RoPE applied
    k_group: Array,  # (Hkv, G, D) current-group keys, RoPE applied
    v_group: Array,  # (Hkv, G, D)
    k_past: Optional[Array],  # (Hkv, capacity, D) cache buffer or None
    v_past: Optional[Array],
    past_length: Optional[Array],  # () int32 valid slots in the buffer
    *,
    scale: float,
    return_group_probs: bool = False,
    causal: bool = True,
    impl: str = "auto",
    k_scale: Optional[Array] = None,
    v_scale: Optional[Array] = None,
):
    """Attention of group queries over [past cache (masked), group (causal)].

    Equivalent to the reference's flash attention over the concatenated cache
    (lvu/models/qwen25_vl.py:49-105) but with static shapes.

    Returns:
      out: (Hq, G, D) float32 attention output (pre-o_proj).
      group_probs: (G, G) float32 or None — softmax probabilities of group
        queries onto group keys with the FULL (past+group) denominator,
        averaged over query heads. Exactly what the reference's pruning
        predictors consume (`attn_weights.mean(0)[:, -k_len:]`,
        lvu/utils.py:33).
    """
    g = q.shape[1]
    # iota-comparison mask (a literal tril constant would bloat the HLO
    # payload by O(G^2) bytes — too big for remote-compile transports)
    cmask = causal_mask(g) if causal else None
    pg = _partial_attention(q, k_group, v_group, cmask, scale)
    if k_past is None:
        out, lse_tot = pg.out, pg.lse
    else:
        pp = past_partial_attention(
            q, k_past, v_past, past_length, g, scale, impl=impl,
            k_scale=k_scale, v_scale=v_scale,
        )
        out, lse_tot = merge_partials(pp, pg)
    if not return_group_probs:
        return out, None
    hkv = k_group.shape[0]
    hq = q.shape[0]
    qf = _fold_gqa(q, hkv).astype(jnp.float32)
    scores = jnp.einsum("hrqd,hld->hrql", qf, k_group.astype(jnp.float32)) * scale
    scores = scores.reshape(hq, g, g)
    probs = jnp.exp(scores - lse_tot[..., None])
    if cmask is not None:
        probs = jnp.where(cmask[None], probs, 0.0)
    group_probs = jnp.mean(probs, axis=0)  # (G, G), mean over query heads
    return out, group_probs


def decode_attention(
    q: Array,  # (Hq, 1, D)
    k_buf: Array,  # (Hkv, capacity, D)
    v_buf: Array,
    length: Array,  # () valid slots (the new token's K/V already appended)
    *,
    scale: float,
) -> Array:
    """Single-token decode attention over the cache buffer."""
    capacity = k_buf.shape[1]
    mask = jnp.arange(capacity, dtype=jnp.int32)[None, :] < length  # (1, cap)
    return _partial_attention(q, k_buf, v_buf, mask, scale).out


def full_causal_attention(q: Array, k: Array, v: Array, *, scale: float) -> Array:
    """Plain causal self-attention (no cache) — tests and the unpruned
    baseline path. Shapes (H*, L, D)."""
    out, _ = grouped_attention(
        q, k, v, None, None, None, scale=scale, return_group_probs=False
    )
    return out
