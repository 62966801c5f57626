"""Functional, preallocated KV cache.

TPU-native replacement for the reference's `LVUCache(DynamicCache)` (reference
lvu/lvu_cache.py:68-117) and the in-place prune-and-write-back of
`post_process_kv_cache` (reference lvu/utils.py:333-342).

The reference grows/shrinks python lists of torch tensors per layer. Under
XLA everything must be fixed-shape, so the cache is a preallocated HBM buffer
of `capacity` token slots per layer plus a scalar valid-`length`; groups
append their (pruned, fixed-size) K/V at offset `length` via
dynamic_update_slice, and attention masks slots >= length. One compiled
prefill step serves every group — no recompiles as the cache "grows"
(SURVEY.md section 7 "Hard parts": shape polymorphism vs jit).

Keys are stored with RoPE already applied, as in the reference (rope applied
before `cache.update`, reference lvu/models/qwen25_vl.py:44-51); retained
tokens keep their original mRoPE phases, so no positions need to be cached.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def quantize_kv(x: Array):
    """Per-(head, token) symmetric int8 quantization of K or V rows.

    x: (num_kv_heads, n, head_dim) -> (int8 values, f32 scales (H, n)).
    Row-wise absmax scaling keeps RoPE'd key geometry well-conditioned
    (head_dim-long rows have similar magnitudes)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: Array, scale: Array, dtype=jnp.float32) -> Array:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


@struct.dataclass
class KVCache:
    """Stacked-by-layer KV cache.

    k, v: (num_layers, num_kv_heads, capacity, head_dim)
    length: (num_layers,) int32 — valid token slots per layer. Layers share
        one value in the uniform path (same static keep-k everywhere); decay
        schedules (`top_k_decay_type`, reference lvu/utils.py:244-251) make
        them diverge, which a per-layer vector represents directly.

    The reference's prompt->key score accumulation (LVUCache.accum_attn,
    lvu/lvu_cache.py:79,110-117) needs no cache-side state here: the scores
    only ever feed the CURRENT group's pruning, so they are computed and
    consumed inside the layer (language._prompt_accum_scores).
    """

    k: Array
    v: Array
    length: Array
    # int8 mode (quantized=True at init): per-(layer, head, token) f32 scales
    k_scale: Optional[Array] = None
    v_scale: Optional[Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def capacity(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(
    num_layers: int,
    num_kv_heads: int,
    capacity: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized=False,  # False | True/"kv" | "k"
) -> KVCache:
    """quantized=True (or "kv") stores K/V as int8 + per-(head, token) f32
    scales: ~47% of the bf16 cache's HBM (int8 values + 4B/128-row scale),
    letting hour-long rho=0.5 caches coexist with weights on one chip.

    quantized="k" (the "int8k" cache dtype) quantizes K ONLY: the flash
    kernel's QK matmul runs at the doubled s8xs8 MXU rate while V stays in
    `dtype` — PV keeps the full-rate unquantized path with no per-block
    dequant cast (the cost that made the full int8 cache a wash at prefill
    shapes, benchmarks/flash_block_sweep.py). ~69% of the bf16 cache's HBM."""
    shape = (num_layers, num_kv_heads, capacity, head_dim)
    qk = quantized in (True, "kv", "k")
    qv = quantized in (True, "kv")
    return KVCache(
        k=jnp.zeros(shape, jnp.int8 if qk else dtype),
        v=jnp.zeros(shape, jnp.int8 if qv else dtype),
        length=jnp.zeros((num_layers,), jnp.int32),
        k_scale=(
            jnp.zeros((num_layers, num_kv_heads, capacity), jnp.float32)
            if qk else None
        ),
        v_scale=(
            jnp.zeros((num_layers, num_kv_heads, capacity), jnp.float32)
            if qv else None
        ),
    )


def layer_append(
    k_buf: Array, v_buf: Array, length: Array, k_new: Array, v_new: Array
):
    """Append `k_new`/`v_new` (num_kv_heads, n, head_dim) at slot `length` of
    one layer's buffers (num_kv_heads, capacity, head_dim). Returns updated
    buffers; caller advances `length` once per step (all layers append the
    same count)."""
    k_buf = jax.lax.dynamic_update_slice(
        k_buf, k_new.astype(k_buf.dtype), (0, length, 0)
    )
    v_buf = jax.lax.dynamic_update_slice(
        v_buf, v_new.astype(v_buf.dtype), (0, length, 0)
    )
    return k_buf, v_buf


def layer_append_quantized(
    k_buf: Array, v_buf: Array, k_scale_buf: Array, v_scale_buf: Array,
    length: Array, k_new: Array, v_new: Array,
):
    """int8 variant: quantize the appended rows and store values + scales.
    v_scale_buf=None (the "int8k" K-only mode) stores V unquantized."""
    kq, ks = quantize_kv(k_new)
    k_buf = jax.lax.dynamic_update_slice(k_buf, kq, (0, length, 0))
    k_scale_buf = jax.lax.dynamic_update_slice(k_scale_buf, ks, (0, length))
    if v_scale_buf is None:
        v_buf = jax.lax.dynamic_update_slice(
            v_buf, v_new.astype(v_buf.dtype), (0, length, 0)
        )
        return k_buf, v_buf, k_scale_buf, None
    vq, vs = quantize_kv(v_new)
    v_buf = jax.lax.dynamic_update_slice(v_buf, vq, (0, length, 0))
    v_scale_buf = jax.lax.dynamic_update_slice(v_scale_buf, vs, (0, length))
    return k_buf, v_buf, k_scale_buf, v_scale_buf


def stacked_append(
    k_all: Array, v_all: Array, li, length: Array, k_new: Array, v_new: Array
):
    """Append into layer `li` of the STACKED cache (L, H, capacity, D)
    without materializing the layer view. Slicing a (H, capacity, D) view out
    of the stack and writing it back (the scan-xs/ys pattern) copies the full
    capacity buffer per layer per step — ~15 GB/token at 64k capacity on a
    7B stack, measured; this is a single small dynamic_update_slice that XLA
    aliases in place on a loop carry."""
    k_all = jax.lax.dynamic_update_slice(
        k_all, k_new.astype(k_all.dtype)[None], (li, 0, length, 0)
    )
    v_all = jax.lax.dynamic_update_slice(
        v_all, v_new.astype(v_all.dtype)[None], (li, 0, length, 0)
    )
    return k_all, v_all


def stacked_append_quantized(
    k_all: Array, v_all: Array, k_scale_all: Array, v_scale_all: Array,
    li, length: Array, k_new: Array, v_new: Array,
):
    """int8 variant of `stacked_append`: quantize the appended rows and
    write values + per-(head, token) scales into layer `li` of the stack.
    v_scale_all=None (the "int8k" K-only mode) stores V unquantized."""
    kq, ks = quantize_kv(k_new)
    k_all = jax.lax.dynamic_update_slice(k_all, kq[None], (li, 0, length, 0))
    k_scale_all = jax.lax.dynamic_update_slice(
        k_scale_all, ks[None], (li, 0, length)
    )
    if v_scale_all is None:
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_new.astype(v_all.dtype)[None], (li, 0, length, 0)
        )
        return k_all, v_all, k_scale_all, None
    vq, vs = quantize_kv(v_new)
    v_all = jax.lax.dynamic_update_slice(v_all, vq[None], (li, 0, length, 0))
    v_scale_all = jax.lax.dynamic_update_slice(
        v_scale_all, vs[None], (li, 0, length)
    )
    return k_all, v_all, k_scale_all, v_scale_all


def valid_mask(capacity: int, length: Array) -> Array:
    """(capacity,) bool mask of populated slots."""
    return jnp.arange(capacity, dtype=jnp.int32) < length
