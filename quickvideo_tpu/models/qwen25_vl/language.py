"""Qwen2.5-VL language decoder in JAX.

Functional decoder stack with a per-layer post-attention pruning hook — the
clean TPU equivalent of the reference's monkey-patched decoder-layer forward
(reference lvu/models/qwen25_vl.py:115-205: attention -> post_process_kv_cache
-> MLP). Layers run under `lax.scan` with stacked parameters in the uniform
path; the cascade-pruning path (`prefill_prune_starting_layer`, reference
lvu/utils.py:344-372) unrolls because activation shapes shrink mid-stack.

All computation is single-sequence (the reference asserts batch 1,
lvu/utils.py:264); batching, when needed (eval DP), shards requests over the
mesh instead.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl.config import TextConfig
from quickvideo_tpu.models.qwen25_vl.rope import apply_rotary
from quickvideo_tpu.ops import attention as attn_ops
from quickvideo_tpu.ops import kv_cache as kv
from quickvideo_tpu.ops import prune as prune_ops
from quickvideo_tpu.ops.predictors import select_top_k_indices
from quickvideo_tpu.ops.quantization import qdot, qdot_multi, qtake

Array = jax.Array


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_language_params(cfg: TextConfig, key: Array, dtype=jnp.bfloat16):
    """Random-init parameter pytree; layer weights stacked on axis 0 for scan."""
    n = cfg.num_hidden_layers
    c = cfg.hidden_size
    hd = cfg.head_dim
    hq = cfg.num_attention_heads * hd
    hkv = cfg.num_key_value_heads * hd
    i = cfg.intermediate_size
    ks = jax.random.split(key, 12)

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    s = 0.02
    return {
        "embed": nrm(ks[0], (cfg.vocab_size, c), s),
        "layers": {
            "ln1": jnp.ones((n, c), dtype),
            "ln2": jnp.ones((n, c), dtype),
            "wq": nrm(ks[1], (n, c, hq), s),
            "bq": jnp.zeros((n, hq), dtype),
            "wk": nrm(ks[2], (n, c, hkv), s),
            "bk": jnp.zeros((n, hkv), dtype),
            "wv": nrm(ks[3], (n, c, hkv), s),
            "bv": jnp.zeros((n, hkv), dtype),
            "wo": nrm(ks[4], (n, hq, c), s),
            "wg": nrm(ks[5], (n, c, i), s),
            "wu": nrm(ks[6], (n, c, i), s),
            "wd": nrm(ks[7], (n, i, c), s),
        },
        "norm": jnp.ones((c,), dtype),
        "lm_head": nrm(ks[8], (c, cfg.vocab_size), s),
    }


def rms_norm(x: Array, w: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def swiglu_mlp(x: Array, lp: dict) -> Array:
    # matmuls accumulate in f32 (MXU), activations stay in the model dtype —
    # exactly HF's bf16 Linear/SiLU chain, and half the HBM traffic of f32
    # intermediates on the (L, intermediate) tensors. gate/up read the same
    # input: qdot_multi quantizes it once under int8 activations.
    g, u = qdot_multi(x, (lp["wg"], lp["wu"]))
    h = jax.nn.silu(g.astype(x.dtype)) * u.astype(x.dtype)
    return qdot(h, lp["wd"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Static step spec
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StepSpec:
    """Static (hashable) parameters of one prefill/decode step. Everything
    here is resolved in Python before tracing, so the traced program has
    fixed shapes. `keep_k == 0` means append-all (no pruning) — the
    resolve_effective_top_k contract (quickvideo_tpu/config.py)."""

    cfg: TextConfig
    q_len: int  # tokens entering the step (incl. prompt tail if query_based)
    keep_k: int  # retained tokens per layer (0 = keep all)
    predict_type: str = "key_norms_small"
    needs_probs: bool = False
    prompt_len: int = 0  # query-based: trailing prompt tokens (stripped)
    causal: bool = True
    cascade: bool = False  # prune activations for the next layer too
    attn_impl: str = "auto"  # 'auto' | 'pallas' | 'xla' (past-buffer partial)
    kv_quant: object = False  # False | True (K+V int8) | "k" (K-only int8:
    # QK at the s8xs8 MXU rate, V unquantized — the "int8k" cache dtype).
    # Truthy gates route to the *_quantized appends, which accept a None
    # v_scale buffer for the "k" mode.
    attend_past: bool = True  # False = adaptive_local_attention off: groups
    # attend only within themselves (reference qwen25_vl.py:502-516 merge
    # path); KV still accumulates in the cache for the final generate
    cp_mesh: object = None  # jax.sharding.Mesh (hashable) when the KV cache
    # capacity axis is sharded over the mesh's "sp" axis — attention over the
    # past runs as per-shard partials merged with LSE collectives and appends
    # scatter into the local shard (parallel/context_parallel.py)
    active_cap: int = 0  # static upper bound (0 = whole buffer) on the
    # cache prefix this step's attention may read. The flash kernel's grid
    # is sized by the buffer, so empty capacity beyond the valid length
    # costs real time (~3 us per clamped tail block-step; ~7 ms/token at
    # 64k capacity with 1k valid, measured). The engine buckets decode
    # chunks to the next power of two above the known occupancy; appends
    # still write the full buffer. Caller contract: length + appends of
    # this step never exceed active_cap.
    ref_query_mask: bool = False  # query-based mode: reproduce the
    # reference's bottom-right-aligned causal mask over (q=video+prompt,
    # k=past+video) — video row i sees video keys <= i-prompt_len and early
    # rows see a truncated past (an artifact of appending the prompt to the
    # flash call). Default False = our unsplit-sequence mask (documented
    # divergence, PARITY.md); True is used by the cross-implementation
    # parity tests against the reference-faithful torch pipeline.
    tp_axis: object = None  # mesh axis name when this step runs INSIDE a
    # shard_map with attention heads / MLP columns sharded over it (pp
    # stages with tp, parallel/pipeline.py): layer_step psums the o-proj and
    # down-proj partials and the pruning scores reduce over it (exact —
    # identical retained indices on every shard)
    tp_size: int = 1  # shard count of tp_axis (local head counts divide it)

    @property
    def video_len(self) -> int:
        return self.q_len - self.prompt_len

    @property
    def append_n(self) -> int:
        return self.keep_k if self.keep_k > 0 else self.video_len


# ---------------------------------------------------------------------------
# Single layer
# ---------------------------------------------------------------------------


def _project_qkv(lp: dict, h: Array, cfg: TextConfig, tp: int = 1):
    l = h.shape[0]
    hd = cfg.head_dim
    # q/k/v read the same normed input: quantize it once (qdot_multi).
    # Under tensor parallelism (tp > 1, inside a shard_map stage) the
    # projection weights carry only the LOCAL head columns.
    q, k, v = qdot_multi(h, (lp["wq"], lp["wk"], lp["wv"]))
    q = q.astype(h.dtype) + lp["bq"]
    k = k.astype(h.dtype) + lp["bk"]
    v = v.astype(h.dtype) + lp["bv"]
    q = q.reshape(l, cfg.num_attention_heads // tp, hd).transpose(1, 0, 2)
    k = k.reshape(l, cfg.num_key_value_heads // tp, hd).transpose(1, 0, 2)
    v = v.reshape(l, cfg.num_key_value_heads // tp, hd).transpose(1, 0, 2)
    return q, k, v


def _prompt_accum_scores(
    q_prompt: Array, k_video: Array, cfg: TextConfig, tp: int = 1
) -> Array:
    """Prompt->video-key attention accumulation (reference
    lvu/lvu_cache.py:100-116): softmax over video keys only (no past
    denominator, no causal mask — approximate by design), summed over prompt
    queries, averaged over query heads. Returns (video_len,) f32 — the
    LOCAL-head mean under tp (the caller pmeans over the tp axis)."""
    hkv = cfg.num_key_value_heads // tp
    rep = cfg.num_kv_groups
    qf = q_prompt.reshape(hkv, rep, *q_prompt.shape[1:]).astype(jnp.float32)
    scores = jnp.einsum(
        "hrqd,hkd->hrqk", qf, k_video.astype(jnp.float32)
    ) / (cfg.head_dim ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    return probs.sum(axis=2).mean(axis=(0, 1))


def _cp_append(
    k_all, v_all, k_scale_all, v_scale_all, li, length, k_rows, v_rows, spec
):
    """Append rows into the context-parallel stacked cache (quantized or
    not) — single dispatch point for the pruned-compact and raw-group
    appends so the two branches cannot drift."""
    from quickvideo_tpu.parallel.context_parallel import (
        cp_stacked_append,
        cp_stacked_append_quantized,
    )

    if spec.kv_quant:
        return cp_stacked_append_quantized(
            k_all, v_all, k_scale_all, v_scale_all, li, length,
            k_rows, v_rows, mesh=spec.cp_mesh,
        )
    k_all, v_all = cp_stacked_append(
        k_all, v_all, li, length, k_rows, v_rows, mesh=spec.cp_mesh
    )
    return k_all, v_all, k_scale_all, v_scale_all


def _group_probs_from_lse(
    q: Array,  # (Hq, G, D) rotary-applied group queries
    k_grp: Array,  # (Hkv, G, D) raw group keys
    lse: Array,  # (Hq, G) global log-sum-exp over past + group
    scale: float,
    cfg: TextConfig,
    causal: bool = True,
) -> Array:
    """In-group attention probabilities under the FULL softmax denominator,
    recovered from the attention kernel's log-sum-exp: prob[q, j] =
    exp(q·k_j * scale − lse[q]). Head-averaged (G, G) — the operand of the
    attention-statistics predictors (reference utils.py:64-101 semantics).
    Works identically for the single-chip flash LSE and the LSE-merged
    context-parallel partials (lse is replicated after the psum merge)."""
    g = q.shape[1]
    hkv = q.shape[0] // cfg.num_kv_groups  # local kv heads (tp-aware)
    qf = q.reshape(hkv, cfg.num_kv_groups, g, cfg.head_dim)
    scores = jnp.einsum(
        "hrqd,hld->hrql",
        qf.astype(jnp.float32),
        k_grp.astype(jnp.float32),
    ) * scale
    scores = scores.reshape(q.shape[0], g, g)
    probs = jnp.exp(scores - lse[..., None])
    if causal:
        probs = jnp.where(attn_ops.causal_mask(g)[None], probs, 0.0)
    return jnp.mean(probs, axis=0)


def layer_step(
    lp: dict,
    x: Array,  # (q_len, C)
    cos: Array,  # (q_len, head_dim)
    sin: Array,
    k_all: Optional[Array],  # STACKED cache (L, Hkv, capacity, D), or None
    v_all: Optional[Array],  # when use_cache_past=False
    length: Array,  # () int32 valid cache slots of THIS layer (pre-step)
    rng: Optional[Array],
    spec: StepSpec,
    li=0,  # layer index into the stack: () int32 (scan) or python int
    use_cache_past: bool = True,
    k_scale_all: Optional[Array] = None,  # (L, Hkv, capacity) int8 mode
    v_scale_all: Optional[Array] = None,
):
    """One decoder layer over the current group. Returns
    (x_out, k_all', v_all', k_scale_all', v_scale_all', indices|None). Cache
    append happens inside; the caller advances `length` after the stack.

    The cache rides through the layer loop as the FULL stack: the hot Pallas
    path appends via small dynamic_update_slices at (li, ...) (aliased
    in place on the scan carry) and the flash kernel DMAs its k/v blocks
    straight out of the stack (layer_idx scalar prefetch). The previous
    design scanned with the cache as xs/ys, which dynamic-sliced a full
    (Hkv, capacity, D) layer view out and wrote it back every layer —
    ~15 GB/token of pure copy traffic at 64k capacity on the 7B stack
    (measured; decode was 2.4x off the HBM roofline because of it). The
    non-hot paths (XLA/CPU impls, context-parallel, query-based masks) still
    materialize the layer view and write it back — they are not the TPU
    decode/prefill hot path."""
    cfg = spec.cfg
    scale = cfg.head_dim ** -0.5
    already_appended = False
    h = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
    q, k, v = _project_qkv(lp, h, cfg, tp=spec.tp_size)
    q, k = apply_rotary(q, k, cos, sin)

    def _idx(buf):
        # materialize this layer's view (non-hot paths only — this is the
        # full-capacity copy the hot path exists to avoid)
        if buf is None:
            return None
        return jax.lax.dynamic_index_in_dim(buf, li, 0, keepdims=False)

    def _att_view(buf):
        # static prefix view for the XLA attention paths when the engine
        # bounded this step's occupancy (spec.active_cap); appends still hit
        # the full buffer. The Pallas path instead passes active_cap to the
        # kernel, which bounds its k-grid without slicing the operand.
        ac = spec.active_cap
        if buf is not None and ac and ac < buf.shape[1]:
            return jax.lax.slice_in_dim(buf, 0, ac, axis=1)
        return buf

    # resolve the attention impl up front so the hot stacked path is known
    # before any layer view is materialized
    impl = spec.attn_impl
    if impl == "auto" and use_cache_past and k_all is not None:
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        big = k_all.shape[-2] >= attn_ops.BLOCKWISE_THRESHOLD
        impl = "pallas_unified" if (on_tpu and big) else "xla"
    hot = (
        use_cache_past
        and k_all is not None
        and spec.prompt_len == 0
        and spec.attend_past
        and spec.causal
        and spec.cp_mesh is None
        and impl in ("pallas", "pallas_unified")
    )
    # context-parallel: the sharded cache ALSO stays stacked — appends and
    # per-shard attention address layer `li` in place (context_parallel.
    # cp_stacked_*), avoiding the same per-layer shard-capacity copies the
    # hot path avoids on one chip
    cp = use_cache_past and k_all is not None and spec.cp_mesh is not None
    k_buf = v_buf = k_scale_buf = v_scale_buf = None
    if not hot and not cp and use_cache_past and k_all is not None:
        k_buf, v_buf = _idx(k_all), _idx(v_all)
        k_scale_buf, v_scale_buf = _idx(k_scale_all), _idx(v_scale_all)

    accum = None
    if spec.prompt_len > 0:
        # query-based mode: strip prompt K/V (they are never cached and other
        # prompt tokens can't attend to them — reference
        # lvu/lvu_cache.py:100-104 strips before DynamicCache.update).
        gv = spec.video_len
        k_grp, v_grp = k[:, :gv], v[:, :gv]
        accum = _prompt_accum_scores(q[:, gv:], k_grp, cfg, tp=spec.tp_size)
        if spec.tp_axis is not None:
            # local-head mean -> global head mean (equal shard sizes); the
            # accumulated scores then match the single-chip values exactly
            accum = jax.lax.pmean(accum, spec.tp_axis)
        row = jax.lax.broadcasted_iota(jnp.int32, (spec.q_len, gv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (spec.q_len, gv), 1)
        if spec.ref_query_mask:
            # reference-compat bottom-right causal: row i sees video key v
            # iff v <= i - prompt_len (flash semantics with the prompt
            # appended, k = past+video)
            cmask = col <= row - spec.prompt_len
        else:
            # our mask: video rows causal over video keys; prompt rows see
            # all video keys (unsplit-sequence semantics, PARITY.md)
            cmask = (col <= row) | (row >= gv)
        pg = attn_ops._partial_attention(q, k_grp, v_grp, cmask, scale)
        if not spec.attend_past:
            # adaptive_local_attention=False in query-based mode: the group
            # (and its trailing prompt rows) attends only within itself,
            # matching the non-prompt branch below; K/V still accumulate in
            # the cache for the final generate
            out = pg.out
        elif cp:
            # stacked context-parallel past (takes precedence over the
            # reference-compat mask, which is a single-chip test mode)
            from quickvideo_tpu.parallel.context_parallel import (
                cp_stacked_past_attention,
            )

            pp = cp_stacked_past_attention(
                q, k_all, v_all, length, li, scale=scale, mesh=spec.cp_mesh,
                k_scale_all=k_scale_all if spec.kv_quant else None,
                v_scale_all=v_scale_all if spec.kv_quant else None,
            )
            out, _ = attn_ops.merge_partials(pp, pg)
        elif use_cache_past and spec.ref_query_mask:
            # reference-compat past visibility: row i sees past col j iff
            # j <= i + length - prompt_len (early rows see a truncated past)
            kb, vb = _att_view(k_buf), _att_view(v_buf)
            cap = kb.shape[1]
            rowp = jax.lax.broadcasted_iota(jnp.int32, (spec.q_len, cap), 0)
            colp = jax.lax.broadcasted_iota(jnp.int32, (spec.q_len, cap), 1)
            pmask = colp < jnp.minimum(
                length, rowp + length - spec.prompt_len + 1
            )
            if k_scale_buf is not None:
                kb = kv.dequantize_kv(kb, _att_view(k_scale_buf))
            if v_scale_buf is not None:
                vb = kv.dequantize_kv(vb, _att_view(v_scale_buf))
            pp = attn_ops._partial_attention(q, kb, vb, pmask, scale)
            out, _ = attn_ops.merge_partials(pp, pg)
        elif use_cache_past:
            pp = attn_ops.past_partial_attention(
                q, _att_view(k_buf), _att_view(v_buf), length, spec.q_len,
                scale, impl=spec.attn_impl,
                k_scale=_att_view(k_scale_buf), v_scale=_att_view(v_scale_buf),
            )
            out, _ = attn_ops.merge_partials(pp, pg)
        else:
            out = pg.out
        group_probs = None
    else:
        k_grp, v_grp = k, v
        if not spec.attend_past:
            # local attention only (adaptive_local_attention=False): compute
            # within-group causal attention, then append K/V to the cache so
            # the final prompt/generate still sees every group's retained KV
            out, group_probs = attn_ops.grouped_attention(
                q, k_grp, v_grp, None, None, None,
                scale=scale, return_group_probs=spec.needs_probs,
                causal=spec.causal,
            )
        if cp and spec.attend_past:
            # context-parallel past: per-shard partials + LSE-merge
            # collectives over the sp axis (int8 KV shards its scale
            # arrays alongside the values); the stacked sharded cache is
            # addressed at layer `li` in place. Attention-statistics
            # predictors ride for free: the merge's global LSE recovers
            # in-group probs with no extra collective
            from quickvideo_tpu.parallel.context_parallel import (
                cp_stacked_grouped_attention,
            )

            out, cp_lse = cp_stacked_grouped_attention(
                q, k_grp, v_grp, k_all, v_all, length, li,
                scale=scale, mesh=spec.cp_mesh, causal=spec.causal,
                k_scale_all=k_scale_all if spec.kv_quant else None,
                v_scale_all=v_scale_all if spec.kv_quant else None,
                return_lse=True,
            )
            group_probs = None
            if spec.needs_probs:
                group_probs = _group_probs_from_lse(
                    q, k_grp, cp_lse, scale, cfg, causal=spec.causal
                )
        elif hot:
            # unified path: append raw group K/V at [length, length+G), run ONE
            # flash kernel causally over [0, length+G), then (below) overwrite
            # the raw span with the pruned compact. Avoids both the two-partial
            # merge and the (G, G) f32 score materialization.
            from quickvideo_tpu.ops.flash_attention import flash_past_attention

            import os as _os

            if spec.kv_quant:
                # group K/V appended quantized; the kernel dequantizes per
                # block (the current group sees ~1/127 rounding on itself,
                # standard KV-quant behavior)
                k_all, v_all, k_scale_all, v_scale_all = (
                    kv.stacked_append_quantized(
                        k_all, v_all, k_scale_all, v_scale_all, li, length,
                        k_grp, v_grp,
                    )
                )
            else:
                k_all, v_all = kv.stacked_append(
                    k_all, v_all, li, length, k_grp, v_grp
                )
            already_appended = True
            # decode (q_len==1): per-grid-step overhead dominates the kernel
            # (measured ~6 us/step * 37 blocks * n_layers = ~8 ms/token at
            # 37k occupancy); 4x larger k blocks cut the step count 4x and
            # the tiny q tile keeps the f32 score tile small
            # prefill blocks by cache dtype AND group size, from v5e sweeps
            # at the 7B strict group shapes (flash_block_sweep.py). At
            # q=3520 (1080p fixture): bf16 (256,1024,2) 7.33 ms beats
            # (128,1024,4) 8.13. At q=2704 (the 448 headline fixture):
            # the optimum FLIPS — (128,1024,4) 5.61 beats (256,1024,2)
            # 5.98 (fewer pad rows: 2704->2816 at bq=128 vs 2816 at 256,
            # and the 4-unroll amortizes DMA issue better at the smaller
            # q). int8k prefers (256,2048,2) 5.84; int8 (128,2048,2).
            # Older sweep notes at q=3520:
            # benchmarks/flash_block_sweep.py): bf16 best is
            # (bq=256, bk=1024, nqi=2) 7.33 ms / 83% MFU — same VMEM tile
            # rows as the old (128,1024,nqi=4) 8.13 ms but half the causal
            # boundary blocks; bk=2048 regresses bf16 (13.93). int8 inverts
            # on bk — (128,2048,nqi=2) 8.90 beats (128,1024,2) 9.45: halved
            # k bytes fit the larger block and the scale tiles amortize
            # over more columns.
            if spec.q_len == 1:
                bq, bk, nqi = 128, 4096, 0
            elif spec.kv_quant == "k":
                bq, bk, nqi = 256, 2048, 2
            elif spec.kv_quant:
                bq, bk, nqi = 128, 2048, 2
            elif spec.q_len >= 3072:
                bq, bk, nqi = 256, 1024, 2
            else:
                bq, bk, nqi = 128, 1024, 4
            # spec.active_cap bounds the kernel's k-grid statically; the
            # stack stays the operand (layer_idx indexes it) so nothing is
            # sliced or copied and in-place cache donation is preserved.
            # The int8 scale views ARE sliced per layer — they're 128x
            # smaller than the values (~1 MB, ~0.3 ms/token total)
            pa = flash_past_attention(
                q, k_all, v_all, length, scale=scale,
                causal=True, block_q=bq, block_k=bk, nq_inner=nqi,
                active_cap=spec.active_cap,
                layer_idx=li,
                interpret=bool(_os.environ.get("QV_PALLAS_INTERPRET")),
                k_scale=_idx(k_scale_all) if spec.kv_quant else None,
                v_scale=_idx(v_scale_all) if spec.kv_quant else None,
                # emit in the activation dtype: the cast below is then a
                # no-op and the kernel's output store + unfold relayout
                # move half the bytes (f32 kept on merge/parity paths)
                out_dtype=q.dtype,
                # unified mode never merges partials; the lse is consumed
                # only by the attn-stats predictors — skip its compute and
                # ~Hq*G*512 B/call HBM store otherwise
                with_lse=spec.needs_probs,
            )
            out = pa.out
            group_probs = None
            if spec.needs_probs:
                # probs of group columns under the full denominator, from lse
                group_probs = _group_probs_from_lse(
                    q, k_grp, pa.lse, scale, cfg
                )
        elif spec.attend_past:
            out, group_probs = attn_ops.grouped_attention(
                q, k_grp, v_grp,
                _att_view(k_buf) if use_cache_past else None,
                _att_view(v_buf) if use_cache_past else None,
                length if use_cache_past else None,
                scale=scale,
                return_group_probs=spec.needs_probs,
                causal=spec.causal,
                impl="xla" if impl in ("auto", "pallas_unified") else impl,
                k_scale=_att_view(k_scale_buf), v_scale=_att_view(v_scale_buf),
            )

    hq = cfg.num_attention_heads // spec.tp_size
    attn_out = out.astype(x.dtype).transpose(1, 0, 2).reshape(
        out.shape[1], hq * cfg.head_dim
    )
    attn_out = qdot(attn_out, lp["wo"])
    if spec.tp_axis is not None:
        # Megatron row-parallel o-proj: local-head partials sum over tp
        attn_out = jax.lax.psum(attn_out, spec.tp_axis)
    x = x + attn_out.astype(x.dtype)

    # --- pruning hook (reference qwen25_vl.py:176-185) ---
    indices = None
    if not use_cache_past:
        pass  # cache-free full forward (baseline/parity path): nothing to append
    elif spec.keep_k > 0:
        res = prune_ops.select_and_compact(
            spec.predict_type,
            spec.keep_k,
            k_grp,
            v_grp,
            hidden=x[: spec.video_len],
            group_probs=group_probs,
            accum_attn=accum,
            rng=rng,
            tp_axis=spec.tp_axis,
        )
        # unified-kernel path already wrote the raw group at [length, ...);
        # the compact overwrite below replaces its first keep_k slots (the
        # leftover raw tail stays beyond the valid length, masked off)
        if hot:
            if spec.kv_quant:
                k_all, v_all, k_scale_all, v_scale_all = (
                    kv.stacked_append_quantized(
                        k_all, v_all, k_scale_all, v_scale_all, li, length,
                        res.k_keep, res.v_keep,
                    )
                )
            else:
                k_all, v_all = kv.stacked_append(
                    k_all, v_all, li, length, res.k_keep, res.v_keep
                )
        elif cp:
            k_all, v_all, k_scale_all, v_scale_all = _cp_append(
                k_all, v_all, k_scale_all, v_scale_all, li, length,
                res.k_keep, res.v_keep, spec,
            )
        elif spec.kv_quant:
            k_buf, v_buf, k_scale_buf, v_scale_buf = kv.layer_append_quantized(
                k_buf, v_buf, k_scale_buf, v_scale_buf, length,
                res.k_keep, res.v_keep,
            )
        else:
            k_buf, v_buf = prune_ops.prune_append_layer(
                k_buf, v_buf, length, res
            )
        indices = res.indices
    else:
        if not already_appended:
            if cp:
                k_all, v_all, k_scale_all, v_scale_all = _cp_append(
                    k_all, v_all, k_scale_all, v_scale_all, li, length,
                    k_grp, v_grp, spec,
                )
            elif spec.kv_quant:
                k_buf, v_buf, k_scale_buf, v_scale_buf = (
                    kv.layer_append_quantized(
                        k_buf, v_buf, k_scale_buf, v_scale_buf, length,
                        k_grp, v_grp,
                    )
                )
            else:
                k_buf, v_buf = kv.layer_append(
                    k_buf, v_buf, length, k_grp, v_grp
                )

    if not hot and not cp and use_cache_past and k_all is not None:
        # write the (possibly appended) layer views back into the stack —
        # full-capacity copies, acceptable off the TPU hot path
        def _wb(all_, view_):
            if all_ is None or view_ is None:
                return all_
            return jax.lax.dynamic_update_index_in_dim(
                all_, view_.astype(all_.dtype), li, 0
            )

        k_all, v_all = _wb(k_all, k_buf), _wb(v_all, v_buf)
        k_scale_all = _wb(k_scale_all, k_scale_buf)
        v_scale_all = _wb(v_scale_all, v_scale_buf)

    h2 = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
    m = swiglu_mlp(h2, lp)
    if spec.tp_axis is not None:
        # row-parallel down-proj: local-column partials sum over tp
        m = jax.lax.psum(m.astype(jnp.float32), spec.tp_axis).astype(m.dtype)
    x = x + m
    return x, k_all, v_all, k_scale_all, v_scale_all, indices


# ---------------------------------------------------------------------------
# Full-stack steps
# ---------------------------------------------------------------------------


def prefill_step(
    params: dict,
    cache: kv.KVCache,
    x: Array,  # (q_len, C) input embeddings (text + scattered vision)
    cos: Array,  # (q_len, head_dim) merged mRoPE tables for these positions
    sin: Array,
    rng: Array,
    spec: StepSpec,
    advance=None,  # traced int32 overriding append_n (padded-bucket steps:
                   # only the first `advance` appended rows are real)
) -> Tuple[kv.KVCache, Array]:
    """Process one group through all layers; returns (cache', hidden_out).

    hidden_out is the final-layer hidden states (q_len, C) — used for logits
    when this is the last prefill chunk.
    """
    cfg = spec.cfg

    def body(carry, xs):
        xh, li, k_all, v_all, ks_all, vs_all = carry
        lp, length = xs
        lrng = jax.random.fold_in(rng, li)
        xh, k_all, v_all, ks_all, vs_all, _ = layer_step(
            lp, xh, cos, sin, k_all, v_all, length, lrng, spec, li=li,
            k_scale_all=ks_all, v_scale_all=vs_all,
        )
        return (xh, li + 1, k_all, v_all, ks_all, vs_all), None

    # the cache rides in the CARRY (updated in place via small DUS at
    # (li, ...)), not as scan xs/ys — xs/ys re-materializes the full stack
    # every step (see layer_step docstring)
    (x_out, _, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
        body,
        (x, jnp.int32(0), cache.k, cache.v, cache.k_scale, cache.v_scale),
        (params["layers"], cache.length),
    )
    cache = cache.replace(
        k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs,
        length=cache.length + (spec.append_n if advance is None else advance),
    )
    return cache, x_out


def prefill_step_unrolled(
    params: dict,
    cache: kv.KVCache,
    x: Array,
    cos: Array,
    sin: Array,
    rng: Array,
    specs,  # list of StepSpec, one per layer (keep_k / q_len may differ)
) -> Tuple[kv.KVCache, Array]:
    """Non-uniform path: per-layer keep_k (decay schedules, reference
    lvu/utils.py:244-251) and/or cascade activation pruning
    (`prefill_prune_starting_layer`, reference lvu/utils.py:344-372) change
    shapes mid-stack, so layers unroll instead of scanning.

    With cascade pruning, layer i with keep_k>0 and prune_for_next_layer
    shrinks hidden/cos/sin to the kept tokens for layer i+1 (the reference
    passes the pruned tuple to the next layer, qwen25_vl.py:193-195)."""
    cfg = specs[0].cfg
    n = cfg.num_hidden_layers
    k_all, v_all = cache.k, cache.v
    ks_all, vs_all = cache.k_scale, cache.v_scale
    new_len = []
    for li in range(n):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        spec = specs[li]
        lrng = jax.random.fold_in(rng, li)
        x, k_all, v_all, ks_all, vs_all, indices = layer_step(
            lp, x, cos, sin, k_all, v_all, cache.length[li],
            lrng, spec, li=li,
            k_scale_all=ks_all, v_scale_all=vs_all,
        )
        new_len.append(cache.length[li] + spec.append_n)
        if spec.keep_k > 0 and spec.cascade and li < n - 1 and indices is not None:
            if spec.prompt_len > 0:
                # query-based mode: the trailing prompt rows ride along with
                # every group (reference qwen25_lvu.py:684-686) — keep them
                # after the video rows shrink, matching the next layer's
                # q_len = keep_k + prompt_len from _layer_specs
                gv = spec.video_len
                x = jnp.concatenate([x[indices], x[gv:]], axis=0)
                cos = jnp.concatenate([cos[indices], cos[gv:]], axis=0)
                sin = jnp.concatenate([sin[indices], sin[gv:]], axis=0)
            else:
                x = x[indices]
                cos = cos[indices]
                sin = sin[indices]
    cache = cache.replace(
        k=k_all, v=v_all, k_scale=ks_all, v_scale=vs_all,
        length=jnp.stack(new_len),
    )
    return cache, x


def compute_logits(params: dict, hidden_last: Array, cfg: TextConfig) -> Array:
    """(C,) or (L, C) -> logits in f32."""
    h = rms_norm(hidden_last, params["norm"], cfg.rms_norm_eps)
    return qdot(h, params["lm_head"])


def embed_tokens(params: dict, token_ids: Array) -> Array:
    return qtake(params["embed"], token_ids, params["norm"].dtype)


def decode_step(
    params: dict,
    cache: kv.KVCache,
    token_id: Array,  # () int32
    cos: Array,  # (1, head_dim)
    sin: Array,
    spec: StepSpec,
) -> Tuple[kv.KVCache, Array]:
    """Autoregressive single-token step. Returns (cache', logits (V,) f32)."""
    cfg = spec.cfg
    x = embed_tokens(params, token_id[None])  # (1, C)

    dspec = dataclasses.replace(
        spec, q_len=1, keep_k=0, needs_probs=False, prompt_len=0
    )

    def body(carry, xs):
        xh, li, k_all, v_all, ks_all, vs_all = carry
        lp, length = xs
        xh, k_all, v_all, ks_all, vs_all, _ = layer_step(
            lp, xh, cos, sin, k_all, v_all, length, None, dspec, li=li,
            k_scale_all=ks_all, v_scale_all=vs_all,
        )
        return (xh, li + 1, k_all, v_all, ks_all, vs_all), None

    (x_out, _, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
        body,
        (x, jnp.int32(0), cache.k, cache.v, cache.k_scale, cache.v_scale),
        (params["layers"], cache.length),
    )
    cache = cache.replace(
        k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs,
        length=cache.length + 1,
    )
    logits = compute_logits(params, x_out[0], cfg)
    return cache, logits


def full_forward_logits(
    params: dict,
    x: Array,  # (L, C) embeddings
    cos: Array,
    sin: Array,
    cfg: TextConfig,
) -> Array:
    """Ungrouped, uncached causal forward over a whole sequence -> logits
    (L, V). Baseline path and the torch-parity test target."""
    spec = StepSpec(cfg=cfg, q_len=x.shape[0], keep_k=0)

    def body(xh, lp):
        xh, _, _, _, _, _ = layer_step(
            lp, xh, cos, sin, None, None,
            jnp.int32(0), None, spec, use_cache_past=False,
        )
        return xh, None

    x_out, _ = jax.lax.scan(body, x, params["layers"])
    return compute_logits(params, x_out, cfg)
