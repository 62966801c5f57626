"""Pallas TPU flash attention over the fixed-capacity KV cache buffer.

Replaces the XLA blockwise past-partial (quickvideo_tpu.ops.attention.
_blockwise_partial_attention) on TPU: the reference's CUDA flash-attn role
(reference lvu/models/qwen25_vl.py:95-105) for the grouped-prefill hot loop.

Kernel shape: grid (num_kv_heads, num_q_blocks, num_kv_blocks), kv innermost
(sequential) with running max/sum/accumulator in VMEM scratch — the standard
flash structure. GQA is folded so each kv head's `rep` query heads share one
K/V block load. Blocks entirely beyond the valid cache `length` (scalar
prefetch) skip their compute via @pl.when; the final kv step normalizes and
emits both the output and the log-sum-exp needed for the exact merge with the
in-group partial (ops.attention.merge_partials).

Returns a PartialAttn, so the caller-side contract is identical to the XLA
path — tests compare the two bit-for-bit-ish (f32 tolerance).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickvideo_tpu.ops.attention import NEG_INF, PartialAttn

Array = jax.Array

LN2 = 0.6931471805599453
LOG2E = 1.4426950408889634


def _flash_kernel(
    length_ref,  # scalar prefetch: (3,) int32 [valid cache length,
                 # group_start, layer_idx]; group_start < 0 => pure past
                 # mode (no causal span); layer_idx used only by the
                 # stacked-cache index maps
    q_ref,  # (1, nq_inner*rep*BQ, D) — nq_inner q blocks per grid step
    k_ref,  # (1, BK, D); stacked-cache mode: (1, 1, BK, D)
    v_ref,  # same shape as k_ref
    o_ref,  # (1, nq_inner*rep*BQ, D), dtype = caller out_dtype (f32 default;
            # bf16 on the engine hot path)
    lse_ref,  # (1, nq_inner*rep*BQ, 128) f32 (lse broadcast over lanes; TPU
              # block shapes need the minor dim divisible by 128), or None
              # when the caller doesn't consume the lse (with_lse=False:
              # the store is ~Hq*G*512 bytes/call of pure HBM write)
    m_scr,  # VMEM (nq_inner*rep*BQ, 1) f32
    s_scr,  # VMEM (nq_inner*rep*BQ, 1) f32
    acc_scr,  # VMEM (nq_inner*rep*BQ, D) f32
    *,
    block_q: int,
    block_k: int,
    nq_inner: int,
    scale: float,
    ks_ref=None,  # int8 mode: (1, 8, BK) lane-aligned scale tile (the scale
                  # of kv token t sits at lane t - blk_start; 8 replicated
                  # sublane rows satisfy Mosaic block-shape constraints)
    vs_ref=None,
    qs_ref=None,  # int8-QK mode: (1, qrows, 128) f32 per-QUERY-row scales
                  # (lane-replicated); q_ref is then int8 and the QK matmul
                  # runs s8xs8->s32 on the MXU (2x the bf16 rate), with
                  # qs[row] * ks[col] folding both quantizations into the
                  # f32 scores. scale*log2e is absorbed into qs host-side.
    pv_dtype=jnp.bfloat16,  # PV compute dtype in int8-QK mode (= the
                  # activation dtype before q was quantized)
):
    """Online-softmax flash step over one KV block x `nq_inner` query blocks.

    The q-block loop lives INSIDE the kernel (static Python unroll), not in
    the grid: per-grid-step DMA issue overhead measures ~2.2 us on v5e —
    with one q block per step that overhead alone was ~60% of kernel time
    at the group shape (2048 steps). Folding nq_inner=4 q blocks into one
    step cuts grid steps 4x; the k/v block is loaded once and reused for
    all four."""
    qh = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    length = length_ref[0]
    group_start = length_ref[1]
    rbq = o_ref.shape[1] // nq_inner

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    blk_start = ki * block_k
    causal = group_start >= 0
    ci = causal.astype(jnp.int32)

    def _scores(rows):
        q = q_ref[0, rows]  # (rep*BQ, D)
        k = k_ref[0, 0] if len(k_ref.shape) == 4 else k_ref[0]  # (BK, D)
        if qs_ref is not None:
            # int8 x int8 QK on the MXU (s8s8s32, 2x the bf16 rate); both
            # quantizations rescale the f32 scores: per-row q scale (which
            # absorbed scale*log2e) x per-column k scale
            scores = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            scores = scores * qs_ref[0, rows, 0:1] * ks_ref[0, 0:1, :]
            return scores
        if ks_ref is not None and k.dtype == jnp.int8:
            # int8 k against bf16 q: mixed int8 matmul inputs lower poorly;
            # cast values to the q dtype and fold the per-token scale into
            # the SCORES columns (lane-aligned): scores[:, t] *= kscale[t]
            k = k.astype(q.dtype)
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rep*BQ, BK) in log2 units (q pre-scaled by scale*log2e)
        if ks_ref is not None:
            scores = scores * ks_ref[0, 0:1, :]
        return scores

    def _update(rows, scores):
        # online-softmax update in log2 space (exp2 == exp of true scores).
        # The kernel is VMEM-bandwidth-bound on passes over the (rep*BQ, BK)
        # score tile, so every pass counts: exp2 writes p directly in the
        # matmul dtype (fused exponent+cast, half the bytes of an f32 p) and
        # the denominator accumulates in f32 from the bf16 p — which also
        # makes the denominator consistent with the numerator's rounding.
        m_prev = m_scr[rows, 0]
        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m_prev, m_blk)
        m_safe = jnp.maximum(m_new, -1e29)
        # masked columns hold NEG_INF: exp2 underflows to exactly 0, so no
        # second where(mask, p, 0) pass is needed
        p = jnp.exp2(scores - m_safe[:, None])
        alpha = jnp.exp2(jnp.maximum(m_prev, -1e29) - m_safe)
        s_scr[rows, 0] = s_scr[rows, 0] * alpha + jnp.sum(p, axis=-1)
        v_blk = v_ref[0, 0] if len(v_ref.shape) == 4 else v_ref[0]
        pv = p
        if vs_ref is not None:
            # per-token V scale folded into p's columns (= scaling V rows)
            pv = p * vs_ref[0, 0:1, :]
        if v_blk.dtype == jnp.int8:
            # PV compute dtype: the ORIGINAL activation dtype (pv_dtype) —
            # in int8-QK mode q_ref itself is int8 and can't supply it
            v_blk = v_blk.astype(
                pv_dtype if q_ref.dtype == jnp.int8 else q_ref.dtype
            )
        acc_scr[rows] = acc_scr[rows] * alpha[:, None] + jax.lax.dot_general(
            pv.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[rows, 0] = m_new

    for qj in range(nq_inner):
        rows = slice(qj * rbq, (qj + 1) * rbq)
        # global q-block index: traced (qh) + static (qj)
        qblk = qh * nq_inner + qj
        max_kv = jnp.where(causal, group_start + (qblk + 1) * block_q, length)
        # rows of this q block start at bound_min; blocks wholly below it
        # need NO mask — the iota/compare/select passes over the
        # (rep*BQ, BK) tile are pure VPU cost, skipped for interior blocks
        bound_min = ci * (group_start + qblk * block_q) + (1 - ci) * (
            length - 1
        )
        interior = blk_start + block_k - 1 <= bound_min

        @pl.when(jnp.logical_and(blk_start < max_kv, interior))
        def _compute_interior(rows=rows):
            _update(rows, _scores(rows))

        @pl.when(
            jnp.logical_and(blk_start < max_kv, jnp.logical_not(interior))
        )
        def _compute_boundary(rows=rows, qblk=qblk):
            scores = _scores(rows)
            pos = blk_start + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, dimension=1
            )
            # absolute query position of each row: rows are laid out as
            # rep blocks of block_q query positions
            qpos = group_start + qblk * block_q + (
                jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                % block_q
            )
            # arithmetic bound instead of an i1-vector select (Mosaic cannot
            # legalize arith.select on vector<i1>): causal rows attend up to
            # their own position, pure-past rows up to length-1
            bound = ci * qpos + (1 - ci) * (length - 1)
            scores = jnp.where(pos <= bound, scores, NEG_INF)
            _update(rows, scores)

    @pl.when(ki == nk - 1)
    def _finalize():
        s = s_scr[:, 0]
        m = m_scr[:, 0]
        # o_ref's dtype is the caller's out_dtype (f32 by default; the
        # engine's hot path passes the activation dtype — the very next op
        # casts to it anyway, and a bf16 store halves the kernel-output
        # HBM write plus the (hq, g, d) unfold relayout that follows)
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(s, 1e-30)[:, None]
        ).astype(o_ref.dtype)
        if lse_ref is not None:
            # m/s live in log2 space; the PartialAttn contract is
            # natural-log lse
            lse = jnp.where(
                s > 0,
                jnp.maximum(m, -1e29) * LN2 + jnp.log(jnp.maximum(s, 1e-30)),
                NEG_INF,
            )
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_q", "block_k", "interpret", "causal", "active_cap",
        "int8_qk", "nq_inner", "out_dtype", "with_lse",
    ),
)
def _flash_past_attention_impl(
    q: Array,  # (Hq, G, D)
    k_past: Array,  # (Hkv, capacity, D); stacked mode: (L, Hkv, capacity, D)
    v_past: Array,
    length: Array,  # () int32
    *,
    scale: float,
    block_q: int = 128,
    block_k: int = 1024,
    # defaults from the v5e sweep at the 3B group shape (q=2048, 37k valid):
    # (128,1024) 8.7ms vs (256,512) 10.9ms; larger tiles fail Mosaic VMEM
    # limits (f32 score tile rep*bq x bk must stay <= ~4MB). See
    # benchmarks/flash_block_sweep.py.
    interpret: bool = False,
    causal: bool = False,
    k_scale: Array = None,  # (Hkv, capacity) f32 when k_past is int8
    v_scale: Array = None,
    active_cap: int = 0,  # static bound on the cache prefix this call may
    # read (0 = whole buffer). The k-grid is sized by it instead of the
    # buffer capacity: empty tail block-steps beyond the valid length cost
    # real time even with their DMA elided (~3 us/step per layer — 7 ms/token
    # at 64k capacity with 1k valid, measured on v5e). The buffer stays the
    # operand — no slice, so in-place cache donation is preserved. Caller
    # contract: length (+ any appended group) never exceeds active_cap.
    int8_qk: bool = None,  # quantize q per row and run the QK matmul
    # s8xs8->s32 (2x the bf16 MXU rate). Defaults to ON whenever the cache
    # is int8 (k_scale given): the keys already carry 1/127-rounding, and
    # the extra per-row q rounding measures equally small (see
    # tests/test_quantization_accuracy.py). QV_INT8_QK=0 opts out.
    layer_idx: Array = None,  # stacked-cache mode: k/v_past are the FULL
    # (L, Hkv, capacity, D) cache stack and this () int32 selects the layer.
    # The index maps address blocks straight into the stack, so the caller
    # never materializes a (Hkv, capacity, D) layer view — slicing one out
    # copies the whole capacity buffer (~15 GB/token across a 7B stack at
    # 64k capacity, measured; the reason decode was 2.4x off the roofline).
    nq_inner: int = 0,  # q blocks folded per grid step; 0 = mode default
    # (4 bf16 / 2 int8). Static (part of the jit cache key) so sweeps that
    # vary it re-trace instead of silently reusing a cached kernel — the
    # QV_FLASH_NQ_INNER env read happens at trace time and is NOT keyed.
    out_dtype=jnp.float32,  # dtype of the emitted attention output. f32
    # preserves the exact pre-change numerics for the merge/parity paths;
    # the engine's hot unified path passes the activation dtype (the caller
    # casts there immediately anyway — one identical rounding, half the
    # output-store + unfold-relayout HBM traffic).
    with_lse: bool = True,  # False skips computing/storing the lse output
    # entirely (returns PartialAttn(out, None)). The unified hot path never
    # merges (one kernel covers past+group) and only reads lse when the
    # predictor needs probs — the store is Hq*G*512 B/call of HBM write
    # (~40 MB at the 7B group shape, ~45 ms per strict e2e run).
) -> PartialAttn:
    """Pure-past mode (causal=False): attends cache slots [0, length).
    Unified mode (causal=True): the buffer holds [past | appended group];
    query row i (a group position) attends slots [0, length + i] — one kernel
    replaces the two-partial merge of the XLA path."""
    hq, g, d = q.shape
    stacked = k_past.ndim == 4
    if stacked:
        assert layer_idx is not None, "stacked cache needs layer_idx"
        _, hkv, cap, _ = k_past.shape
    else:
        hkv, cap, _ = k_past.shape
    rep = hq // hkv
    act_dtype = q.dtype  # pre-quantize activation dtype; PV runs in it
    # K and V quantize independently: the int8k cache mode stores K int8
    # (QK runs at the doubled s8xs8 MXU rate) while V stays bf16 (PV keeps
    # full-rate bf16 with no per-block dequant cast) — see kv_cache.init_cache
    quant_k = k_scale is not None
    quant_v = v_scale is not None
    assert quant_k or not quant_v, "v_scale without k_scale is unsupported"
    # int8_qk arrives RESOLVED (a bool) from the public wrapper: the
    # QV_INT8_QK env default must be part of the jit cache key, not read
    # at trace time (an in-process env flip would silently reuse the
    # cached kernel otherwise — the same hazard nq_inner guards against)
    int8_qk = bool(int8_qk and quant_k)
    # pre-scale q by scale*log2(e): scores leave the MXU already in log2
    # units, saving one full-tile VPU multiply per kv block in the kernel
    # (f32 multiply, then back to the compute dtype — per-element rounding
    # only, no systematic temperature shift)
    qf32 = q.astype(jnp.float32) * (scale * LOG2E)
    if int8_qk:
        # per-row symmetric int8: the row scale absorbs scale*log2e, so the
        # kernel's qs*ks rescale lands scores directly in log2 units
        qs = jnp.maximum(
            jnp.max(jnp.abs(qf32), axis=-1, keepdims=True), 1e-20
        ) / 127.0  # (Hq, G, 1)
        q = jnp.clip(jnp.round(qf32 / qs), -127, 127).astype(jnp.int8)
        qs = qs[..., 0]
    else:
        q = qf32.astype(q.dtype)
        qs = None
    block_q = min(block_q, g)
    block_k = min(block_k, cap)
    if stacked:
        # padding the stack would copy it wholesale — shrink block_k to a
        # divisor instead (capacities are powers of two in practice)
        while cap % block_k:
            block_k //= 2
        # a capacity with an odd factor would collapse block_k to 1 — a
        # degenerate grid (and the int8 path asserts 128-alignment). The
        # engine rounds capacities to multiples of 4096 (and 4096*sp under
        # context parallelism) precisely to keep this aligned; fail loudly
        # rather than emit a ~cap-step kernel.
        assert block_k >= min(128, cap), (
            f"stacked-cache flash needs block_k>=128 dividing capacity; "
            f"capacity={cap} collapsed block_k to {block_k}. Round the "
            f"cache capacity to a multiple of 4096 (see engine.plan_capacity)."
        )
    eff_cap = cap if not active_cap else min(cap, max(active_cap, block_k))
    nq = -(-g // block_q)
    nk = -(-eff_cap // block_k)
    pad_q = nq * block_q - g
    pad_k = -(-cap // block_k) * block_k - cap  # full-buffer layout padding
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        if qs is not None:
            qs = jnp.pad(qs, ((0, 0), (0, pad_q)), constant_values=1.0)
    if pad_k:
        k_past = jnp.pad(k_past, ((0, 0), (0, pad_k), (0, 0)))
        v_past = jnp.pad(v_past, ((0, 0), (0, pad_k), (0, 0)))
        if quant_k:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, pad_k)))
        if quant_v:
            v_scale = jnp.pad(v_scale, ((0, 0), (0, pad_k)))
    gq = g + pad_q  # padded G
    rbq = rep * block_q
    # fold GQA (query head h serves kv head h // rep): (Hkv, rep, Gp, D)
    qf = q.reshape(hkv, rep, gq, d)

    # q blocks folded into the kernel body (static unroll): per-grid-step
    # DMA issue overhead (~2.2us on v5e) dominated the kernel with one q
    # block per step. VMEM budget (~16MB scoped) allows 4 q blocks of 1024
    # rows in bf16 mode; the int8 mode's scale tiles and cast temps push a
    # 4x unroll 340KB over the limit at 2^17 capacity, so quant uses 2.
    import os as _os

    _default_inner = 2 if quant_k else 4
    if not nq_inner:
        nq_inner = int(_os.environ.get("QV_FLASH_NQ_INNER", _default_inner))
    nq_inner = min(nq_inner, nq)
    while nq % nq_inner:
        nq_inner -= 1
    nqh = nq // nq_inner
    qrows = nq_inner * rbq

    capp = cap + pad_k  # padded capacity

    def kv_block(h, qh, ki, len_ref):
        # The kernel is DMA-BOUND (measured: streaming k/v blocks alone costs
        # ~60% of kernel time at the group shape), and Mosaic prefetches the
        # block for EVERY grid step regardless of @pl.when — including the
        # invalid capacity tail beyond `length`. Clamping the block index to
        # the last attendable block makes beyond-valid steps REVISIT the
        # same block, and revisiting elides the DMA entirely: the unused
        # tail of the fixed-capacity buffer is never read from HBM.
        length = len_ref[0]
        group_start = len_ref[1]
        # bound of the LAST q block in this step's inner unroll
        qblk_hi = qh * nq_inner + (nq_inner - 1)
        max_kv = jnp.where(
            group_start >= 0, group_start + (qblk_hi + 1) * block_q, length
        )
        return jnp.maximum(
            jnp.minimum(ki, (max_kv + block_k - 1) // block_k - 1), 0
        )

    if stacked:
        def kv_index(h, qh, ki, len_ref):
            return (len_ref[2], h, kv_block(h, qh, ki, len_ref), 0)

        kv_blockshape = (1, 1, block_k, d)
    else:
        def kv_index(h, qh, ki, len_ref):
            return (h, kv_block(h, qh, ki, len_ref), 0)

        kv_blockshape = (1, block_k, d)

    in_specs = [
        pl.BlockSpec(
            (1, qrows, d), lambda h, qh, ki, *_: (h, qh, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(kv_blockshape, kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(kv_blockshape, kv_index, memory_space=pltpu.VMEM),
    ]
    if quant_k:
        assert block_k % 128 == 0 and capp % 128 == 0, (block_k, capp)
        # lane-aligned scale tiles: (Hkv, 8, capp) with the 8 sublane rows
        # replicated (Mosaic block shapes need sublanes % 8); the kernel
        # reads row 0 as a (1, BK) vector aligned with score columns
        def scale_index(h, qh, ki, len_ref):
            return (h, 0, kv_block(h, qh, ki, len_ref))

        in_specs.append(pl.BlockSpec(
            (1, 8, block_k), scale_index, memory_space=pltpu.VMEM
        ))
        if quant_v:
            in_specs.append(pl.BlockSpec(
                (1, 8, block_k), scale_index, memory_space=pltpu.VMEM
            ))
        if int8_qk:
            in_specs.append(pl.BlockSpec(
                (1, qrows, 128), lambda h, qh, ki, *_: (h, qh, 0),
                memory_space=pltpu.VMEM,
            ))
    out_specs = [
        pl.BlockSpec(
            (1, qrows, d), lambda h, qh, ki, *_: (h, qh, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((hkv, nq * rbq, d), out_dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec(
            (1, qrows, 128), lambda h, qh, ki, *_: (h, qh, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape.append(
            jax.ShapeDtypeStruct((hkv, nq * rbq, 128), jnp.float32)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hkv, nqh, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((qrows, 1), jnp.float32),
            pltpu.VMEM((qrows, 1), jnp.float32),
            pltpu.VMEM((qrows, d), jnp.float32),
        ],
    )
    # q-block layout: (Hkv, nq * rep*block_q, D) — each grid q-step sees the
    # rep query heads' rows for one G-block contiguously
    qblocks = (
        qf.reshape(hkv, rep, nq, block_q, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hkv, nq * rbq, d)
    )
    # ONE kernel wrapper for every operand mode: pallas passes the refs
    # positionally (inputs, then outputs, then scratch) and which optional
    # slots exist — ks/vs/qs scale tiles, the lse output — is static here,
    # so the wrapper peels them off `rest` in order and forwards None for
    # the absent ones
    def kernel(length_ref, q_ref, k_ref, v_ref, *rest):
        rest = list(rest)
        ks_ref = rest.pop(0) if quant_k else None
        vs_ref = rest.pop(0) if quant_v else None
        qs_ref = rest.pop(0) if int8_qk else None
        o_ref = rest.pop(0)
        lse_ref = rest.pop(0) if with_lse else None
        m_scr, s_scr, acc_scr = rest
        return _flash_kernel(
            length_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
            m_scr, s_scr, acc_scr,
            block_q=block_q, block_k=block_k, nq_inner=nq_inner,
            scale=scale, ks_ref=ks_ref, vs_ref=vs_ref, qs_ref=qs_ref,
            pv_dtype=act_dtype,
        )

    operands = [qblocks, k_past, v_past]
    if quant_k:
        operands.append(
            jnp.broadcast_to(k_scale[:, None, :], (hkv, 8, capp))
        )
        if quant_v:
            operands.append(
                jnp.broadcast_to(v_scale[:, None, :], (hkv, 8, capp))
            )
        if int8_qk:
            qsf = (
                qs.reshape(hkv, rep, nq, block_q)
                .transpose(0, 2, 1, 3)
                .reshape(hkv, nq * rbq)
            )
            operands.append(jnp.broadcast_to(
                qsf[:, :, None], (hkv, nq * rbq, 128)
            ))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # Mosaic's default scoped-VMEM budget is 16 MB; at rep=7 (the 7B's
        # 28q/4kv GQA) the 4-block q unroll's score tiles sit right at that
        # edge — upstream fusion/layout changes (e.g. int8 activations) tipped
        # it to 17.6 MB and failed compile. v5e has 128 MB VMEM; grant the
        # kernel 64 MB so block sizing is governed by the sweep, not the
        # default cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.stack([
            length.astype(jnp.int32),
            (length.astype(jnp.int32) if causal else jnp.int32(-1)),
            (jnp.asarray(layer_idx, jnp.int32)
             if layer_idx is not None else jnp.int32(0)),
        ]),
        *operands,
    )
    # unfold back to (Hq, G, D)
    out = (
        outs[0].reshape(hkv, nq, rep, block_q, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hq, gq, d)[:, :g]
    )
    lse = None
    if with_lse:
        lse = (
            outs[1][..., 0]
            .reshape(hkv, nq, rep, block_q)
            .transpose(0, 2, 1, 3)
            .reshape(hq, gq)[:, :g]
        )
    return PartialAttn(out, lse)


def flash_past_attention(
    q: Array,
    k_past: Array,
    v_past: Array,
    length: Array,
    *,
    scale: float,
    block_q: int = 128,
    block_k: int = 1024,
    interpret: bool = False,
    causal: bool = False,
    k_scale: Array = None,
    v_scale: Array = None,
    active_cap: int = 0,
    int8_qk: bool = None,
    layer_idx: Array = None,
    nq_inner: int = 0,
    out_dtype=jnp.float32,
    with_lse: bool = True,
) -> PartialAttn:
    """Public entry — see _flash_past_attention_impl for the full operand
    contract. Resolves the int8-QK default (ON for int8 caches unless
    QV_INT8_QK=0) HERE, outside the jit, so the resolved bool is part of
    the jit cache key: an env read inside the traced body would let an
    in-process flip of QV_INT8_QK silently reuse the stale cached kernel
    (the jit key would still be int8_qk=None)."""
    if int8_qk is None:
        int8_qk = (
            k_scale is not None and os.environ.get("QV_INT8_QK", "1") != "0"
        )
    return _flash_past_attention_impl(
        q, k_past, v_past, length, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret, causal=causal,
        k_scale=k_scale, v_scale=v_scale, active_cap=active_cap,
        int8_qk=bool(int8_qk), layer_idx=layer_idx, nq_inner=nq_inner,
        out_dtype=out_dtype, with_lse=bool(with_lse),
    )
