"""Fused dual-GEMM + SwiGLU + act-quantize for the vision MLP (Pallas).

The vision tower's a8 MLP (vision.py::_vision_mlp) is the one place XLA's
fusion leaves measured money on the table: the gate/up int8 dots materialize
two (S, I) s32 outputs to HBM (~392 MB/block at the strict 7B group shape)
that the silu*mul*quantize epilogue immediately re-reads. XLA cannot fuse
across a dot, so that traffic is structural — ~0.5 ms/block, ~0.5 s over the
32-group demo protocol (measured: benchmarks/vision_glue_probe.py and
benchmarks/gemm_pallas_sweep.py, where a plain Pallas int8 GEMM at this
shape runs 0.60 ms vs XLA's 0.758 ms — so the fusion does not pay an MXU
efficiency tax).

This kernel runs, per row-tile of the (pre-quantized) block input:

    acc  = xq @ [wg | wu]            int8 x int8 -> s32, one MXU pass
    y    = bf16(acc * xs * w_sc) + b  (exact production rescale order,
                                       ops/quantization.qdot_pre + bias)
    m    = silu(y_gate) * y_up        bf16 (production dtype)
    out  = per-row int8 quantize(m)   (quantize_act semantics)

writing ONLY the int8 result + row scales — the s32/bf16 intermediates never
leave VMEM. The down projection then consumes (out, scales) via qdot_pre
against a row-padded wd.

Weight prep (fuse_vision_mlp_weights): gate|up concatenated on the output
axis and column-padded to a 128-lane multiple (I=3420 -> 3456 on the 7B
tower; pad q8 columns are zero and pad biases zero, so the pad lanes compute
silu(0)*0 = 0 — numerics exact, and the row-max for quantization is
unaffected). wd gets matching zero input-row padding. Stacked over depth so
the tower's lax.scan slices per block.

No reference counterpart: the reference's HF vision tower runs unquantized
bf16 Linears (reference lvu/models/qwen25_vl.py uses the stock HF model).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickvideo_tpu.ops.quantization import _EPS, is_quantized

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fuse_vision_mlp_weights(vision_params: dict, cfg) -> dict:
    """One-time prep: add `wgu_p` (gate|up concat, column-padded, int8 dict),
    `bgu_p` ((1, 2*Np) bias row), and `wd_p` (row-padded down proj) to the
    stacked block weights. Only for QUANTIZED towers (the fused kernel is
    int8-only); idempotent; shares every other leaf. Memory: one extra int8
    copy of the MLP weights (~424 MB on the 7B tower) — the unpadded
    originals stay for the weight-only / CPU paths."""
    blocks = vision_params.get("blocks")
    if (
        blocks is None
        or "wgu_p" in blocks
        or not is_quantized(blocks.get("wg"))
        or not is_quantized(blocks.get("wd"))
    ):
        return vision_params
    ii = cfg.intermediate_size
    np_ = _round_up(ii, LANE)

    def prep(wg, wu, bg, bu, wd):
        # (depth, C, I) -> (depth, C, 2*Np); scales (depth, 1, I) follow
        def cat_pad(a, fill=0):
            pad = [(0, 0)] * (a[0].ndim - 1) + [(0, np_ - ii)]
            return jnp.concatenate(
                [jnp.pad(a[0], pad, constant_values=fill),
                 jnp.pad(a[1], pad, constant_values=fill)], axis=-1
            )

        wgu = {
            "q8": cat_pad((wg["q8"], wu["q8"])),
            # pad scales with 1.0 (pad q8 is zero, so the value is moot;
            # 1.0 avoids subnormal-flush surprises)
            "sc": cat_pad((wg["sc"], wu["sc"]), fill=1.0),
        }
        bgu = cat_pad((bg[:, None, :], bu[:, None, :]))  # (depth, 1, 2Np)
        # wd: (depth, I, C) -> (depth, Np, C) zero input rows
        wd_p = {
            "q8": jnp.pad(wd["q8"], ((0, 0), (0, np_ - ii), (0, 0))),
            "sc": wd["sc"],
        }
        return wgu, bgu, wd_p

    wgu, bgu, wd_p = jax.jit(prep)(
        blocks["wg"], blocks["wu"], blocks["bg"], blocks["bu"], blocks["wd"]
    )
    out_blocks = dict(blocks)
    out_blocks["wgu_p"] = wgu
    out_blocks["bgu_p"] = bgu
    out_blocks["wd_p"] = wd_p
    out = dict(vision_params)
    out["blocks"] = out_blocks
    return out


def _epilogue(acc, xs, sc_ref, b_ref, q_ref, s_ref, n_pad):
    y = (
        acc.astype(jnp.float32) * xs * sc_ref[:]
    ).astype(jnp.bfloat16) + b_ref[:]
    # silu*mul in f32 (Mosaic miscompiles the bf16 logistic's f32-constant
    # broadcast); <=1 bf16-ulp from the chain's bf16 silu, far below the
    # int8 quantization step this feeds
    g = y[:, :n_pad].astype(jnp.float32)
    u = y[:, n_pad:].astype(jnp.float32)
    mf = g * jax.lax.logistic(g) * u
    s = jnp.maximum(
        jnp.max(jnp.abs(mf), axis=-1, keepdims=True), _EPS
    ) / 127.0
    q_ref[:] = jnp.clip(jnp.round(mf / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def _kernel(xq_ref, xs_ref, w_ref, sc_ref, b_ref, q_ref, s_ref, *, n_pad):
    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    _epilogue(acc, xs_ref[:], sc_ref, b_ref, q_ref, s_ref, n_pad)


def _ln_quantize(x_ref, ln_ref, eps):
    """rmsnorm + per-row int8 quantize of the raw block input IN-KERNEL
    (the separate XLA ln + quantize_act passes and their (S, C) HBM
    round-trips disappear). Math is production-exact: bf16 rounding order
    of _rms_norm, quantize_act's scale rule. Zero pad rows quantize to
    zeros (var 0 -> h 0). Returns (xq int8, xs f32 row scales)."""
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    # bf16 round-trips via explicit bit-level RN-even, NOT astype: inside
    # one fused computation the compiler elides convert(bf16)->convert(f32)
    # chains, which would skip the production chain's bf16 rounding of h
    # (1 ulp at the row max flips the quantize scale). reduce_precision
    # has no Mosaic lowering, so round in u32: add 0x7fff + lsb-of-keep
    # and mask (exact RN-even for finite values; ours are normed rows).
    def _round_bf16(v):
        b = jax.lax.bitcast_convert_type(v, jnp.uint32)
        b = (b + 0x7FFF + ((b >> 16) & 1)) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(b, jnp.float32)

    t = _round_bf16(xf * jax.lax.rsqrt(var + eps))
    hf = _round_bf16(t * ln_ref[:].astype(jnp.float32))
    xs = jnp.maximum(
        jnp.max(jnp.abs(hf), axis=-1, keepdims=True), _EPS
    ) / 127.0
    xq = jnp.clip(jnp.round(hf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _ln_kernel(x_ref, ln_ref, w_ref, sc_ref, b_ref, q_ref, s_ref, *,
               n_pad, eps):
    """ln + quantize in-kernel, then the same dual GEMM + epilogue."""
    xq, xs = _ln_quantize(x_ref, ln_ref, eps)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    _epilogue(acc, xs, sc_ref, b_ref, q_ref, s_ref, n_pad)


def _call(kernel, first_in, first_spec_width, sp, bm, c, n2, n_pad, wq8,
          sc, bgu, extra, interpret):
    row = lambda i: (i, 0)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(sp // bm,),
        in_specs=[
            pl.BlockSpec((bm, first_spec_width), row,
                         memory_space=pltpu.VMEM),
            *extra[0],
            pl.BlockSpec((c, n2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((sp, n_pad), jnp.int8),
            jax.ShapeDtypeStruct((sp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * sp * c * n2,
            bytes_accessed=sp * c + c * n2 + sp * n_pad,
            transcendentals=sp * n_pad,
        ),
        interpret=interpret,
    )(first_in, *extra[1], wq8, sc, bgu)


def dual_gemm_silu_quant(
    xq: jax.Array,   # (S, C) int8 — pre-quantized block input
    xs: jax.Array,   # (S, 1) f32 per-row scales
    wgu: dict,       # {"q8": (C, 2*Np) int8, "sc": (1, 2*Np) f32}
    bgu: jax.Array,  # (1, 2*Np) bf16
    *,
    bm: int = 128,
    interpret: bool = False,
):
    """Returns (mq8 (S, Np) int8, ms (S, 1) f32): the quantized SwiGLU
    output ready for qdot_pre against the row-padded down projection."""
    s_len, c = xq.shape
    n2 = wgu["q8"].shape[1]
    n_pad = n2 // 2
    sc = wgu["sc"].reshape(1, n2)
    bgu = bgu.reshape(1, n2).astype(jnp.bfloat16)
    sp = _round_up(s_len, bm)
    if sp != s_len:
        xq = jnp.pad(xq, ((0, sp - s_len), (0, 0)))
        xs = jnp.pad(xs, ((0, sp - s_len), (0, 0)), constant_values=1.0)
    row = lambda i: (i, 0)  # noqa: E731
    q, s = _call(
        functools.partial(_kernel, n_pad=n_pad), xq, c, sp, bm, c, n2,
        n_pad, wgu["q8"], sc, bgu,
        ([pl.BlockSpec((bm, 1), row, memory_space=pltpu.VMEM)], [xs]),
        interpret,
    )
    if sp != s_len:
        q, s = q[:s_len], s[:s_len]
    return q, s


def ln_dual_gemm_silu_quant(
    x: jax.Array,     # (S, C) bf16 — RAW block input (pre-norm)
    ln_w: jax.Array,  # (C,) rmsnorm weight
    wgu: dict,
    bgu: jax.Array,
    *,
    eps: float,
    bm: int = 128,
    interpret: bool = False,
):
    """Like dual_gemm_silu_quant, but the rmsnorm + per-row quantize run
    INSIDE the kernel on the VMEM row tile — the normed/quantized (S, C)
    intermediates never touch HBM (vs the XLA chain's ~0.16 ms/block of
    ln2 + quantize_act round-trips)."""
    s_len, c = x.shape
    n2 = wgu["q8"].shape[1]
    n_pad = n2 // 2
    sc = wgu["sc"].reshape(1, n2)
    bgu = bgu.reshape(1, n2).astype(jnp.bfloat16)
    sp = _round_up(s_len, bm)
    if sp != s_len:
        x = jnp.pad(x, ((0, sp - s_len), (0, 0)))
    rep = lambda i: (0, 0)  # noqa: E731
    q, s = _call(
        functools.partial(_ln_kernel, n_pad=n_pad, eps=eps), x, c, sp, bm,
        c, n2, n_pad, wgu["q8"], sc, bgu,
        ([pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM)],
         [ln_w.reshape(1, c)]),
        interpret,
    )
    if sp != s_len:
        q, s = q[:s_len], s[:s_len]
    return q, s


def _ln_gemm_kernel(x_ref, ln_ref, w_ref, sc_ref, b_ref, o_ref, *, eps):
    """ln + quantize in-kernel, int8 GEMM, rescale + bias -> bf16 out.
    The plain-projection counterpart of _ln_kernel (no SwiGLU epilogue):
    used for the vision QKV projection, where the XLA chain pays an ln
    HBM round-trip plus a weight-only bf16 GEMM."""
    xq, xs = _ln_quantize(x_ref, ln_ref, eps)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (
        acc.astype(jnp.float32) * xs * sc_ref[:]
    ).astype(jnp.bfloat16) + b_ref[:]


def ln_gemm_bias(
    x: jax.Array,     # (S, C) bf16 — RAW block input (pre-norm)
    ln_w: jax.Array,  # (C,) rmsnorm weight
    w: dict,          # {"q8": (C, N) int8, "sc": (1, N) f32}
    b: jax.Array,     # (N,) or (1, N) bf16 bias
    *,
    eps: float,
    bm: int = 128,  # bm=256 oversubscribes ~16 MB VMEM at N=6144 (f32 acc)
    interpret: bool = False,
):
    """rmsnorm(x)*ln_w -> per-row int8 quantize -> int8 GEMM -> rescale +
    bias, all in one kernel pass; returns (S, N) bf16. Per-row act-quant
    semantics identical to quantize_act + qdot_pre (the act-quantized
    counterpart of the weight-only qdot chain it replaces)."""
    s_len, c = x.shape
    n = w["q8"].shape[1]
    sc = w["sc"].reshape(1, n)
    b = b.reshape(1, n).astype(jnp.bfloat16)
    sp = _round_up(s_len, bm)
    if sp != s_len:
        x = jnp.pad(x, ((0, sp - s_len), (0, 0)))
    row = lambda i: (i, 0)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_ln_gemm_kernel, eps=eps),
        grid=(sp // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, n), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * sp * c * n,
            bytes_accessed=sp * c * 3 + c * n + sp * n * 2,
            transcendentals=sp,
        ),
        interpret=interpret,
    )(x, ln_w.reshape(1, c), w["q8"], sc, b)
    if sp != s_len:
        out = out[:s_len]
    return out


def fused_mlp_enabled() -> bool:
    return os.environ.get("QV_FUSED_VISION_MLP", "1") != "0"


def fused_qkv_enabled() -> bool:
    """The fused ln+act-quant QKV projection (ln_gemm_bias) — default ON
    since the TPU tower A/B (benchmarks/qkv_fuse_probe.py: 55.3 vs
    67.3 ms median per 32-block tower at the strict 7B shape, -12 ms/group)
    and the tower guard test landed. Numerics: per-row int8 act-quant
    instead of the weight-only bf16 GEMM — same quantization family as the
    default int8-act MLP chain; gated by the e2e teacher-forced agreement
    tests (tests/test_quantization_accuracy.py)."""
    return os.environ.get("QV_FUSED_VISION_QKV", "1") != "0"


if __name__ == "__main__":  # pragma: no cover — TPU microbench
    import sys
    import time

    from quickvideo_tpu.ops import quantization as qz

    S = int(os.environ.get("FM_S", 14080))
    C, I = 1280, 3420
    NP = _round_up(I, LANE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, C)) * 0.05, jnp.bfloat16)
    wg = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((C, I)) * 0.02, jnp.float32))
    wu = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((C, I)) * 0.02, jnp.float32))
    bg = jnp.asarray(rng.standard_normal(I) * 0.01, jnp.bfloat16)
    bu = jnp.asarray(rng.standard_normal(I) * 0.01, jnp.bfloat16)
    pad = NP - I
    wgu = {
        "q8": jnp.concatenate(
            [jnp.pad(wg["q8"], ((0, 0), (0, pad))),
             jnp.pad(wu["q8"], ((0, 0), (0, pad)))], axis=1),
        "sc": jnp.concatenate(
            [jnp.pad(wg["sc"], (0, pad), constant_values=1.0),
             jnp.pad(wu["sc"], (0, pad), constant_values=1.0)]),
    }
    bgu = jnp.concatenate(
        [jnp.pad(bg, (0, pad)), jnp.pad(bu, (0, pad))])[None]

    @jax.jit
    def chain(x):
        xq, xs = qz.quantize_act(x)
        g = qz.qdot_pre(xq, xs, wg).astype(jnp.bfloat16) + bg
        u = qz.qdot_pre(xq, xs, wu).astype(jnp.bfloat16) + bu
        return qz.quantize_act(jax.nn.silu(g) * u)

    def fused_at(bm):
        @jax.jit
        def fused(x):
            xq, xs = qz.quantize_act(x)
            return dual_gemm_silu_quant(xq, xs, wgu, bgu, bm=bm)
        return fused

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        dt = (time.perf_counter() - t0) / 20
        print(f"{name:32s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
        return out

    print(f"devices: {jax.devices()} S={S}", file=sys.stderr)
    qc, sc_ = timeit("xla chain (quant+dots+glue)", chain, x)
    for bm in (64, 128, 256):
        try:
            qf, sf = timeit(f"fused bm={bm}", fused_at(bm), x)
        except Exception as e:  # noqa: BLE001
            print(f"bm={bm} failed: {e}", file=sys.stderr)
            continue
        dq_c = np.asarray(qc, np.float32) * np.asarray(sc_)
        dq_f = np.asarray(qf, np.float32)[:, :I] * np.asarray(sf)
        print(f"  bm={bm} max err {np.max(np.abs(dq_c - dq_f)):.3e} "
              f"pad-zero={bool((np.asarray(qf)[:, I:] == 0).all())}",
              file=sys.stderr)
