"""Is the vision tower's ~1 ms/block elementwise glue recoverable by fusion?

Round-4 attribution (BENCH_RESULTS.md "vision ablation"): at the strict 7B
group shape the tower spends ~33.7 ms/group in elementwise glue — residuals,
biases, silu, act-quantize VPU passes XLA fuses into ~2 HBM passes per
producer but cannot fuse ACROSS the dots. This probe measures, per candidate,
the XLA chain vs a fused Pallas kernel vs the roofline, so the decision to
build a production kernel is data, not hope (same discipline as
mlp_fusion_probe.py, which killed the language-MLP fusion idea).

Arms (strict 7B vision shape S=T*H*W patches, C=1280, I=3456, a8 MLP):

  1. mlp_prod        production _vision_mlp chain (ln2 + a8 gate/up + glue
                     + a8 down + residual), per block
  2. mlp_dots_floor  the three int8 dots with no rescale/bias/silu/quantize
                     glue (difference 1-2 = total MLP glue per block)
  3. lnq_chain       XLA: rmsnorm -> quantize_act at (S, C)
  4. lnq_pallas      the same fused in ONE Pallas pass (reads x once, writes
                     q8 + row scales)  [candidate: replaces ln2+quantize]
  5. epi_chain       XLA: from materialized s32 gate/up dot outputs:
                     rescale -> +bias -> silu*mul -> quantize_act at (S, I)
  6. epi_pallas      the same fused in ONE Pallas pass
                     [candidate: post-dual-dot epilogue]
  7. gemm_xla / gemm_pallas  plain int8 (S,C)x(C,I) GEMM parity check —
                     gates the high-risk dual-GEMM+epilogue idea: if Pallas
                     cannot match XLA's int8 GEMM here, fusing the epilogue
                     into a Pallas GEMM loses more than the glue saves.

Run on the real TPU:  python benchmarks/vision_glue_probe.py
Shapes via env: VG_T/VG_H/VG_W (16/22/40), VG_REPS (8).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import vision as V
from quickvideo_tpu.ops import quantization as qz

T = int(os.environ.get("VG_T", 16))
GH = int(os.environ.get("VG_H", 22))
GW = int(os.environ.get("VG_W", 40))
REPS = int(os.environ.get("VG_REPS", 8))
EPS = 1e-6


def _rtt():
    probe = jax.jit(lambda x: x + 1.0)
    base = jnp.zeros((8,), jnp.float32)
    np.asarray(probe(base))
    outs = []
    for _ in range(5):
        fresh = probe(base)
        fresh.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(fresh)
        outs.append(time.perf_counter() - t0)
    return min(outs)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # warm + materialize
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0 - rtt) / REPS
    print(f"{name:44s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
    return dt, out


# ---------------------------------------------------------------------------
# Pallas candidates
# ---------------------------------------------------------------------------


def _lnq_kernel(x_ref, w_ref, q_ref, s_ref):
    """rmsnorm (production bf16 rounding order) + per-row int8 quantize."""
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = (xf * jax.lax.rsqrt(var + EPS)).astype(x_ref.dtype) * w_ref[:]
    hf = h.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-30)
    s = s / 127.0
    q_ref[:] = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("rows",))
def lnq_pallas(x, w, rows=512):
    S, C = x.shape
    grid = (S // rows,)
    return pl.pallas_call(
        _lnq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, C), jnp.int8),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
    )(x, w)


def _epi_kernel(g_ref, u_ref, gsc_ref, usc_ref, xs_ref, bg_ref, bu_ref,
                q_ref, s_ref):
    """Post-dual-dot epilogue: rescale s32 gate/up, +bias (production bf16
    rounding), silu*mul, per-row int8 quantize."""
    xs = xs_ref[:]
    g = (g_ref[:].astype(jnp.float32) * xs * gsc_ref[:]).astype(
        jnp.bfloat16
    ) + bg_ref[:]
    u = (u_ref[:].astype(jnp.float32) * xs * usc_ref[:]).astype(
        jnp.bfloat16
    ) + bu_ref[:]
    m = (jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * u).astype(
        jnp.float32
    )
    s = jnp.maximum(jnp.max(jnp.abs(m), axis=-1, keepdims=True), 1e-30)
    s = s / 127.0
    q_ref[:] = jnp.clip(jnp.round(m / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@functools.partial(jax.jit, static_argnames=("rows",))
def epi_pallas(g, u, gsc, usc, xs, bg, bu, rows=128):
    S, I = g.shape
    grid = (S // rows,)
    row_spec = pl.BlockSpec((rows, I), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((I,), lambda i: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _epi_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec,
                  pl.BlockSpec((rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec_spec, vec_spec],
        out_specs=[row_spec,
                   pl.BlockSpec((rows, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((S, I), jnp.int8),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
    )(g, u, gsc, usc, xs, bg, bu)


def _gemm_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_steps):
    """Plain int8 x int8 tiled GEMM parity check (M,K)x(K,N) -> s32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def gemm_pallas(xq, wq, bm=512, bn=1152, bk=1280):
    M, K = xq.shape
    K2, N = wq.shape
    k_steps = K // bk
    return pl.pallas_call(
        functools.partial(_gemm_kernel, k_steps=k_steps),
        grid=(M // bm, N // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )(xq, wq)


# ---------------------------------------------------------------------------


def main():
    cfg = get_config(os.environ.get("VG_MODEL", "qwen25-vl-7b"))
    vc = cfg.vision
    S = T * GH * GW
    # pad S to the probe tiles (the engine's grids are multiples of 512 at
    # group scale anyway; the probe only cares about bytes/FLOPs per row)
    S = -(-S // 512) * 512
    C, I = vc.hidden_size, vc.intermediate_size
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  S={S} C={C} I={I}", file=sys.stderr)

    x = jnp.asarray(rng.standard_normal((S, C)) * 0.05, jnp.bfloat16)
    ln2 = jnp.asarray(1.0 + rng.standard_normal(C) * 0.01, jnp.bfloat16)
    wg = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((C, I)) * 0.02, jnp.float32))
    wu = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((C, I)) * 0.02, jnp.float32))
    wd = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((I, C)) * 0.02, jnp.float32))
    bg = jnp.asarray(rng.standard_normal(I) * 0.01, jnp.bfloat16)
    bu = jnp.asarray(rng.standard_normal(I) * 0.01, jnp.bfloat16)
    bd = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.bfloat16)
    bp = {"ln2": ln2, "wg": wg, "wu": wu, "wd": wd,
          "bg": bg, "bu": bu, "bd": bd}
    res = {}

    # -- 1. production MLP chain -------------------------------------------
    @jax.jit
    def mlp_prod(bp, x):
        return V._vision_mlp(bp, x, vc)

    res["mlp_prod_ms"], _ = timeit("1 mlp_prod (production chain)",
                                   mlp_prod, bp, x)

    # -- 2. dots floor -------------------------------------------------------
    mq8 = jnp.asarray(
        rng.integers(-127, 127, (S, I)), jnp.int8)  # pre-quantized stand-in

    @jax.jit
    def mlp_dots_floor(x, mq8):
        xq, _ = qz.quantize_act(x)
        g = jax.lax.dot_general(xq, wg["q8"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        u = jax.lax.dot_general(xq, wu["q8"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = jax.lax.dot_general(mq8, wd["q8"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # keep all three live with a cheap carrier
        return y + g[:, :C] + u[:, :C]

    res["mlp_dots_floor_ms"], _ = timeit("2 mlp_dots_floor", mlp_dots_floor,
                                         x, mq8)

    # -- 3/4. ln2 + quantize: XLA chain vs fused Pallas ---------------------
    @jax.jit
    def lnq_chain(x, w):
        h = V._rms_norm(x, w, vc.rms_norm_eps)
        return qz.quantize_act(h)

    res["lnq_chain_ms"], out_c = timeit("3 lnq_chain (XLA)", lnq_chain,
                                        x, ln2)
    res["lnq_pallas_ms"], out_p = timeit("4 lnq_pallas (fused)", lnq_pallas,
                                         x, ln2)
    dq_c = out_c[0].astype(np.float32) * np.asarray(out_c[1])
    dq_p = np.asarray(out_p[0], np.float32) * np.asarray(out_p[1])
    res["lnq_max_err"] = float(np.max(np.abs(dq_c - dq_p)))

    # -- 5/6. post-dual-dot epilogue: XLA chain vs fused Pallas --------------
    g_raw = jnp.asarray(rng.integers(-60000, 60000, (S, I)), jnp.int32)
    u_raw = jnp.asarray(rng.integers(-60000, 60000, (S, I)), jnp.int32)
    xs = jnp.asarray(np.abs(rng.standard_normal((S, 1))) * 1e-3 + 1e-4,
                     jnp.float32)

    @jax.jit
    def epi_chain(g_raw, u_raw, xs):
        g = (g_raw.astype(jnp.float32) * xs * wg["sc"]).astype(
            jnp.bfloat16) + bg
        u = (u_raw.astype(jnp.float32) * xs * wu["sc"]).astype(
            jnp.bfloat16) + bu
        m = jax.nn.silu(g) * u
        return qz.quantize_act(m)

    res["epi_chain_ms"], out_c = timeit("5 epi_chain (XLA)", epi_chain,
                                        g_raw, u_raw, xs)
    res["epi_pallas_ms"], out_p = timeit(
        "6 epi_pallas (fused)", epi_pallas,
        g_raw, u_raw, wg["sc"], wu["sc"], xs, bg, bu)
    dq_c = out_c[0].astype(np.float32) * np.asarray(out_c[1])
    dq_p = np.asarray(out_p[0], np.float32) * np.asarray(out_p[1])
    res["epi_max_err"] = float(np.max(np.abs(dq_c - dq_p)))

    # -- 7. int8 GEMM parity: XLA vs Pallas ----------------------------------
    xq = jnp.asarray(rng.integers(-127, 127, (S, C)), jnp.int8)

    @jax.jit
    def gemm_xla(xq):
        return jax.lax.dot_general(xq, wg["q8"], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    res["gemm_xla_ms"], out_x = timeit("7a gemm_xla int8", gemm_xla, xq)
    res["gemm_pallas_ms"], out_g = timeit("7b gemm_pallas int8", gemm_pallas,
                                          xq, wg["q8"])
    res["gemm_equal"] = bool(
        np.array_equal(np.asarray(out_x), np.asarray(out_g)))

    # -- extrapolation --------------------------------------------------------
    blocks, groups = vc.depth, 32
    lnq_save = res["lnq_chain_ms"] - res["lnq_pallas_ms"]
    epi_save = res["epi_chain_ms"] - res["epi_pallas_ms"]
    # per block: ONE ln2+quantize candidate site and ONE epilogue site
    res["e2e_save_s_lnq"] = round(lnq_save * blocks * groups / 1e3, 3)
    res["e2e_save_s_epi"] = round(epi_save * blocks * groups / 1e3, 3)
    res["mlp_glue_ms_per_block"] = round(
        res["mlp_prod_ms"] * 1e3 - res["mlp_dots_floor_ms"] * 1e3, 3)
    print(json.dumps({k: (round(v * 1e3, 3) if k.endswith("_ms") else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
