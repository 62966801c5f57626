"""Can a Pallas int8 GEMM match XLA's MXU efficiency at the vision-MLP
shape? Gates the dual-GEMM+epilogue fusion (vision_glue_probe arm 7's
follow-up): the fusion saves ~0.5 ms/block of s32 gate/up materialization
ONLY if the Pallas GEMM itself runs at XLA's in-context rate (~0.32 ms for
(14336,1280)x(1280,3456) int8 = MXU peak).

N is padded 3420 -> 3456 (27 lane tiles) — the production fusion would pad
the weight columns once at load (zeros; exact numerics), same trick as
vision.add_padded_block_weights.

Run: python benchmarks/gemm_pallas_sweep.py
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

M = int(os.environ.get("GS_M", 14336))
K = int(os.environ.get("GS_K", 1280))
N = int(os.environ.get("GS_N", 3456))
REPS = int(os.environ.get("GS_REPS", 20))


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
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0 - rtt) / REPS
    print(f"{name:40s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
    return dt, out


def make_gemm(bm, bn, bk, out_dtype=jnp.int32):
    k_steps = K // bk

    def kernel(x_ref, w_ref, o_ref, acc_ref):
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
            o_ref[:] = acc_ref[:].astype(out_dtype)

    @jax.jit
    def gemm(xq, wq):
        return pl.pallas_call(
            kernel,
            grid=(M // bm, N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=M * K + K * N + M * N * 4,
                transcendentals=0,
            ),
        )(xq, wq)

    return gemm


def main():
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    print(f"devices: {jax.devices()} M={M} K={K} N={N} "
          f"floor={2*M*N*K/394e12*1e3:.3f} ms (394 TOPS)", file=sys.stderr)

    @jax.jit
    def gemm_xla(xq, wq):
        return jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    res = {}
    t, want = timeit("xla int8 s32", gemm_xla, xq, wq)
    res["xla_ms"] = round(t * 1e3, 3)

    configs = [
        (512, 1152, 1280), (512, 1728, 1280), (1024, 1152, 1280),
        (2048, 1152, 1280), (512, 3456, 1280), (1024, 3456, 1280),
        (256, 3456, 1280), (2048, 3456, 1280), (512, 1152, 640),
        (1024, 1728, 1280),
    ]
    want_np = np.asarray(want)
    for bm, bn, bk in configs:
        if M % bm or N % bn or K % bk:
            continue
        try:
            t, got = timeit(f"pallas bm={bm} bn={bn} bk={bk}",
                            make_gemm(bm, bn, bk), xq, wq)
        except Exception as e:  # noqa: BLE001
            print(f"  bm={bm} bn={bn} bk={bk} failed: {e}",
                  file=sys.stderr)
            continue
        ok = np.array_equal(np.asarray(got), want_np)
        res[f"pallas_{bm}_{bn}_{bk}_ms"] = round(t * 1e3, 3)
        if not ok:
            res[f"pallas_{bm}_{bn}_{bk}_WRONG"] = True
    print(json.dumps(res))


if __name__ == "__main__":
    main()
