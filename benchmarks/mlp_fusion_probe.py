"""Does the int8-act MLP chain pay avoidable HBM traffic between the GEMMs?

The language-block MLP at the strict 7B group shape (q=2704, h=3584,
i=18944) runs gate/up int8xint8 dots -> rescale -> bias -> silu*mul ->
act-quantize -> down dot. If XLA materializes the dot outputs at s32/f32
width before the elementwise fusion, each layer moves ~400 MB of avoidable
intermediate bytes (2 x q x i x 4B write + read), ~0.5 ms/layer at v5e HBM
bandwidth. This probe measures:

  A. the production chain (ops/quantization.qdot_multi + qdot, as the
     model calls it)
  B. the same chain with the dots asked for bf16 outputs
     (preferred_element_type=bfloat16: halves any materialized
     intermediate; int32 accumulate still happens in the MXU, the convert
     rides the dot epilogue) — plus max-abs error vs A
  C. dots-only floor (no rescale/silu/quantize glue)

Run on the real TPU: python benchmarks/mlp_fusion_probe.py
Shapes via env: MP_Q (2704), MP_H (3584), MP_I (18944), MP_REPS (8).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from quickvideo_tpu.ops import quantization as qz

Q = int(os.environ.get("MP_Q", 2704))
H = int(os.environ.get("MP_H", 3584))
I = int(os.environ.get("MP_I", 18944))
REPS = int(os.environ.get("MP_REPS", 8))


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
    print(f"{name:52s} {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)
    return dt, out


def main():
    print(f"devices: {jax.devices()}  q={Q} h={H} i={I}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((Q, H)) * 0.05, jnp.bfloat16)
    wg = qz.quantize_weight(jnp.asarray(rng.standard_normal((H, I)) * 0.02,
                                        jnp.float32))
    wu = qz.quantize_weight(jnp.asarray(rng.standard_normal((H, I)) * 0.02,
                                        jnp.float32))
    wd = qz.quantize_weight(jnp.asarray(rng.standard_normal((I, H)) * 0.02,
                                        jnp.float32))
    bg = jnp.zeros((I,), jnp.float32)
    bu = jnp.zeros((I,), jnp.float32)
    bd = jnp.zeros((H,), jnp.float32)

    @jax.jit
    def chain_prod(x):
        g, u = qz.qdot_multi(x, (wg, wu), act_quant=True)
        g = g.astype(x.dtype) + bg.astype(x.dtype)
        u = u.astype(x.dtype) + bu.astype(x.dtype)
        mlp = jax.nn.silu(g) * u
        y = qz.qdot(mlp, wd, act_quant=True).astype(x.dtype)
        return x + y + bd.astype(x.dtype)

    @jax.jit
    def chain_bf16out(x):
        # identical math, but the s8xs8 dots emit bf16 (epilogue convert)
        xq, xs = qz.quantize_act(x)

        def dot_bf16(w):
            y = jax.lax.dot_general(
                xq, w["q8"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            # per-token x per-channel rescale in bf16 (xs, sc are f32;
            # the product is small so bf16 is safe for the *traffic* probe;
            # accuracy delta reported below)
            return y * (xs * w["sc"]).astype(jnp.bfloat16)

        g = dot_bf16(wg) + bg.astype(jnp.bfloat16)
        u = dot_bf16(wu) + bu.astype(jnp.bfloat16)
        mlp = jax.nn.silu(g) * u
        mq, ms = qz.quantize_act(mlp)
        y = jax.lax.dot_general(
            mq, wd["q8"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        ) * (ms * wd["sc"]).astype(jnp.bfloat16)
        return x + y + bd.astype(jnp.bfloat16)

    @jax.jit
    def dots_floor(x):
        xq, xs = qz.quantize_act(x)
        g = jax.lax.dot_general(xq, wg["q8"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        u = jax.lax.dot_general(xq, wu["q8"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # fold both to a tiny carrier so the dots stay live but no full
        # intermediate needs to leave the chip in bf16 for a next GEMM
        m = (g + u).astype(jnp.bfloat16)
        mq, ms = qz.quantize_act(m)
        y = jax.lax.dot_general(mq, wd["q8"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.sum()

    ta, out_a = timeit("A production qdot chain", chain_prod, x)
    tb, out_b = timeit("B bf16-epilogue dots", chain_bf16out, x)
    tc, _ = timeit("C dots floor (s32, glue-free-ish)", dots_floor, x)
    err = float(jnp.max(jnp.abs(out_a.astype(jnp.float32)
                                - out_b.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(out_a.astype(jnp.float32))))
    print(f"B vs A max abs err {err:.4f} (max |A| {ref:.2f})",
          file=sys.stderr)
    import json

    print(json.dumps({
        "q": Q, "h": H, "i": I,
        "A_prod_ms": round(ta * 1e3, 2),
        "B_bf16_ms": round(tb * 1e3, 2),
        "C_floor_ms": round(tc * 1e3, 2),
        "B_vs_A_max_err": err,
    }))


if __name__ == "__main__":
    main()
