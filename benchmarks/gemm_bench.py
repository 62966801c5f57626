"""GEMM throughput at the 7B prefill shapes — locates the int8 matmul gap.

The strict-mode group prefill is matmul-dominated (strict_profile.py:
484 ms/group where dense-matmul ideal is ~120 ms at int8 peak). This bench
measures each 7B projection shape under:
  bf16            plain bf16 x bf16
  w8              int8 weights, bf16 activations (qdot act_quant=False)
  w8a8            int8 x int8 with per-call dynamic act quantize (qdot)
  w8a8-pre        int8 x int8 with the activation PRE-quantized (isolates
                  the quantize-epilogue cost from the MXU matmul itself)
v5e peaks: bf16 ~197 TF/s, int8 ~394 TF/s.

Method: R reps run INSIDE one jitted program as a lax.scan whose carry
perturbs the next rep's input (serial dependency defeats CSE; the
perturbation is one fused elementwise add) — the in-program loop is also
the real context (prefill runs 28 layers per dispatch). A single-R
measurement still carries ~25 ms of fixed per-program cost (dispatch +
tunnel fetch; measured via an R-sweep probe: 6.8 ms/rep at R=4 ->
0.89 ms/rep at R=64 on the same GEMM), so each variant is timed at TWO
rep counts and the per-rep time is the slope (t_hi - t_lo)/(R_hi - R_lo),
which cancels the fixed cost exactly.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=3520)
    ap.add_argument("--reps-lo", type=int, default=8)
    ap.add_argument("--reps-hi", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quickvideo_tpu.ops import quantization as qz
    from quickvideo_tpu.prefill.engine import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    M = args.m
    # 7B text shapes: hidden 3584, kv 512, mlp 18944; vision: 1280/3456
    SHAPES = [
        ("wq 3584x3584", 3584, 3584),
        ("wk 3584x512", 3584, 512),
        ("qkv-fused 3584x4608", 3584, 4608),
        ("wg 3584x18944", 3584, 18944),
        ("gu-fused 3584x37888", 3584, 37888),
        ("wd 18944x3584", 18944, 3584),
        ("vis-qkv 1280x3840", 1280, 3840),
        ("vis-gu 1280x6912", 1280, 6912),
    ]

    rng = np.random.default_rng(0)
    probe = jnp.zeros((8,), jnp.float32)
    np.asarray(probe)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"fetch RTT {rtt*1e3:.2f} ms", file=sys.stderr)

    results = []
    R_LO, R_HI = args.reps_lo, args.reps_hi

    def timed(name, body, x, *a):
        # R serial reps in ONE program: carry row (1, K) from the previous
        # output perturbs x (fused add — defeats CSE, negligible cost).
        # Two rep counts; slope cancels the fixed per-program cost.
        def make(R):
            def prog(x, *a):
                def step(carry, _):
                    xi = x + carry
                    y = body(xi, *a)
                    row = y.ravel()[: x.shape[1]].astype(jnp.float32)
                    if x.dtype == jnp.int8:
                        # int8 carry: +/-1 values (a *1e-6 float carry would
                        # round to 0 and the loop-invariant dot gets hoisted)
                        nxt = (row.astype(jnp.int32) % 3 - 1).astype(jnp.int8)
                    else:
                        nxt = (row * 1e-6).astype(x.dtype)
                    return nxt.reshape(1, x.shape[1]), y[0, 0]
                _, ys = jax.lax.scan(
                    step, jnp.zeros((1, x.shape[1]), x.dtype), None, length=R
                )
                return ys
            return jax.jit(prog)

        f_lo, f_hi = make(R_LO), make(R_HI)

        def run(f):
            np.asarray(f(x, *a))  # warm (compile + materialize)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(f(x, *a))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = run(f_lo), run(f_hi)
        return (t_hi - t_lo) / (R_HI - R_LO)

    for name, K, N in SHAPES:
        flops = 2 * M * K * N
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
        qw = jax.jit(qz.quantize_weight)(w)
        qw = jax.tree.map(lambda a: a.block_until_ready(), qw)

        row = {"shape": name, "m": M, "k": K, "n": N}

        f_bf16 = jax.jit(
            lambda x, w: jnp.dot(
                x, w, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        )
        dt = timed(name, f_bf16, x, w)
        row["bf16_tfs"] = round(flops / dt / 1e12, 1)

        f_w8 = jax.jit(
            lambda x, qw: qz.qdot(x, qw, act_quant=False).astype(jnp.bfloat16)
        )
        dt = timed(name, f_w8, x, qw)
        row["w8_tfs"] = round(flops / dt / 1e12, 1)

        f_w8a8 = jax.jit(
            lambda x, qw: qz.qdot(x, qw, act_quant=True).astype(jnp.bfloat16)
        )
        dt = timed(name, f_w8a8, x, qw)
        row["w8a8_tfs"] = round(flops / dt / 1e12, 1)

        # pre-quantized activation: the bare int8 x int8 MXU dot + rescale
        xf = x.astype(jnp.float32)
        xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        xq.block_until_ready(), xs.block_until_ready()

        def f_pre(xq, xs, qw):
            y = jax.lax.dot_general(
                xq, qw["q8"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * xs * qw["sc"]).astype(jnp.bfloat16)

        dt = timed(name, jax.jit(f_pre), xq, xs, qw)
        row["w8a8_pre_tfs"] = round(flops / dt / 1e12, 1)

        print(row, file=sys.stderr, flush=True)
        results.append(row)

    print(json.dumps({"metric": "gemm throughput 7B shapes", "m": M,
                      "fetch_rtt_ms": round(rtt * 1e3, 2),
                      "results": results}))


if __name__ == "__main__":
    main()
