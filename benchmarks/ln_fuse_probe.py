"""A/B the round-5 ln-in-kernel fused vision MLP entry vs the round-5
quantize-outside entry on real TPU at the production block shape.

Old: XLA rmsnorm -> quantize_act -> dual_gemm_silu_quant (kernel)
New: ln_dual_gemm_silu_quant (rmsnorm + quantize inside the kernel)

Prints per-call times and max-abs diff of the dequantized outputs.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.ops import fused_vision_mlp as FM
from quickvideo_tpu.ops import quantization as qz

MODEL = os.environ.get("LF_MODEL", "qwen25-vl-7b")
S = int(os.environ.get("LF_S", 16 * 22 * 40))  # strict demo group tokens
REPS = int(os.environ.get("LF_REPS", 20))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    cfg = get_config(MODEL).vision
    c, i = cfg.hidden_size, cfg.intermediate_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, c)) * 0.1, jnp.bfloat16)
    ln = jnp.asarray(1.0 + rng.standard_normal(c) * 0.02, jnp.bfloat16)
    bp = {
        "wg": qz.quantize_weight(
            jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32)),
        "wu": qz.quantize_weight(
            jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32)),
        "wd": qz.quantize_weight(
            jnp.asarray(rng.standard_normal((i, c)) * 0.05, jnp.float32)),
        "bg": jnp.asarray(rng.standard_normal(i) * 0.05, jnp.bfloat16),
        "bu": jnp.asarray(rng.standard_normal(i) * 0.05, jnp.bfloat16),
        "bd": jnp.asarray(rng.standard_normal(c) * 0.05, jnp.bfloat16),
        "ln2": ln,
    }
    stacked = {"blocks": jax.tree.map(lambda a: a[None], bp)}
    bf = jax.tree.map(
        lambda a: a[0], FM.fuse_vision_mlp_weights(stacked, cfg)["blocks"]
    )
    eps = cfg.rms_norm_eps

    @jax.jit
    def old(x):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * ln
        xq, xs = qz.quantize_act(h)
        q, s = FM.dual_gemm_silu_quant(xq, xs, bf["wgu_p"], bf["bgu_p"])
        return q, s

    @jax.jit
    def new(x):
        return FM.ln_dual_gemm_silu_quant(
            x, ln, bf["wgu_p"], bf["bgu_p"], eps=eps)

    qo, so = old(x)
    qn, sn = new(x)
    do = np.asarray(qo, np.float32) * np.asarray(so)
    dn = np.asarray(qn, np.float32) * np.asarray(sn)
    print(f"max |old-new| dequant: {np.abs(do - dn).max():.6f} "
          f"(scale ~{float(np.asarray(so).max()):.6f})")

    # tower mode: 32 sequential block-MLPs inside ONE jit — amortizes the
    # dispatch/transport edge that dominates single-call timings over this
    # tunnel; this is the decision metric (same discipline as the dual-GEMM
    # fusion's 135.4-vs-143.0 ms/group tower A/B).
    n_blocks = int(os.environ.get("LF_BLOCKS", 32))

    def _tower(step):
        @jax.jit
        def f(x):
            def body(h, _):
                q, s = step(h)
                y = qz.qdot_pre(q, s, bf["wd_p"]).astype(h.dtype) + bp["bd"]
                return h + y, ()
            out, _ = jax.lax.scan(body, x, None, length=n_blocks)
            return out
        return f

    def step_old(h):
        hf = h.astype(jnp.float32)
        var = jnp.mean(hf * hf, axis=-1, keepdims=True)
        hn = (hf * jax.lax.rsqrt(var + eps)).astype(h.dtype) * ln
        xq, xs = qz.quantize_act(hn)
        return FM.dual_gemm_silu_quant(xq, xs, bf["wgu_p"], bf["bgu_p"])

    def step_new(h):
        return FM.ln_dual_gemm_silu_quant(
            h, ln, bf["wgu_p"], bf["bgu_p"], eps=eps)

    arms = (("old(ln+quant outside)", _tower(step_old)),
            ("new(ln in-kernel)", _tower(step_new)))
    for _, f in arms:
        jax.block_until_ready(f(x))  # compile
    results = {name: [] for name, _ in arms}
    for _ in range(REPS):
        for name, f in arms:  # interleaved A/B
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            results[name].append(time.perf_counter() - t0)
    for name, _ in arms:
        ts = sorted(results[name])
        print(f"{name}: tower({n_blocks}) median {ts[len(ts)//2]*1e3:.3f} ms"
              f"  min {ts[0]*1e3:.3f} ms  (S={S}, C={c}, I={i})")


if __name__ == "__main__":
    main()
