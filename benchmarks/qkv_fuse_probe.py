"""A/B the fused ln+act-quant QKV projection kernel vs the production
weight-only chain at the strict 7B vision block shape.

Old (production): XLA rmsnorm -> qdot weight-only (w dequant to bf16, bf16
GEMM) -> bias.
New (candidate):  ln_gemm_bias (rmsnorm + per-row int8 quantize + int8
GEMM + rescale + bias, one Pallas pass).

Decision metric = 32-block tower in ONE jit, interleaved A/B (dispatch
edges amortized). Also reports output max-abs diff: the candidate
act-quantizes the activation, so diffs are real quantization noise —
accuracy gating happens in tests/test_quantization_accuracy.py, this
number is just a sanity scale.
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

MODEL = os.environ.get("QF_MODEL", "qwen25-vl-7b")
S = int(os.environ.get("QF_S", 16 * 22 * 40))
REPS = int(os.environ.get("QF_REPS", 20))
N_BLOCKS = int(os.environ.get("QF_BLOCKS", 32))
BM = int(os.environ.get("QF_BM", 128))


def main():
    cfg = get_config(MODEL).vision
    c = cfg.hidden_size
    nh, hd = cfg.num_heads, cfg.head_dim
    dp = -(-hd // 128) * 128
    n = 3 * nh * dp  # padded-head QKV columns (the production 2D layout)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, c)) * 0.1, jnp.bfloat16)
    ln = jnp.asarray(1.0 + rng.standard_normal(c) * 0.02, jnp.bfloat16)
    w = qz.quantize_weight(
        jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32))
    b = jnp.asarray(rng.standard_normal(n) * 0.05, jnp.bfloat16)
    eps = cfg.rms_norm_eps

    def step_old(h):
        hn_f = h.astype(jnp.float32)
        var = jnp.mean(hn_f * hn_f, axis=-1, keepdims=True)
        hn = (hn_f * jax.lax.rsqrt(var + eps)).astype(h.dtype) * ln
        y = qz.qdot(hn, w, act_quant=False).astype(h.dtype) + b
        return y

    def step_new(h):
        return FM.ln_gemm_bias(h, ln, w, b, eps=eps, bm=BM)

    qo = step_old(x)
    qn = step_new(x)
    d = np.abs(np.asarray(qo, np.float32) - np.asarray(qn, np.float32))
    print(f"max |old-new|: {d.max():.5f}  mean {d.mean():.6f}  "
          f"(out rms ~{float(jnp.sqrt(jnp.mean(qo.astype(jnp.float32)**2))):.4f})")

    def _tower(step):
        @jax.jit
        def f(x):
            def body(h, _):
                y = step(h)
                # fold (S, N) back to (S, C) so the tower chains; the slice
                # keeps the GEMM alive (XLA cannot split a dot's N axis)
                return h + y[:, :c], ()
            out, _ = jax.lax.scan(body, x, None, length=N_BLOCKS)
            return out
        return f

    arms = (("old(ln + weight-only bf16 qdot)", _tower(step_old)),
            ("new(ln_gemm_bias int8)", _tower(step_new)))
    for _, f in arms:
        jax.block_until_ready(f(x))
    results = {name: [] for name, _ in arms}
    for _ in range(REPS):
        for name, f in arms:
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            results[name].append(time.perf_counter() - t0)
    for name, _ in arms:
        ts = sorted(results[name])
        print(f"{name}: tower({N_BLOCKS}) median {ts[len(ts)//2]*1e3:.3f} ms"
              f"  min {ts[0]*1e3:.3f} ms  (S={S}, C={c}, N={n}, bm={BM})")


if __name__ == "__main__":
    main()
