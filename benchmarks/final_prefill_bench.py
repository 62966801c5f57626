"""Isolate the final-prefill hot path at bench shapes (3B, q=64 bucket,
capacity 65536, valid ~36920): flash unified kernel vs XLA blockwise vs the
full 36-layer prefill_step. All jits take params/buffers as ARGUMENTS
(closure-captured operands re-upload as constants over the tunnel and
invalidate the measurement — see BENCH_RESULTS.md)."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from quickvideo_tpu.ops.flash_attention import flash_past_attention
from quickvideo_tpu.ops.attention import _blockwise_partial_attention

HKV, HQ, D = 2, 16, 128
CAP = int(os.environ.get("FP_CAP", 65536))
Q = int(os.environ.get("FP_Q", 64))
VALID = int(os.environ.get("FP_VALID", 36920))


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args, reps=3):
    fn(*args)  # warm/compile
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.1f} ms  (reps {['%.0f' % (t*1e3) for t in ts]})")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((HQ, Q, D)), jnp.bfloat16)
    kbuf = jnp.asarray(rng.standard_normal((HKV, CAP, D)), jnp.bfloat16)
    vbuf = jnp.asarray(rng.standard_normal((HKV, CAP, D)), jnp.bfloat16)
    length = jnp.int32(VALID)
    scale = D ** -0.5
    print(f"devices={jax.devices()} cap={CAP} q={Q} valid={VALID}")

    flash = jax.jit(
        lambda q, k, v, l: flash_past_attention(
            q, k, v, l, scale=scale, causal=True
        ).out
    )
    timeit("flash unified (causal, cap grid)", flash, q, kbuf, vbuf, length)

    flash_nc = jax.jit(
        lambda q, k, v, l: flash_past_attention(
            q, k, v, l, scale=scale, causal=False
        ).out
    )
    timeit("flash past-only (non-causal)", flash_nc, q, kbuf, vbuf, length)

    blockwise = jax.jit(
        lambda q, k, v, l: _blockwise_partial_attention(
            q, k, v, l, scale
        ).out
    )
    timeit("xla blockwise dynamic-trip", blockwise, q, kbuf, vbuf, length)

    # single decode-shaped row for reference
    q1 = q[:, :1]
    timeit("flash q=1 (decode shape)", flash_nc, q1, kbuf, vbuf, length)

    if os.environ.get("FP_FULL"):
        full_stack()


def full_stack():
    """Full 36-layer prefill_step at the final-prefill bucket shape and at
    the group shape, with real 3B params passed as args."""
    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel
    from quickvideo_tpu.models.qwen25_vl.language import StepSpec, prefill_step
    from quickvideo_tpu.ops import kv_cache as kvc

    cfg = get_config("qwen25-vl-3b")
    t = cfg.text
    params = qmodel.init_params_fast(cfg, dtype=jnp.bfloat16)["language"]
    params = jax.device_put(params)
    sync(params)
    print("params uploaded")
    cache = kvc.init_cache(
        t.num_hidden_layers, t.num_key_value_heads, CAP, t.head_dim,
        dtype=jnp.bfloat16,
    )
    cache = cache.replace(length=jnp.full_like(cache.length, VALID))
    rng = jax.random.key(0)

    def run(qlen, keep, name):
        x = jnp.ones((qlen, t.hidden_size), jnp.bfloat16)
        cos = jnp.ones((qlen, t.head_dim), jnp.float32)
        sin = jnp.zeros((qlen, t.head_dim), jnp.float32)
        spec = StepSpec(cfg=t, q_len=qlen, keep_k=keep)
        fn = jax.jit(
            lambda p, c, x, co, si, r: prefill_step(
                p, c, x, co, si, r, spec=spec
            )[1],
            static_argnames=(),
        )
        timeit(name, fn, params, cache, x, cos, sin, rng)

    run(64, 0, "prefill_step q=64 keep=0 (final bucket)")
    run(2048, 1024, "prefill_step q=2048 keep=1024 (group)")


if __name__ == "__main__":
    main()
