"""Block-size sweep for the unified flash kernel at the group-prefill shape
(3B: Hq=16, Hkv=2, q=2048, capacity 65536, valid ~36920). Ideal time at
v5e bf16 peak (~197 TFLOP/s): ~3.2 ms. Kernel is scanned REPS times inside
one jit so the ~30 ms tunnel dispatch RTT amortizes away."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.ops.flash_attention import flash_past_attention

HKV, HQ, D = 2, 16, 128
CAP = int(os.environ.get("FB_CAP", 65536))
Q = int(os.environ.get("FB_Q", 2048))
VALID = int(os.environ.get("FB_VALID", 36920))
REPS = 8


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((HQ, Q, D)), jnp.bfloat16)
    kbuf = jnp.asarray(rng.standard_normal((HKV, CAP, D)), jnp.bfloat16)
    vbuf = jnp.asarray(rng.standard_normal((HKV, CAP, D)), jnp.bfloat16)
    length = jnp.int32(VALID)
    scale = D ** -0.5
    flops = HQ * Q * (VALID + Q // 2) * D * 4
    ideal_ms = flops / 197e12 * 1e3
    print(f"q={Q} valid={VALID} ideal={ideal_ms:.2f} ms x{REPS}")

    def bench(bq, bk):
        def body(carry, _):
            # vary q by the carry so XLA can't CSE the reps
            out = flash_past_attention(
                q + carry, kbuf, vbuf, length, scale=scale, causal=True,
                block_q=bq, block_k=bk,
            ).out
            return out[0, 0, 0].astype(jnp.bfloat16), None

        fn = jax.jit(
            lambda: jax.lax.scan(body, jnp.bfloat16(0), None, length=REPS)[0]
        )
        sync(fn())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        per = min(ts) / REPS * 1e3
        print(f"bq={bq:5d} bk={bk:5d}  {per:8.2f} ms/call  "
              f"MFU~{ideal_ms/per*100:4.1f}%")

    import ast
    combos = ast.literal_eval(os.environ.get(
        "FB_COMBOS",
        "[(256,512),(128,512),(256,256),(512,512),(256,1024),(128,1024)]",
    ))
    for bq, bk in combos:
        try:
            bench(bq, bk)
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}  FAIL {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
