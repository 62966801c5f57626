"""Block-size sweep for the unified flash kernel at the group-prefill shape.

Shapes via env (defaults = 7B strict-resize group: Hq=28, Hkv=4, q=3520,
capacity 65536, valid 16384, active_cap 32768 — the mid-run occupancy
bucket the e2e bench spends most groups in). FB_STACKED=1 benches the
stacked-cache mode the engine actually uses (operands are the full
(L, Hkv, cap, D) stack addressed via layer_idx scalar prefetch).

Ideal time at v5e bf16 peak (~197 TFLOP/s) is printed for MFU context.
The kernel is scanned REPS times inside one jit; per-rep time is the slope
between two rep counts, which cancels the fixed per-program cost
(~25-30 ms dispatch + tunnel fetch) exactly.
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

from quickvideo_tpu.ops.flash_attention import flash_past_attention

HKV = int(os.environ.get("FB_HKV", 4))
HQ = int(os.environ.get("FB_HQ", 28))
D = 128
CAP = int(os.environ.get("FB_CAP", 65536))
Q = int(os.environ.get("FB_Q", 3520))
VALID = int(os.environ.get("FB_VALID", 16384))
ACAP = int(os.environ.get("FB_ACAP", 32768))
STACKED = os.environ.get("FB_STACKED", "1") == "1"
LAYERS = int(os.environ.get("FB_LAYERS", 28))
KV_DTYPE = os.environ.get("FB_KV_DTYPE", "bf16")  # bf16 | int8
R_LO = int(os.environ.get("FB_RLO", 4))
R_HI = int(os.environ.get("FB_RHI", 16))


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((HQ, Q, D)), jnp.bfloat16)
    kv_shape = (LAYERS, HKV, CAP, D) if STACKED else (HKV, CAP, D)
    # generate the multi-GB kv stack ON DEVICE (H2D over the tunnel is
    # ~26 MB/s — shipping 1.9 GB would take minutes)
    n = int(np.prod(kv_shape))
    kbuf = jax.jit(
        lambda: ((jax.lax.iota(jnp.int32, n) % 251 - 125).astype(jnp.bfloat16)
                 * jnp.bfloat16(0.02)).reshape(kv_shape)
    )()
    vbuf = kbuf * jnp.bfloat16(0.5)
    k_scale = v_scale = None
    if KV_DTYPE in ("int8", "int8k"):
        kbuf = jax.jit(
            lambda b: jnp.clip(
                jnp.round(b.astype(jnp.float32) / 0.02), -127, 127
            ).astype(jnp.int8)
        )(kbuf)
        # the kernel takes the CURRENT layer's scale slice: (Hkv, cap)
        k_scale = jnp.full((HKV, CAP), 0.02, jnp.float32)
        if KV_DTYPE == "int8":
            vbuf = kbuf  # values irrelevant for timing
            v_scale = k_scale
        # int8k: K int8 (QK at the s8xs8 MXU rate), V stays bf16 (full-rate
        # bf16 PV with no dequant cast) — the kv_cache "int8k" mode
    length = jnp.int32(VALID)
    layer_idx = jnp.int32(LAYERS // 2) if STACKED else None
    scale = D ** -0.5
    flops = HQ * Q * (VALID + Q // 2) * D * 4
    ideal_ms = flops / 197e12 * 1e3
    print(
        f"hq={HQ} hkv={HKV} q={Q} valid={VALID} acap={ACAP} "
        f"stacked={STACKED} ideal={ideal_ms:.2f} ms", flush=True,
    )

    def bench(bq, bk, nq_inner=0):
        # nq_inner rides as a STATIC jit arg (not the env var): the env is
        # read at trace time only, so a combo repeating (bq, bk) would hit
        # the kernel's jit cache and silently reuse the previous unroll
        def make(R):
            # operands are ARGUMENTS (a zero-arg closure would bake the
            # multi-GB kv stack into the program as constants and ship it to
            # the compile service)
            def prog(q, kbuf, vbuf, length):
                def body(carry, _):
                    # vary q by the carry so XLA can't CSE the reps
                    out = flash_past_attention(
                        q + carry, kbuf, vbuf, length, scale=scale,
                        causal=True, block_q=bq, block_k=bk, active_cap=ACAP,
                        layer_idx=layer_idx,
                        k_scale=k_scale, v_scale=v_scale,
                        nq_inner=nq_inner,
                    ).out
                    return out[0, 0, 0].astype(jnp.bfloat16), None

                return jax.lax.scan(body, jnp.bfloat16(0), None, length=R)[0]

            return jax.jit(prog)

        def run(fn):
            sync(fn(q, kbuf, vbuf, length))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sync(fn(q, kbuf, vbuf, length))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = run(make(R_LO)), run(make(R_HI))
        per = (t_hi - t_lo) / (R_HI - R_LO) * 1e3
        tag = f" nqi={nq_inner}" if nq_inner else ""
        print(f"bq={bq:5d} bk={bk:5d}{tag}  {per:8.2f} ms/call  "
              f"MFU~{ideal_ms/per*100:4.1f}%", flush=True)

    import ast
    combos = ast.literal_eval(os.environ.get(
        "FB_COMBOS",
        "[(128,1024),(128,2048),(256,1024),(128,512),(256,2048),(512,1024)]",
    ))
    for combo in combos:
        try:
            bench(*combo)
        except Exception as e:
            print(f"{combo}  FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
