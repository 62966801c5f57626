"""Vision tower ablation at the bench group shape (32 frames, aligned
resize -> uniform windows): full tower vs attention-ablated vs matmul-only.
Tells whether the documented ~17% vision MFU is lost in the window
attention (worth a Pallas kernel) or in the projections/layout."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.models.qwen25_vl import vision as V

# bench default: 1024 frames, group 32, aligned resize. From the bench run:
# grid per group (16, 36, 64) at BENCH default video (252x448 -> 224x448
# aligned). Override via env.
T = int(os.environ.get("VB_T", 16))
GH = int(os.environ.get("VB_H", 16))
GW = int(os.environ.get("VB_W", 32))
REPS = 4


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args):
    sync(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:9.1f} ms")
    return min(ts)


def main():
    cfg = get_config("qwen25-vl-3b")
    vc = cfg.vision
    params = jax.device_put(
        qmodel.init_params_fast(cfg, dtype=jnp.bfloat16)["vision"]
    )
    sync(params)
    grid = (T, GH, GW)
    layout = V.build_layout(
        grid, vc.patch_size, vc.spatial_merge_size, vc.window_size,
        vc.head_dim,
    )
    la = {k: jax.device_put(v) for k, v in V.layout_arrays_for(layout).items()}
    s = T * GH * GW
    pixels = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (s, vc.patch_input_dim)
        ), jnp.bfloat16
    )
    print(f"grid={grid} seq={s} uniform={layout.win_uniform}")

    full = jax.jit(lambda p, px, a: V.vision_forward(p, px, layout, vc, a))
    timeit("full tower", full, params, pixels, la)

    orig = V._block_attention
    try:
        V._block_attention = lambda q, k, v, valid, scale: q.astype(
            jnp.float32
        )
        noattn = jax.jit(
            lambda p, px, a: V.vision_forward(p, px, layout, vc, a)
        )
        timeit("attention ablated (identity)", noattn, params, pixels, la)
    finally:
        V._block_attention = orig

    # pure matmul floor: the per-block projections at the same seq len
    x = jnp.ones((s, vc.hidden_size), jnp.bfloat16)

    def mm_floor(p, x):
        def body(h, bp):
            qkv = jnp.dot(h, bp["wqkv"], preferred_element_type=jnp.float32)
            h = h + jnp.dot(
                qkv.astype(h.dtype)[:, : vc.hidden_size], bp["wo"],
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            g = jnp.dot(h, bp["wg"], preferred_element_type=jnp.float32)
            u = jnp.dot(h, bp["wu"], preferred_element_type=jnp.float32)
            m = (jax.nn.silu(g) * u).astype(h.dtype)
            h = h + jnp.dot(
                m, bp["wd"], preferred_element_type=jnp.float32
            ).astype(h.dtype)
            return h, None

        return jax.lax.scan(body, x, p["blocks"])[0]

    timeit("matmul floor (proj+mlp scan)", jax.jit(mm_floor), params, x)


if __name__ == "__main__":
    main()
