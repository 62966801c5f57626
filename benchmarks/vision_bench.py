"""Vision tower ablation at the bench group shapes: full tower vs
attention-ablated vs matmul floor, each with/without int8 activations.
Attributes the tower's time between window attention, projections/MLP, and
layout/norm overheads — and answers where (if anywhere) act-quant pays.

Defaults = 7B strict-resize group grid (16, 22, 40), int8 weights (the
headline bench config). Override via env: VB_MODEL, VB_T/VB_H/VB_W,
VB_PARAM_DTYPE=bf16.
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
from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.models.qwen25_vl import vision as V
from quickvideo_tpu.ops import quantization as qz

MODEL = os.environ.get("VB_MODEL", "qwen25-vl-7b")
T = int(os.environ.get("VB_T", 16))
GH = int(os.environ.get("VB_H", 22))
GW = int(os.environ.get("VB_W", 40))
PARAM_DTYPE = os.environ.get("VB_PARAM_DTYPE", "int8")
REPS = int(os.environ.get("VB_REPS", 6))


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


_RTT = None


def _fetch_rtt():
    # host fetch of a FRESH tiny device array: the per-sync tunnel
    # round-trip every timed fetch pays. Must be a fresh array each probe —
    # jax caches the host copy after the first np.asarray, which makes a
    # re-fetch of the same array read ~0 ms while the true RTT is ~20 ms.
    global _RTT
    if _RTT is None:
        probe = jax.jit(lambda x: x + 1.0)
        base = jnp.zeros((8,), jnp.float32)
        np.asarray(probe(base))  # warm
        def once():
            fresh = probe(base)
            fresh.block_until_ready()
            return _t(lambda: np.asarray(fresh))
        _RTT = min(once() for _ in range(5))
    return _RTT


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timeit(name, fn, *args):
    # dispatch REPS independent calls, ONE fetch at the end: the device
    # executes them in order while dispatches pipeline, so per-rep time is
    # device time, not device time + a ~25 ms tunnel round-trip per rep
    # (the old per-rep sync() inflated every arm by that RTT — it made a
    # ~3 ms embed+merger read as ~28 ms)
    sync(fn(*args))  # warm compile + materialize
    rtt = _fetch_rtt()
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0 - rtt) / REPS
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    cfg = get_config(MODEL)
    vc = cfg.vision
    if PARAM_DTYPE == "int8":
        params = qz.init_params_fast_quantized(cfg, jnp.bfloat16)["vision"]
    else:
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
    print(f"model={MODEL} grid={grid} seq={s} uniform={layout.win_uniform} "
          f"params={PARAM_DTYPE}", flush=True)

    def with_vis_act(flag, mk):
        # the act-quant gates are read at trace time through qdot_vision /
        # vision_mlp_act_quant — monkeypatch BOTH (attention-projection and
        # MLP gates) + fresh jit re-traces with the chosen mode, so the
        # "[wo]" arms are genuinely weight-only (with default env the MLP
        # gate alone would leave MLP act-quant on)
        old = qz._ACT_QUANT_VISION
        old_mlp = qz._ACT_QUANT_VISION_MLP
        qz._ACT_QUANT_VISION = flag
        qz._ACT_QUANT_VISION_MLP = flag
        try:
            return mk()
        finally:
            qz._ACT_QUANT_VISION = old
            qz._ACT_QUANT_VISION_MLP = old_mlp

    # production path selection happens inside vision_block at trace time
    # (QV_VISION_2D + kernel applicability); pre-pad the weights the way the
    # engine does so the 2D arms measure the production program
    params = V.add_padded_block_weights(params, vc)
    if PARAM_DTYPE == "int8":
        from quickvideo_tpu.ops.fused_vision_mlp import (
            fuse_vision_mlp_weights,
        )

        params = fuse_vision_mlp_weights(params, vc)
    use2d_default = os.environ.get("QV_VISION_2D", "1") != "0"
    fused = os.environ.get("QV_FUSED_VISION_MLP", "1") != "0"
    print(f"vision path: {'2D padded-head' if use2d_default else '1D'}"
          f" mlp={'fused' if fused and PARAM_DTYPE == 'int8' else 'chain'}",
          flush=True)

    for act in (False, True) if PARAM_DTYPE == "int8" else (False,):
        tag = "a8" if act else "wo"
        full = with_vis_act(act, lambda: jax.jit(
            lambda p, px, a: V.vision_forward(p, px, layout, vc, a)
        ))
        timeit(f"full tower [{tag}]", full, params, pixels, la)

        from quickvideo_tpu.ops import vision_attention as VA

        orig = V._block_attention
        orig_bda = VA.block_diag_attention
        orig_bda2 = getattr(VA, "block_diag_attention_2d", None)
        try:
            # ablate ALL attention paths: the 2D padded-head kernel (the
            # production path on TPU), the 1D TPU kernel incl. its
            # (S,nh,hd)->(nh,S,hd) transposes, and the XLA fallback
            V._block_attention = lambda q, k, v, valid, scale: q.astype(
                jnp.float32
            )
            VA.block_diag_attention = (
                lambda q, k, v, span, **kw: q.astype(jnp.float32)
            )
            if orig_bda2 is not None:
                VA.block_diag_attention_2d = (
                    lambda q, k, v, span, **kw: q.astype(jnp.float32)
                )
            noattn = with_vis_act(act, lambda: jax.jit(
                lambda p, px, a: V.vision_forward(p, px, layout, vc, a)
            ))
            timeit(f"attention ablated [{tag}]", noattn, params, pixels, la)
        finally:
            V._block_attention = orig
            VA.block_diag_attention = orig_bda
            if orig_bda2 is not None:
                VA.block_diag_attention_2d = orig_bda2

        # rotary as a separate HBM pass exists only on the 1D path (the 2D
        # kernel fuses it on VMEM tiles); measure its ablation there and
        # label it so the arm is not mistaken for a production attribution
        orig_rot = V._apply_vision_rotary
        os.environ["QV_VISION_2D"] = "0"
        try:
            V._apply_vision_rotary = lambda x, cos, sin: x
            norot = with_vis_act(act, lambda: jax.jit(
                lambda p, px, a: V.vision_forward(p, px, layout, vc, a)
            ))
            timeit(f"rotary ablated [1D path, {tag}]",
                   norot, params, pixels, la)
        finally:
            V._apply_vision_rotary = orig_rot
            if use2d_default:
                os.environ.pop("QV_VISION_2D", None)

        orig_norm = V._rms_norm
        try:
            V._rms_norm = lambda x, w, eps: x
            nonorm = with_vis_act(act, lambda: jax.jit(
                lambda p, px, a: V.vision_forward(p, px, layout, vc, a)
            ))
            timeit(f"rmsnorm ablated [{tag}]", nonorm, params, pixels, la)
        finally:
            V._rms_norm = orig_norm

        orig_span = V.vision_block
        try:
            # identity blocks: isolates patch_embed + layout perms + merger
            V.vision_block = lambda bp, x, **kw: x
            noblocks = with_vis_act(act, lambda: jax.jit(
                lambda p, px, a: V.vision_forward(p, px, layout, vc, a)
            ))
            timeit(f"blocks ablated (embed+merger) [{tag}]",
                   noblocks, params, pixels, la)
        finally:
            V.vision_block = orig_span

        # pure matmul floor: per-block projections at the same seq len
        x = jnp.ones((s, vc.hidden_size), jnp.bfloat16)

        def mm_floor(p, x, act=act):
            def body(h, bp):
                qkv = qz.qdot(h, bp["wqkv"], act_quant=act)
                h = h + qz.qdot(
                    qkv.astype(h.dtype)[:, : vc.hidden_size], bp["wo"],
                    act_quant=act,
                ).astype(h.dtype)
                g = qz.qdot(h, bp["wg"], act_quant=act)
                u = qz.qdot(h, bp["wu"], act_quant=act)
                m = (jax.nn.silu(g) * u).astype(h.dtype)
                h = h + qz.qdot(m, bp["wd"], act_quant=act).astype(h.dtype)
                return h, None

            return jax.lax.scan(body, x, p["blocks"])[0]

        timeit(f"matmul floor (proj+mlp scan) [{tag}]",
               jax.jit(mm_floor), params, x)

        # MLP-only act-quant arm: attention proj weight-only, MLP quantized
        if act:
            def mm_mlponly(p, x):
                def body(h, bp):
                    qkv = qz.qdot(h, bp["wqkv"], act_quant=False)
                    h = h + qz.qdot(
                        qkv.astype(h.dtype)[:, : vc.hidden_size], bp["wo"],
                        act_quant=False,
                    ).astype(h.dtype)
                    g = qz.qdot(h, bp["wg"], act_quant=True)
                    u = qz.qdot(h, bp["wu"], act_quant=True)
                    m = (jax.nn.silu(g) * u).astype(h.dtype)
                    h = h + qz.qdot(
                        m, bp["wd"], act_quant=True
                    ).astype(h.dtype)
                    return h, None

                return jax.lax.scan(body, x, p["blocks"])[0]

            timeit("matmul floor (MLP-only a8)",
                   jax.jit(mm_mlponly), params, x)


if __name__ == "__main__":
    main()
