"""Sharding rules: parameters, KV cache, and activations over the mesh.

Megatron-style tensor parallelism expressed as GSPMD annotations (the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives over ICI):

  wq/wk/wv  : columns (heads) over tp        -> activations (L, heads/tp, D)
  wo        : rows (heads) over tp           -> psum into residual
  wg/wu     : columns over tp; wd rows       -> one psum per MLP
  lm_head   : columns (vocab) over tp
  KV cache  : kv-heads over tp (tp <= num_kv_heads for the cache path)
  activations: group token axis over sp (sequence parallel for very large
  prefill groups, SURVEY.md section 5.7)

The engine works unsharded on one chip; with a mesh, params/cache are placed
with these shardings and the same jitted code runs SPMD.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quickvideo_tpu.ops.kv_cache import KVCache

REPL = P()


def param_shardings(mesh: Mesh) -> dict:
    """PartitionSpec pytree matching models.qwen25_vl param structure.
    Layer-stacked weights carry a leading layer axis (never sharded)."""
    lang_layers = {
        "ln1": REPL,
        "ln2": REPL,
        "wq": P(None, None, "tp"),
        "bq": P(None, "tp"),
        "wk": P(None, None, "tp"),
        "bk": P(None, "tp"),
        "wv": P(None, None, "tp"),
        "bv": P(None, "tp"),
        "wo": P(None, "tp", None),
        "wg": P(None, None, "tp"),
        "wu": P(None, None, "tp"),
        "wd": P(None, "tp", None),
    }
    vis_blocks = {
        "ln1": REPL,
        "ln2": REPL,
        "wqkv": REPL,  # vision tower is small; replicate for v1
        "bqkv": REPL,
        "wo": REPL,
        "bo": REPL,
        "wg": REPL,
        "bg": REPL,
        "wu": REPL,
        "bu": REPL,
        "wd": REPL,
        "bd": REPL,
    }
    return {
        "language": {
            "embed": REPL,
            "layers": lang_layers,
            "norm": REPL,
            "lm_head": P(None, "tp"),
        },
        "vision": {
            "patch_embed": REPL,
            "blocks": vis_blocks,
            "merger": {
                "ln_q": REPL, "w1": REPL, "b1": REPL, "w2": REPL, "b2": REPL,
            },
        },
    }


def _named(mesh, spec_tree, tree):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        spec_tree,
        is_leaf=lambda x: x is None,
    )


def _is_quantized_leaf(x) -> bool:
    return isinstance(x, dict) and "q8" in x


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_shardings(mesh)

    def put(x, s):
        if _is_quantized_leaf(x):
            # q8 keeps the weight's spec; the per-out-channel scale drops the
            # contraction axis (second-to-last entry of the spec)
            parts = tuple(s)
            sc_spec = P(*(parts[:-2] + parts[-1:])) if len(parts) >= 2 else s
            return {
                "q8": jax.device_put(x["q8"], NamedSharding(mesh, s)),
                "sc": jax.device_put(x["sc"], NamedSharding(mesh, sc_spec)),
            }
        return jax.device_put(x, NamedSharding(mesh, s))

    # prune spec tree to the params present
    return jax.tree.map(
        put, params, {k: specs[k] for k in params},
        is_leaf=_is_quantized_leaf,
    )


def cache_sharding(mesh: Mesh):
    """(layers, kv_heads, capacity, head_dim): kv heads over tp. The int8
    scale arrays (layers, kv_heads, capacity) shard on the same head axis."""
    return KVCache(
        k=NamedSharding(mesh, P(None, "tp", None, None)),
        v=NamedSharding(mesh, P(None, "tp", None, None)),
        length=NamedSharding(mesh, P(None)),
        k_scale=NamedSharding(mesh, P(None, "tp", None)),
        v_scale=NamedSharding(mesh, P(None, "tp", None)),
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    s = cache_sharding(mesh)
    return KVCache(
        k=jax.device_put(cache.k, s.k),
        v=jax.device_put(cache.v, s.v),
        length=jax.device_put(cache.length, s.length),
        k_scale=(
            None if cache.k_scale is None
            else jax.device_put(cache.k_scale, s.k_scale)
        ),
        v_scale=(
            None if cache.v_scale is None
            else jax.device_put(cache.v_scale, s.v_scale)
        ),
    )


def activation_constraint(x, mesh: Optional[Mesh], axis: str = "sp"):
    """Constrain the token axis of (L, C) activations over `axis`."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis, None))
    )
