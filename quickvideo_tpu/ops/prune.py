"""Select-and-compact: gather retained group tokens and append to the cache.

The TPU-native equivalent of the reference's prune-and-write-back pass
(reference lvu/utils.py:197-376 `post_process_kv_cache`). Where the reference
mutates a growing `DynamicCache` in place with data-dependent index tensors,
this module expresses the same operation as fixed-shape gathers + a
dynamic_update_slice append into the preallocated cache buffer — jit-compiles
once, no recompilation as the cache fills.

Invariant preserved from the reference (SURVEY.md section 3.4): positions are
NOT renumbered after pruning — keys carry their original mRoPE phases (rope
applied pre-cache) and `cache_position`/`past_len` keep global indexing at the
engine level.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quickvideo_tpu.ops import predictors
from quickvideo_tpu.ops.kv_cache import layer_append

Array = jax.Array


def gather_group_tokens(x: Array, indices: Array) -> Array:
    """Gather along the token axis.

    x: (..., L, D) with token axis at -2, or (L,) / (L, D) with token axis 0.
    indices: (k,) int32.
    """
    if x.ndim == 1:
        return x[indices]
    return jnp.take(x, indices, axis=-2)


class PruneResult(NamedTuple):
    k_keep: Array  # (Hkv, k, D)
    v_keep: Array  # (Hkv, k, D)
    indices: Array  # (k,) positions within the group
    accum_keep: Optional[Array]  # (k,) or None


def select_and_compact(
    predict_type: str,
    keep_k: int,
    k_group: Array,  # (Hkv, G, D) RoPE'd keys of the current group
    v_group: Array,  # (Hkv, G, D)
    *,
    hidden: Optional[Array] = None,  # (G, C) post-attn hidden states
    group_probs: Optional[Array] = None,  # (G, G) from grouped_attention
    accum_attn: Optional[Array] = None,  # (G,) prompt->key accumulated scores
    rng: Optional[Array] = None,
    tp_axis=None,  # mesh axis name when heads are tp-sharded (shard_map)
) -> PruneResult:
    """Score the group's tokens, keep `keep_k`, gather K/V (and accum scores).

    `keep_k` is static; shapes are fixed. Semantics of each predict_type match
    reference lvu/utils.py:43-189 (see quickvideo_tpu.ops.predictors).
    """
    idx = predictors.select_top_k_indices(
        predict_type,
        keep_k,
        keys=k_group,
        values=v_group,
        hidden=hidden,
        attn=group_probs,
        accum_attn=accum_attn,
        rng=rng,
        tp_axis=tp_axis,
    )
    return PruneResult(
        k_keep=gather_group_tokens(k_group, idx),
        v_keep=gather_group_tokens(v_group, idx),
        indices=idx,
        accum_keep=None if accum_attn is None else accum_attn[idx],
    )


def prune_append_layer(
    k_buf: Array,
    v_buf: Array,
    length: Array,
    result: PruneResult,
):
    """Append a PruneResult into one layer's cache buffers at slot `length`.

    Functional analogue of the reference's cache write-back
    (lvu/utils.py:333-342: `key_cache[layer] = cat([past, top_k_keys])`)."""
    return layer_append(k_buf, v_buf, length, result.k_keep, result.v_keep)
