"""Token-importance predictors for KV-cache pruning.

Vectorized JAX re-implementations of the reference's 19 pruning policies
(reference lvu/utils.py:15-194, `get_top_k_mask_to_predict`). The reference
computes these with per-batch Python loops over torch tensors; here every
policy is a fixed-shape jnp program (vmap/jit friendly, no data-dependent
shapes), so the whole selection runs inside the compiled prefill step.

Conventions (single sequence; the engine vmaps/loops batch externally, the
reference asserts bz == 1 at lvu/utils.py:264):

  keys:    (num_kv_heads, L, head_dim)  -- current-group keys (pre-GQA-repeat,
           RoPE applied), matching the cache layout the reference prunes.
  values:  (num_kv_heads, L, head_dim)
  hidden:  (L, hidden_size)             -- post-attention hidden states
  attn:    (L, L) or None               -- group-column attention probabilities
           averaged over heads: attn[q, i] = P(query q -> group key i), with
           softmax normalization over the FULL kv span (past cache + group),
           rows strictly below the diagonal are zero (causal). This equals
           `attn_weights[bz].mean(0)[:, -k_len:]` in the reference
           (lvu/utils.py:33).
  accum_attn: (L,) or None              -- accumulated prompt->key attention
           (reference lvu/lvu_cache.py:90-117).

All selection functions return `indices` of shape (k,), int32, the retained
token positions within the group. The index SET matches the reference; the
ORDER within the set may differ (the reference keeps argsort order, we sort by
position — attention over a KV set is permutation-invariant, so downstream
results are identical; documented divergence for readability/debuggability).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Score primitives
# ---------------------------------------------------------------------------


def _flat_norms(x: Array, tp_axis=None) -> Array:
    """L2 norm over the heads-flattened feature dim.

    Reference: `keys_i.transpose(0, 1).flatten(1, 2).norm(2, dim=-1)`
    (lvu/utils.py:130-131): (H, L, D) -> (L, H*D) -> (L,).

    Under tensor parallelism (`tp_axis` inside shard_map) the head axis is
    sharded: the squared sums psum to the exact global norm, so every tp
    shard selects identical token indices."""
    h, l, d = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(l, h * d)
    sq = jnp.sum(flat.astype(jnp.float32) ** 2, axis=-1)
    if tp_axis is not None:
        sq = jax.lax.psum(sq, tp_axis)
    return jnp.sqrt(sq)


def key_norms(keys: Array, tp_axis=None) -> Array:
    return _flat_norms(keys, tp_axis)


def value_norms(values: Array, tp_axis=None) -> Array:
    return _flat_norms(values, tp_axis)


def output_norms(hidden: Array) -> Array:
    return jnp.linalg.norm(hidden.astype(jnp.float32), axis=-1)


def attn_column_stats(attn: Array):
    """Per-column statistics over rows i..L-1 of column i.

    The reference iterates `weights = attn[i:, i]` per column
    (lvu/utils.py:45-47,50-53,65-68); under the causal structure rows < i are
    zero, so sums over `i:` equal full-column sums; means/stds divide by the
    suffix length L - i.

    Returns (colsum, colmean, colstd_unbiased). Note: the reference's
    `weights.std()` is torch's unbiased std, which is NaN for the final column
    (single element); we clamp the denominator to 1 so the final column gets
    std 0 instead of NaN (documented divergence; NaN ordering is
    implementation-defined in the reference too).
    """
    l = attn.shape[0]
    a = attn.astype(jnp.float32)
    colsum = jnp.sum(a, axis=0)
    colsumsq = jnp.sum(a * a, axis=0)
    count = (l - jnp.arange(l)).astype(jnp.float32)
    colmean = colsum / count
    var_num = colsumsq - count * colmean * colmean
    colvar = var_num / jnp.maximum(count - 1.0, 1.0)
    colstd = jnp.sqrt(jnp.maximum(colvar, 0.0))
    return colsum, colmean, colstd


def attn_windowed_colsum(attn: Array, window: int = 258) -> Array:
    """sum of attn[i:i+window, i] per column i (reference lvu/utils.py:77-82,
    `attention_weights_sum_per_image`, window = 258 tokens/image)."""
    l = attn.shape[0]
    a = attn.astype(jnp.float32)
    # cumulative sums down each column, padded with a zero row
    csum = jnp.concatenate([jnp.zeros((1, l), a.dtype), jnp.cumsum(a, axis=0)], 0)
    idx = jnp.arange(l)
    hi = jnp.minimum(idx + window, l)
    # colsum_window[i] = csum[hi[i], i] - csum[i, i]
    top = csum[hi, idx]
    bot = csum[idx, idx]
    return top - bot


# ---------------------------------------------------------------------------
# Selection helpers
# ---------------------------------------------------------------------------


def _top_k_indices(scores: Array, k: int, largest: bool) -> Array:
    """Indices of the k largest (or smallest) scores, returned sorted by
    position. Ties break toward the lowest index (same as a stable argsort,
    matching torch argsort's observed behavior on distinct values)."""
    s = scores if largest else -scores
    _, idx = jax.lax.top_k(s, k)
    return jnp.sort(idx).astype(jnp.int32)


def _sorted_indices(scores: Array, largest: bool) -> Array:
    """Full argsort, best-first."""
    order = jnp.argsort(-scores if largest else scores, stable=True)
    return order.astype(jnp.int32)


def _dedup_select(
    pivot_scores: Array,
    feat: Array,
    k: int,
    num_pivots: int,
    largest: bool,
    tp_axis=None,
) -> Array:
    """Pivot + cosine-dissimilar fill (reference lvu/utils.py:93-120,150-164).

    Selects `num_pivots` tokens by score, then fills to k with the remaining
    tokens least cosine-similar (mean over pivots) to the pivot set, using
    feature vectors `feat` (L, C).

    The reference wraps the result in `list(set())`, which can return FEWER
    than k and trip its own assertion (SURVEY.md section 5.9); we always return
    exactly k distinct indices (pivots and fills are disjoint by construction).
    """
    l = feat.shape[0]
    order = _sorted_indices(pivot_scores, largest=largest)
    pivots = order[:num_pivots]
    others = order[num_pivots:]  # (L - P,)
    fnorm = feat.astype(jnp.float32)
    # under tp the feature dim (heads*head_dim) is sharded: normalize by the
    # GLOBAL vector norm and psum the partial dot products — the cosine is
    # exact and identical on every shard
    sq = jnp.sum(fnorm * fnorm, axis=-1, keepdims=True)
    if tp_axis is not None:
        sq = jax.lax.psum(sq, tp_axis)
    fnorm = fnorm / jnp.maximum(jnp.sqrt(sq), 1e-12)
    pv = fnorm[pivots]  # (P, C)
    ov = fnorm[others]  # (L-P, C)
    cos = pv @ ov.T  # (P, L-P)
    if tp_axis is not None:
        cos = jax.lax.psum(cos, tp_axis)
    mean_cos = jnp.mean(cos, axis=0)
    fill_local = _top_k_indices(-mean_cos, k - num_pivots, largest=True)
    fill = others[fill_local]
    return jnp.sort(jnp.concatenate([pivots, fill])).astype(jnp.int32)


def _random_indices(rng: Array, l: int, k: int, force_first: bool) -> Array:
    """k distinct random indices; optionally always include index 0 (the
    reference's `random` policy appends 0 if missing, lvu/utils.py:146-149,
    yielding k+1 tokens in that case — we instead guarantee 0 is among the k,
    keeping the fixed-size contract)."""
    perm = jax.random.permutation(rng, l)
    if not force_first:
        return jnp.sort(perm[:k]).astype(jnp.int32)
    sel = perm[:k]
    has_zero = jnp.any(sel == 0)
    # replace the last slot with 0 when absent
    sel = jnp.where(
        has_zero, sel, sel.at[k - 1].set(0) if k > 0 else sel
    )
    return jnp.sort(sel).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Main dispatch
# ---------------------------------------------------------------------------


def select_top_k_indices(
    predict_type: str,
    k: int,
    *,
    keys: Optional[Array] = None,
    values: Optional[Array] = None,
    hidden: Optional[Array] = None,
    attn: Optional[Array] = None,
    accum_attn: Optional[Array] = None,
    rng: Optional[Array] = None,
    tp_axis=None,
) -> Array:
    """Select k retained token positions within the current group.

    Mirrors every branch of reference lvu/utils.py:43-189. `predict_type` and
    `k` are static (resolved in Python by the engine); array args are traced.

    `tp_axis` (a mesh axis name, set when running inside a shard_map stage
    with tensor-parallel heads): keys/values/attn carry only the LOCAL head
    shard, so scores reduce over tp (exact psum/pmean of the head
    aggregations) before selection — every shard then picks the same token
    set. hidden and accum_attn arrive already replicated/reduced; rng is
    identical across shards by construction."""
    if k <= 0:
        raise ValueError("k must be positive (engine filters k<=0 upstream)")
    l = None
    for a in (keys, values, hidden):
        if a is not None:
            l = a.shape[-2] if a.ndim == 3 else a.shape[0]
            break
    if attn is not None:
        l = attn.shape[-1]
    if tp_axis is not None and attn is not None:
        # attn is the per-shard mean over LOCAL query heads; equal shard
        # sizes make the global head-mean the pmean of shard means — after
        # which every attn-derived statistic (incl. colstd) is exact
        attn = jax.lax.pmean(attn, tp_axis)

    if predict_type == "salient_tokens":
        _, colmean, colstd = attn_column_stats(attn)
        return _top_k_indices(colstd + colmean, k, largest=True)
    if predict_type == "attention_weights":
        _, colmean, _ = attn_column_stats(attn)
        return _top_k_indices(colmean, k, largest=True)
    if predict_type in (
        "query_attention_weights", "query_attention_weights_by_value_norm"
    ):
        # Prompt->key accumulated scores (reference lvu/lvu_cache.py:108-116).
        # When there are no separate prompt queries (final-prompt prefill with
        # do_top_k_for_query: the reference resets prompt_length to 0 at
        # qwen25_lvu.py:721 and its `attn_weights_i.dim() == 1` assert at
        # lvu/utils.py:56-59 makes the combination unusable there), the group
        # itself IS the query: fall back to the within-group attention column
        # sums, which are exactly "sum over queries, mean over heads".
        if accum_attn is None:
            if attn is None:
                raise ValueError(
                    f"{predict_type} needs prompt accum scores or group "
                    "attention probs (needs_probs)"
                )
            accum_attn, _, _ = attn_column_stats(attn)
        if predict_type == "query_attention_weights":
            return _top_k_indices(accum_attn.astype(jnp.float32), k, largest=True)
        w = accum_attn.astype(jnp.float32) * value_norms(values, tp_axis)
        return _top_k_indices(w, k, largest=True)
    if predict_type == "attention_weights_sum":
        colsum, _, _ = attn_column_stats(attn)
        return _top_k_indices(colsum, k, largest=True)
    if predict_type == "attention_weights_sum_head_tail":
        colsum, _, _ = attn_column_stats(attn)
        order = _sorted_indices(colsum, largest=True)
        head = order[: k // 2]
        tail = order[l - k // 2 :] if k // 2 > 0 else order[:0]
        # reference takes top k//2 and bottom k//2 (lvu/utils.py:70-76);
        # for odd k this yields k-1 tokens there; we pad from the next-best
        # head tokens to keep the fixed-size contract.
        sel = jnp.concatenate([head, tail])
        if sel.shape[0] < k:
            extra = order[k // 2 : k // 2 + (k - sel.shape[0])]
            sel = jnp.concatenate([sel, extra])
        return jnp.sort(sel[:k]).astype(jnp.int32)
    if predict_type == "attention_weights_sum_per_image":
        colsum = attn_windowed_colsum(attn, window=258)
        return _top_k_indices(colsum, k, largest=True)
    if predict_type == "attention_weights_sum_with_random":
        colsum, _, _ = attn_column_stats(attn)
        order = _sorted_indices(colsum, largest=True)
        head = order[: k // 2]
        rest = order[k // 2 :]
        perm = jax.random.permutation(rng, rest.shape[0])
        rand = rest[perm[: k - k // 2]]
        return jnp.sort(jnp.concatenate([head, rand])).astype(jnp.int32)
    if predict_type == "attention_weights_deduplication":
        num_pivots = (k - 1) // 2 + 1
        colsum, _, _ = attn_column_stats(attn)
        feat = jnp.transpose(values, (1, 0, 2)).reshape(l, -1)
        return _dedup_select(colsum, feat, k, num_pivots, largest=True,
                             tp_axis=tp_axis)
    if predict_type == "vector_norms":
        return _top_k_indices(value_norms(values, tp_axis), k, largest=True)
    if predict_type == "vector_norms_small":
        return _top_k_indices(value_norms(values, tp_axis), k, largest=False)
    if predict_type == "key_norms":
        return _top_k_indices(key_norms(keys, tp_axis), k, largest=True)
    if predict_type == "key_norms_small":
        # THE default policy (reference lvu/utils.py:133-136): keep the k
        # tokens with the SMALLEST L2 key norm.
        return _top_k_indices(key_norms(keys, tp_axis), k, largest=False)
    if predict_type == "key_norms_small_random":
        order = _sorted_indices(key_norms(keys, tp_axis), largest=False)
        head = order[: k // 2]
        rest = order[k // 2 :]
        perm = jax.random.permutation(rng, rest.shape[0])
        rand = rest[perm[: k - k // 2]]
        return jnp.sort(jnp.concatenate([head, rand])).astype(jnp.int32)
    if predict_type == "random":
        return _random_indices(rng, l, k, force_first=True)
    if predict_type == "key_norms_small_deduplication":
        num_pivots = (k - 1) // 16 + 1
        feat = jnp.transpose(keys, (1, 0, 2)).reshape(l, -1)
        return _dedup_select(key_norms(keys, tp_axis), feat, k, num_pivots,
                             largest=False, tp_axis=tp_axis)
    if predict_type == "key_weighted_vector_norms":
        kn = jax.nn.softmax(key_norms(keys, tp_axis))
        w = kn * value_norms(values, tp_axis)
        return _top_k_indices(w, k, largest=True)
    if predict_type == "output_norms":
        return _top_k_indices(output_norms(hidden), k, largest=True)
    if predict_type == "weighted_norms":
        # mean over queries of || attn[q, i] * v_i || = ||v_i|| * mean_q attn[q, i]
        # The reference loops queries (lvu/utils.py:177-187); the norm of a
        # scalar-scaled vector factorizes, giving this closed form.
        vn = value_norms(values, tp_axis)
        w = jnp.mean(jnp.abs(attn.astype(jnp.float32)), axis=0) * vn
        return _top_k_indices(w, k, largest=True)
    raise ValueError(f"Unknown predict type: {predict_type}")


def indices_to_mask(indices: Array, l: int) -> Array:
    """Boolean keep-mask (L,) from selected indices (reference
    lvu/utils.py:191-194 builds the same via scatter)."""
    return jnp.zeros((l,), jnp.bool_).at[indices].set(True)
