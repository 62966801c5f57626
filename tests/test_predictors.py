"""Golden tests for token-importance predictors vs a NumPy oracle that
implements the reference semantics (reference lvu/utils.py:15-194)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quickvideo_tpu.ops import predictors


H, L, D, C = 2, 48, 8, 24  # kv heads, group len, head dim, hidden
K = 12


def flat_norms_np(x):
    # (H, L, D) -> (L,) : reference lvu/utils.py:130-131 layout
    h, l, d = x.shape
    return np.linalg.norm(np.transpose(x, (1, 0, 2)).reshape(l, h * d), axis=-1)


def make_inputs(rng_np):
    keys = rng_np.standard_normal((H, L, D)).astype(np.float32)
    values = rng_np.standard_normal((H, L, D)).astype(np.float32)
    hidden = rng_np.standard_normal((L, C)).astype(np.float32)
    # synthetic causal attention probs with a <1 row-sum (full-denominator
    # normalization over past+group, as produced by grouped_attention)
    scores = rng_np.standard_normal((L, L)).astype(np.float32)
    mask = np.tril(np.ones((L, L), bool))
    e = np.exp(scores - scores.max(axis=-1, keepdims=True)) * mask
    attn = e / (e.sum(axis=-1, keepdims=True) + 3.0)
    return keys, values, hidden, attn


def run(predict_type, k=K, **kw):
    idx = predictors.select_top_k_indices(predict_type, k, **kw)
    return np.asarray(idx)


def oracle_topk(scores, k, largest):
    order = np.argsort(-scores if largest else scores, kind="stable")
    return set(order[:k].tolist())


class TestNormFamilies:
    def test_key_norms_small_default(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        idx = run("key_norms_small", keys=jnp.asarray(keys))
        expected = oracle_topk(flat_norms_np(keys), K, largest=False)
        assert set(idx.tolist()) == expected
        assert np.all(np.diff(idx) > 0)  # sorted, distinct

    def test_key_norms(self, rng_np):
        keys, *_ = make_inputs(rng_np)
        idx = run("key_norms", keys=jnp.asarray(keys))
        assert set(idx.tolist()) == oracle_topk(flat_norms_np(keys), K, True)

    def test_vector_norms(self, rng_np):
        keys, values, *_ = make_inputs(rng_np)
        idx = run("vector_norms", values=jnp.asarray(values))
        assert set(idx.tolist()) == oracle_topk(flat_norms_np(values), K, True)

    def test_vector_norms_small(self, rng_np):
        keys, values, *_ = make_inputs(rng_np)
        idx = run("vector_norms_small", values=jnp.asarray(values))
        assert set(idx.tolist()) == oracle_topk(flat_norms_np(values), K, False)

    def test_output_norms(self, rng_np):
        keys, values, hidden, _ = make_inputs(rng_np)
        idx = run("output_norms", hidden=jnp.asarray(hidden))
        expected = oracle_topk(np.linalg.norm(hidden, axis=-1), K, True)
        assert set(idx.tolist()) == expected

    def test_key_weighted_vector_norms(self, rng_np):
        keys, values, *_ = make_inputs(rng_np)
        kn = flat_norms_np(keys)
        kn = np.exp(kn - kn.max()) / np.exp(kn - kn.max()).sum()
        w = kn * flat_norms_np(values)
        idx = run(
            "key_weighted_vector_norms",
            keys=jnp.asarray(keys),
            values=jnp.asarray(values),
        )
        assert set(idx.tolist()) == oracle_topk(w, K, True)


class TestAttnStatFamilies:
    def test_attention_weights(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        # oracle: mean of attn[i:, i] per column (reference lvu/utils.py:50-53)
        means = np.array([attn[i:, i].mean() for i in range(L)])
        idx = run("attention_weights", attn=jnp.asarray(attn))
        assert set(idx.tolist()) == oracle_topk(means, K, True)

    def test_attention_weights_sum(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        sums = np.array([attn[i:, i].sum() for i in range(L)])
        idx = run("attention_weights_sum", attn=jnp.asarray(attn))
        assert set(idx.tolist()) == oracle_topk(sums, K, True)

    def test_salient_tokens(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        # reference lvu/utils.py:43-48: std (unbiased) + mean; final column's
        # single-element std is NaN in torch — our build defines it as 0.
        vals = []
        for i in range(L):
            w = attn[i:, i]
            std = w.std(ddof=1) if len(w) > 1 else 0.0
            vals.append(std + w.mean())
        idx = run("salient_tokens", attn=jnp.asarray(attn))
        assert set(idx.tolist()) == oracle_topk(np.array(vals), K, True)

    def test_attention_weights_sum_per_image(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        win = 258  # reference hardcodes 258 tokens/image (lvu/utils.py:80)
        sums = np.array([attn[i : i + win, i].sum() for i in range(L)])
        idx = run("attention_weights_sum_per_image", attn=jnp.asarray(attn))
        assert set(idx.tolist()) == oracle_topk(sums, K, True)

    def test_head_tail(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        sums = np.array([attn[i:, i].sum() for i in range(L)])
        order = np.argsort(-sums, kind="stable")
        expected = set(order[: K // 2].tolist()) | set(order[-(K // 2) :].tolist())
        idx = run("attention_weights_sum_head_tail", attn=jnp.asarray(attn))
        assert len(idx) == K and len(set(idx.tolist())) == K
        assert expected <= set(idx.tolist())

    def test_sum_with_random(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        sums = np.array([attn[i:, i].sum() for i in range(L)])
        order = np.argsort(-sums, kind="stable")
        head = set(order[: K // 2].tolist())
        idx = run(
            "attention_weights_sum_with_random",
            attn=jnp.asarray(attn),
            rng=jax.random.key(0),
        )
        assert len(idx) == K and len(set(idx.tolist())) == K
        assert head <= set(idx.tolist())

    def test_weighted_norms(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        vn = flat_norms_np(values)
        # reference lvu/utils.py:177-187: mean_q || attn[q,i] * v_i || =
        # ||v_i|| * mean_q |attn[q,i]|
        w = np.abs(attn).mean(axis=0) * vn
        idx = run(
            "weighted_norms", values=jnp.asarray(values), attn=jnp.asarray(attn)
        )
        assert set(idx.tolist()) == oracle_topk(w, K, True)


class TestQueryFamilies:
    def test_query_attention_weights(self, rng_np):
        accum = rng_np.standard_normal(L).astype(np.float32)
        idx = run("query_attention_weights", accum_attn=jnp.asarray(accum))
        assert set(idx.tolist()) == oracle_topk(accum, K, True)

    def test_query_attention_weights_by_value_norm(self, rng_np):
        keys, values, *_ = make_inputs(rng_np)
        accum = rng_np.random(L).astype(np.float32)
        w = accum * flat_norms_np(values)
        idx = run(
            "query_attention_weights_by_value_norm",
            values=jnp.asarray(values),
            accum_attn=jnp.asarray(accum),
        )
        assert set(idx.tolist()) == oracle_topk(w, K, True)


class TestStochasticAndDedup:
    def test_random_contains_zero(self, rng_np):
        idx = run("random", keys=jnp.zeros((H, L, D)), rng=jax.random.key(3))
        assert len(idx) == K and len(set(idx.tolist())) == K
        assert 0 in idx.tolist()

    def test_key_norms_small_random(self, rng_np):
        keys, *_ = make_inputs(rng_np)
        order = np.argsort(flat_norms_np(keys), kind="stable")
        head = set(order[: K // 2].tolist())
        idx = run(
            "key_norms_small_random", keys=jnp.asarray(keys), rng=jax.random.key(1)
        )
        assert len(idx) == K and len(set(idx.tolist())) == K
        assert head <= set(idx.tolist())

    def _dedup_oracle(self, scores, feat, k, num_pivots, largest):
        order = np.argsort(-scores if largest else scores, kind="stable")
        pivots = order[:num_pivots]
        others = order[num_pivots:]
        f = feat / np.maximum(np.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
        cos = f[pivots] @ f[others].T
        fill = others[np.argsort(cos.mean(axis=0), kind="stable")[: k - num_pivots]]
        return set(pivots.tolist()) | set(fill.tolist())

    def test_key_norms_small_deduplication(self, rng_np):
        keys, *_ = make_inputs(rng_np)
        num_pivots = (K - 1) // 16 + 1
        feat = np.transpose(keys, (1, 0, 2)).reshape(L, -1)
        expected = self._dedup_oracle(
            flat_norms_np(keys), feat, K, num_pivots, largest=False
        )
        idx = run("key_norms_small_deduplication", keys=jnp.asarray(keys))
        assert set(idx.tolist()) == expected

    def test_attention_weights_deduplication(self, rng_np):
        keys, values, hidden, attn = make_inputs(rng_np)
        num_pivots = (K - 1) // 2 + 1
        sums = np.array([attn[i:, i].sum() for i in range(L)])
        feat = np.transpose(values, (1, 0, 2)).reshape(L, -1)
        expected = self._dedup_oracle(sums, feat, K, num_pivots, largest=True)
        idx = run(
            "attention_weights_deduplication",
            values=jnp.asarray(values),
            attn=jnp.asarray(attn),
        )
        assert set(idx.tolist()) == expected


def test_indices_to_mask():
    idx = jnp.asarray([1, 4, 7], jnp.int32)
    mask = predictors.indices_to_mask(idx, 10)
    assert np.asarray(mask).tolist() == [
        False, True, False, False, True, False, False, True, False, False,
    ]


def test_jit_and_fixed_shapes(rng_np):
    keys = jnp.asarray(rng_np.standard_normal((H, L, D)).astype(np.float32))

    @jax.jit
    def f(k):
        return predictors.select_top_k_indices("key_norms_small", K, keys=k)

    idx = f(keys)
    assert idx.shape == (K,)
    assert set(np.asarray(idx).tolist()) == oracle_topk(
        flat_norms_np(np.asarray(keys)), K, False
    )
