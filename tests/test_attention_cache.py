"""Tests for grouped attention (LSE-merge over fixed-capacity cache), the KV
cache, and select-and-compact — numerics vs a naive concat-attention oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from quickvideo_tpu.ops import attention, kv_cache, prune
from quickvideo_tpu.config import LVUConfig, resolve_effective_top_k

HQ, HKV, D = 4, 2, 8
SCALE = D ** -0.5


def naive_attention(q, k, v, mask):
    """Oracle: full softmax attention. q (HQ, Q, D); k/v (HKV, L, D);
    mask (Q, L) bool."""
    rep = HQ // HKV
    k = np.repeat(k, rep, axis=0)
    v = np.repeat(v, rep, axis=0)
    scores = np.einsum("hqd,hld->hql", q, k) * SCALE
    scores = np.where(mask[None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = np.where(mask[None], p, 0.0)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hql,hld->hqd", p, v), p


def test_grouped_attention_matches_concat_oracle(rng_np):
    G, PAST, CAP = 16, 10, 32
    q = rng_np.standard_normal((HQ, G, D)).astype(np.float32)
    kg = rng_np.standard_normal((HKV, G, D)).astype(np.float32)
    vg = rng_np.standard_normal((HKV, G, D)).astype(np.float32)
    kbuf = rng_np.standard_normal((HKV, CAP, D)).astype(np.float32)
    vbuf = rng_np.standard_normal((HKV, CAP, D)).astype(np.float32)
    # garbage beyond PAST must not affect the result
    kbuf[:, PAST:] = 1e3
    vbuf[:, PAST:] = -1e3

    out, probs = attention.grouped_attention(
        jnp.asarray(q), jnp.asarray(kg), jnp.asarray(vg),
        jnp.asarray(kbuf), jnp.asarray(vbuf), jnp.int32(PAST),
        scale=SCALE, return_group_probs=True,
    )
    # oracle over concatenated [past, group]
    kcat = np.concatenate([kbuf[:, :PAST], kg], axis=1)
    vcat = np.concatenate([vbuf[:, :PAST], vg], axis=1)
    mask = np.ones((G, PAST + G), bool)
    mask[:, PAST:] = np.tril(np.ones((G, G), bool))
    exp_out, exp_p = naive_attention(q, kcat, vcat, mask)
    np.testing.assert_allclose(np.asarray(out), exp_out, rtol=2e-5, atol=2e-5)
    # group probs: mean over heads of group columns
    exp_gp = exp_p[:, :, PAST:].mean(axis=0)
    np.testing.assert_allclose(np.asarray(probs), exp_gp, rtol=2e-5, atol=2e-5)


def test_grouped_attention_empty_past(rng_np):
    G, CAP = 8, 16
    q = rng_np.standard_normal((HQ, G, D)).astype(np.float32)
    kg = rng_np.standard_normal((HKV, G, D)).astype(np.float32)
    vg = rng_np.standard_normal((HKV, G, D)).astype(np.float32)
    kbuf = np.full((HKV, CAP, D), 7.0, np.float32)
    vbuf = np.full((HKV, CAP, D), -7.0, np.float32)
    out, _ = attention.grouped_attention(
        jnp.asarray(q), jnp.asarray(kg), jnp.asarray(vg),
        jnp.asarray(kbuf), jnp.asarray(vbuf), jnp.int32(0),
        scale=SCALE,
    )
    exp_out, _ = naive_attention(q, kg, vg, np.tril(np.ones((G, G), bool)))
    np.testing.assert_allclose(np.asarray(out), exp_out, rtol=2e-5, atol=2e-5)

    out2, _ = attention.grouped_attention(
        jnp.asarray(q), jnp.asarray(kg), jnp.asarray(vg), None, None, None,
        scale=SCALE,
    )
    np.testing.assert_allclose(np.asarray(out2), exp_out, rtol=2e-5, atol=2e-5)


def test_decode_attention(rng_np):
    CAP, LEN = 24, 13
    q = rng_np.standard_normal((HQ, 1, D)).astype(np.float32)
    kbuf = rng_np.standard_normal((HKV, CAP, D)).astype(np.float32)
    vbuf = rng_np.standard_normal((HKV, CAP, D)).astype(np.float32)
    out = attention.decode_attention(
        jnp.asarray(q), jnp.asarray(kbuf), jnp.asarray(vbuf), jnp.int32(LEN),
        scale=SCALE,
    )
    exp, _ = naive_attention(q, kbuf[:, :LEN], vbuf[:, :LEN], np.ones((1, LEN), bool))
    np.testing.assert_allclose(np.asarray(out), exp, rtol=2e-5, atol=2e-5)


def test_kv_cache_append_and_mask(rng_np):
    cache = kv_cache.init_cache(2, HKV, 16, D)
    assert cache.capacity == 16 and cache.num_layers == 2
    k_new = jnp.asarray(rng_np.standard_normal((HKV, 4, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng_np.standard_normal((HKV, 4, D)), jnp.bfloat16)
    kb, vb = kv_cache.layer_append(
        cache.k[0], cache.v[0], cache.length[0], k_new, v_new
    )
    np.testing.assert_array_equal(
        np.asarray(kb[:, :4].astype(jnp.float32)),
        np.asarray(k_new.astype(jnp.float32)),
    )
    mask = kv_cache.valid_mask(16, jnp.int32(4))
    assert np.asarray(mask).sum() == 4 and np.asarray(mask)[:4].all()


def test_select_and_compact_key_norms(rng_np):
    G, KEEP = 20, 6
    kg = rng_np.standard_normal((HKV, G, D)).astype(np.float32)
    vg = rng_np.standard_normal((HKV, G, D)).astype(np.float32)
    res = prune.select_and_compact(
        "key_norms_small", KEEP, jnp.asarray(kg), jnp.asarray(vg)
    )
    idx = np.asarray(res.indices)
    assert len(idx) == KEEP
    np.testing.assert_allclose(np.asarray(res.k_keep), kg[:, idx], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.v_keep), vg[:, idx], rtol=1e-6)
    # smallest key norms were kept
    norms = np.linalg.norm(np.transpose(kg, (1, 0, 2)).reshape(G, -1), axis=-1)
    assert set(idx.tolist()) == set(np.argsort(norms)[:KEEP].tolist())


def test_prune_append_roundtrip(rng_np):
    G, KEEP, CAP = 12, 4, 16
    cache = kv_cache.init_cache(1, HKV, CAP, D, dtype=jnp.float32)
    kg = jnp.asarray(rng_np.standard_normal((HKV, G, D)), jnp.float32)
    vg = jnp.asarray(rng_np.standard_normal((HKV, G, D)), jnp.float32)
    res = prune.select_and_compact("key_norms_small", KEEP, kg, vg)
    kb, vb = prune.prune_append_layer(
        cache.k[0], cache.v[0], cache.length[0], res
    )
    np.testing.assert_allclose(np.asarray(kb[:, :KEEP]), np.asarray(res.k_keep))
    # second append lands after the first
    kb2, vb2 = prune.prune_append_layer(kb, vb, jnp.int32(KEEP), res)
    np.testing.assert_allclose(np.asarray(kb2[:, KEEP:2 * KEEP]), np.asarray(res.k_keep))


class TestEffectiveTopK:
    """resolve_effective_top_k matches reference lvu/utils.py:231-255."""

    def test_top_p(self):
        cfg = LVUConfig(top_p=0.5)
        assert resolve_effective_top_k(cfg, 0, 28, 100) == 50
        cfg = LVUConfig(top_k=30, top_p=0.5)
        assert resolve_effective_top_k(cfg, 0, 28, 100) == 30

    def test_disabled(self):
        assert resolve_effective_top_k(LVUConfig(top_k=64, enable=False), 0, 28, 100) == 0
        assert resolve_effective_top_k(LVUConfig(), 0, 28, 100) == 0  # no k set
        # q_len <= k -> no pruning
        assert resolve_effective_top_k(LVUConfig(top_k=200), 0, 28, 100) == 0

    def test_decay(self):
        cfg = LVUConfig(top_k=64, top_k_decay_type="linear")
        assert resolve_effective_top_k(cfg, 14, 28, 1000) == 64 - int(64 * 14 / 28)
        cfg = LVUConfig(
            top_k=64, top_k_decay_type="exponential", top_k_decay_factor=0.5
        )
        assert resolve_effective_top_k(cfg, 2, 28, 1000) == 16

    def test_starting_layer(self):
        cfg = LVUConfig(top_k=64, top_k_starting_layer=5)
        assert resolve_effective_top_k(cfg, 3, 28, 1000) == 0
        assert resolve_effective_top_k(cfg, 7, 28, 1000) == 64

    def test_query_based_autoset(self):
        cfg = LVUConfig(top_k_predict_type="query_attention_weights")
        assert cfg.query_based
        cfg = LVUConfig()
        assert not cfg.query_based
