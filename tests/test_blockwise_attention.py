"""Blockwise (online-softmax) past-buffer attention matches the single-shot
oracle, including garbage beyond the valid length and empty caches."""

import numpy as np
import jax
import jax.numpy as jnp

from quickvideo_tpu.ops import attention

HQ, HKV, D, G = 4, 2, 16, 8
SCALE = D ** -0.5


def mk(rng_np, cap):
    q = rng_np.standard_normal((HQ, G, D)).astype(np.float32)
    k = rng_np.standard_normal((HKV, cap, D)).astype(np.float32)
    v = rng_np.standard_normal((HKV, cap, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def oracle(q, k, v, length):
    cap = k.shape[1]
    g = q.shape[1]
    mask = jnp.broadcast_to(jnp.arange(cap)[None] < length, (g, cap))
    return attention._partial_attention(q, k, v, mask, SCALE)


def test_blockwise_matches_oracle(rng_np):
    cap = 2500  # not a multiple of block size -> exercises padding
    q, k, v = mk(rng_np, cap)
    for length in (0, 1, 137, 1024, 2499, 2500):
        bw = attention._blockwise_partial_attention(
            q, k, v, jnp.int32(length), SCALE, block=512
        )
        ref = oracle(q, k, v, jnp.int32(length))
        np.testing.assert_allclose(bw.out, ref.out, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(bw.lse), np.asarray(ref.lse), rtol=2e-5, atol=2e-4
        )


def test_dispatch_threshold(rng_np):
    # large capacity routes through blockwise; result identical either way
    cap = attention.BLOCKWISE_THRESHOLD
    q, k, v = mk(rng_np, cap)
    pp = attention.past_partial_attention(q, k, v, jnp.int32(100), G, SCALE)
    ref = oracle(q, k, v, jnp.int32(100))
    np.testing.assert_allclose(pp.out, ref.out, rtol=2e-5, atol=2e-5)


def test_grouped_attention_large_cache_end_to_end(rng_np):
    cap = 5000
    q, k, v = mk(rng_np, cap)
    kg = jnp.asarray(rng_np.standard_normal((HKV, G, D)).astype(np.float32))
    vg = jnp.asarray(rng_np.standard_normal((HKV, G, D)).astype(np.float32))
    out, probs = attention.grouped_attention(
        q, kg, vg, k, v, jnp.int32(3000), scale=SCALE, return_group_probs=True
    )
    # oracle: concat
    kcat = jnp.concatenate([k[:, :3000], kg], axis=1)
    vcat = jnp.concatenate([v[:, :3000], vg], axis=1)
    mask = jnp.ones((G, 3000 + G), bool)
    mask = mask.at[:, 3000:].set(jnp.tril(jnp.ones((G, G), bool)))
    ref = attention._partial_attention(q, kcat, vcat, mask, SCALE)
    np.testing.assert_allclose(out, ref.out, rtol=2e-5, atol=2e-5)
    assert probs.shape == (G, G)
