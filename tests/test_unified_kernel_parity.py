"""Unified Pallas path (interpret mode) vs the XLA path at the prefill-step
level: identical numerics for bf16-cache mode, including attn-stats
predictors; int8 mode consistent within quantization noise."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl.language import (
    StepSpec,
    init_language_params,
    prefill_step,
)
from quickvideo_tpu.ops import kv_cache as kvc

CFG = get_config("tiny").text
G, KEEP, CAP = 128, 32, 512


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("QV_PALLAS_INTERPRET", "1")


@pytest.fixture(scope="module")
def setup():
    params = init_language_params(CFG, jax.random.key(0), jnp.float32)
    x = jax.random.normal(jax.random.key(1), (G, CFG.hidden_size), jnp.float32)
    cos = jnp.ones((G, CFG.head_dim), jnp.float32)
    sin = jnp.zeros_like(cos)
    return params, x, cos, sin


def run_two_groups(setup, impl, quant=False, **spec_kw):
    params, x, cos, sin = setup
    cache = kvc.init_cache(
        CFG.num_hidden_layers, CFG.num_key_value_heads, CAP, CFG.head_dim,
        dtype=jnp.float32, quantized=quant,
    )
    spec = StepSpec(
        cfg=CFG, q_len=G, keep_k=KEEP, attn_impl=impl, kv_quant=quant,
        **spec_kw,
    )
    cache, _ = prefill_step(params, cache, x, cos, sin, jax.random.key(2), spec)
    cache, h = prefill_step(params, cache, x, cos, sin, jax.random.key(3), spec)
    return np.asarray(h), cache


def test_unified_pallas_matches_xla(setup):
    h_x, c_x = run_two_groups(setup, "xla")
    h_p, c_p = run_two_groups(setup, "pallas")
    np.testing.assert_allclose(h_p, h_x, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(c_p.k[:, :, :2 * KEEP]), np.asarray(c_x.k[:, :, :2 * KEEP]),
        rtol=3e-5, atol=3e-5,
    )


def test_unified_pallas_attn_stats_predictor(setup):
    kw = dict(needs_probs=True, predict_type="attention_weights_sum")
    h_x, _ = run_two_groups(setup, "xla", **kw)
    h_p, _ = run_two_groups(setup, "pallas", **kw)
    np.testing.assert_allclose(h_p, h_x, rtol=3e-5, atol=3e-5)


def test_int8_quant_consistent(setup):
    h16, _ = run_two_groups(setup, "xla", quant=False)
    h8, c8 = run_two_groups(setup, "xla", quant=True)
    assert c8.quantized
    rel = np.abs(h8 - h16).max() / np.abs(h16).max()
    assert rel < 0.05, rel
