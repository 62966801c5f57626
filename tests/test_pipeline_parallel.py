"""Pipeline parallelism vs the single-device stack, on the virtual CPU mesh.

The skewed-pipeline video prefill (parallel/pipeline.py run_groups) and the
sequential all-stage chunk pass (chunk) must reproduce prefill_step's cache
contents, per-layer lengths, and output hidden states for pp in {2, 4},
including pruning and the int8 KV cache."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl.config import TextConfig
from quickvideo_tpu.models.qwen25_vl.language import (
    StepSpec,
    init_language_params,
    prefill_step,
)
from quickvideo_tpu.ops import kv_cache as kvc
from quickvideo_tpu.parallel.pipeline import PipelinedStack, make_pp_mesh

CFG = TextConfig(
    vocab_size=128,
    hidden_size=48,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    mrope_section=(2, 2, 2),
)
GQ, KEEP, CAP = 32, 8, 256
RNG = jax.random.key(7)


@pytest.fixture(scope="module")
def params():
    return init_language_params(CFG, jax.random.key(0), jnp.float32)


def make_groups(n, q_len=GQ, seed=1):
    ks = jax.random.split(jax.random.key(seed), 3 * n)
    xs, coss, sins = [], [], []
    for i in range(n):
        xs.append(jax.random.normal(ks[3 * i], (q_len, CFG.hidden_size),
                                    jnp.float32))
        # distinct rotary tables per group (positions advance)
        coss.append(jnp.cos(
            jax.random.uniform(ks[3 * i + 1], (q_len, CFG.head_dim))
        ))
        sins.append(jnp.sin(
            jax.random.uniform(ks[3 * i + 2], (q_len, CFG.head_dim))
        ))
    return xs, coss, sins


def ref_run(params, groups, spec, chunk=None, chunk_spec=None, quant=False):
    """Single-device oracle: sequential prefill_step over groups (+ one
    final chunk), same fixed rng as the pipelined run."""
    cache = kvc.init_cache(
        CFG.num_hidden_layers, CFG.num_key_value_heads, CAP, CFG.head_dim,
        dtype=jnp.float32, quantized=quant,
    )
    h = None
    for x, cos, sin in zip(*groups):
        cache, h = prefill_step(params, cache, x, cos, sin, RNG, spec)
    if chunk is not None:
        cache, h = prefill_step(params, cache, *chunk, RNG, chunk_spec)
    return cache, h


def pp_run(params, groups, spec, pp, chunk=None, chunk_spec=None,
           quant=False):
    mesh = make_pp_mesh(pp)
    stack = PipelinedStack(
        mesh, CFG, params["layers"], CAP, dtype=jnp.float32,
        quantized=quant, rng=RNG,
    )
    stack.run_groups(*groups, spec=spec)
    h = None
    if chunk is not None:
        h = stack.chunk(*chunk, spec=chunk_spec)
    return stack.gather_cache(), h


def assert_cache_equal(c_pp, c_ref, quant=False, tol=1e-5):
    np.testing.assert_array_equal(
        np.asarray(c_pp.length), np.asarray(c_ref.length)
    )
    n = int(np.max(np.asarray(c_ref.length)))
    for li in range(CFG.num_hidden_layers):
        ln = int(np.asarray(c_ref.length)[li])
        if quant:
            np.testing.assert_array_equal(
                np.asarray(c_pp.k)[li, :, :ln], np.asarray(c_ref.k)[li, :, :ln]
            )
            np.testing.assert_allclose(
                np.asarray(c_pp.k_scale)[li, :, :ln],
                np.asarray(c_ref.k_scale)[li, :, :ln], rtol=tol, atol=tol,
            )
        else:
            np.testing.assert_allclose(
                np.asarray(c_pp.k)[li, :, :ln],
                np.asarray(c_ref.k)[li, :, :ln], rtol=tol, atol=tol,
            )
            np.testing.assert_allclose(
                np.asarray(c_pp.v)[li, :, :ln],
                np.asarray(c_ref.v)[li, :, :ln], rtol=tol, atol=tol,
            )


@pytest.mark.parametrize("pp,n_groups", [(2, 4), (4, 6), (4, 2)])
def test_pp_prefill_matches_single_device(params, pp, n_groups):
    """Skewed pipeline over n_groups (including n_groups < pp: the pipeline
    is mostly bubble but must still be correct), with pruning active."""
    groups = make_groups(n_groups)
    spec = StepSpec(cfg=CFG, q_len=GQ, keep_k=KEEP, attn_impl="xla")
    c_ref, _ = ref_run(params, groups, spec)
    c_pp, _ = pp_run(params, groups, spec, pp)
    assert_cache_equal(c_pp, c_ref)


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_chunk_matches_single_device(params, pp):
    """Prompt/suffix chunk after the pipelined video prefill: appended rows
    and the output hidden states (the logits input) must match."""
    groups = make_groups(3)
    spec = StepSpec(cfg=CFG, q_len=GQ, keep_k=KEEP, attn_impl="xla")
    cq, ccos, csin = make_groups(1, q_len=16, seed=9)
    chunk = (cq[0], ccos[0], csin[0])
    chunk_spec = StepSpec(cfg=CFG, q_len=16, keep_k=0, attn_impl="xla")
    c_ref, h_ref = ref_run(params, groups, spec, chunk, chunk_spec)
    c_pp, h_pp = pp_run(params, groups, spec, pp, chunk, chunk_spec)
    assert_cache_equal(c_pp, c_ref)
    np.testing.assert_allclose(
        np.asarray(h_pp), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("pp", [2])
def test_pp_decode_like_chunks(params, pp):
    """Repeated single-row chunks (decode pattern): each pass appends one
    row per layer and returns hidden states matching the oracle."""
    groups = make_groups(2)
    spec = StepSpec(cfg=CFG, q_len=GQ, keep_k=KEEP, attn_impl="xla")
    mesh = make_pp_mesh(pp)
    stack = PipelinedStack(mesh, CFG, params["layers"], CAP,
                           dtype=jnp.float32, rng=RNG)
    stack.run_groups(*groups, spec=spec)

    cache_ref, _ = ref_run(params, groups, spec)
    dspec = StepSpec(cfg=CFG, q_len=1, keep_k=0, attn_impl="xla",
                     causal=False)
    xq, xcos, xsin = make_groups(3, q_len=1, seed=11)
    for x, cos, sin in zip(xq, xcos, xsin):
        h_pp = stack.chunk(x, cos, sin, spec=dspec)
        cache_ref, h_ref = prefill_step(
            params, cache_ref, x, cos, sin, RNG, dspec
        )
        np.testing.assert_allclose(
            np.asarray(h_pp), np.asarray(h_ref), rtol=1e-5, atol=1e-5
        )
    assert_cache_equal(stack.gather_cache(), cache_ref)


def test_pp_int8_kv(params):
    """int8 KV cache: quantized slabs + per-row scales shard with the stage
    and reproduce the single-device int8 run."""
    groups = make_groups(3)
    spec = StepSpec(cfg=CFG, q_len=GQ, keep_k=KEEP, attn_impl="xla",
                    kv_quant=True)
    c_ref, _ = ref_run(params, groups, spec, quant=True)
    c_pp, _ = pp_run(params, groups, spec, 2, quant=True)
    assert_cache_equal(c_pp, c_ref, quant=True)


def test_pp_int8k_kv(params):
    """K-only int8 cache ("int8k"): int8 K slab + scales, float V slab —
    the mixed mode must reproduce the single-device run exactly (int8 K
    payloads byte-equal, V within float tolerance)."""
    groups = make_groups(3)
    spec = StepSpec(cfg=CFG, q_len=GQ, keep_k=KEEP, attn_impl="xla",
                    kv_quant="k")
    c_ref, _ = ref_run(params, groups, spec, quant="k")
    c_pp, _ = pp_run(params, groups, spec, 2, quant="k")
    assert c_pp.k.dtype == jnp.int8 and c_pp.v.dtype == jnp.float32
    assert c_pp.v_scale is None and c_ref.v_scale is None
    np.testing.assert_array_equal(
        np.asarray(c_pp.length), np.asarray(c_ref.length)
    )
    for li in range(CFG.num_hidden_layers):
        ln = int(np.asarray(c_ref.length)[li])
        np.testing.assert_array_equal(
            np.asarray(c_pp.k)[li, :, :ln], np.asarray(c_ref.k)[li, :, :ln]
        )
        np.testing.assert_allclose(
            np.asarray(c_pp.k_scale)[li, :, :ln],
            np.asarray(c_ref.k_scale)[li, :, :ln], rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(c_pp.v)[li, :, :ln],
            np.asarray(c_ref.v)[li, :, :ln], rtol=1e-5, atol=1e-5,
        )


def test_pp_rejects_bad_layer_split(params):
    mesh = make_pp_mesh(3)
    with pytest.raises(ValueError, match="divisible"):
        PipelinedStack(mesh, CFG, params["layers"], CAP)
