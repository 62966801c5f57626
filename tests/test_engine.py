"""Grouped-prefill engine tests on the tiny model.

Key invariants (SURVEY.md section 4 'Implication for the TPU build'):
  - grouped prefill with NO pruning produces the same next-token logits as
    the ungrouped full forward (the chunking itself is exact);
  - greedy decode from grouped prefill matches torch HF generate with no
    pruning;
  - pruned prefill (rho=0.5 key-norms) runs, shrinks the cache by the
    expected amount, and still decodes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quickvideo_tpu.config import LVUConfig
from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.prefill import LVUEngine, PrefillInputs

CFG = get_config("tiny")
GRID = (4, 16, 16)  # 4 temporal patches (8 frames), 8x8 merged -> 256 vid tokens
TOKENS_PER_TPATCH = (GRID[1] // 2) * (GRID[2] // 2)  # 64


def build_request(seed=1, n_pre=4, n_post=5, groups_t=(2, 2)):
    rng = np.random.default_rng(seed)
    t, h, w = GRID
    n_vid = t * (h // 2) * (w // 2)
    ids = np.concatenate([
        rng.integers(5, 900, n_pre),
        [CFG.vision_start_token_id],
        np.full(n_vid, CFG.video_token_id),
        [CFG.vision_end_token_id],
        rng.integers(5, 900, n_post),
    ]).astype(np.int64)
    s = t * h * w
    pixels = rng.standard_normal((s, CFG.vision.patch_input_dim)).astype(np.float32)
    # split pixels by temporal patches
    assert sum(groups_t) == t
    patches_per_t = h * w
    pixel_groups, group_grids, off = [], [], 0
    for tg in groups_t:
        n = tg * patches_per_t
        pixel_groups.append(pixels[off : off + n])
        group_grids.append((tg, h, w))
        off += n
    return ids, pixels, pixel_groups, group_grids


@pytest.fixture(scope="module")
def params():
    return qmodel.init_params(CFG, seed=0, dtype=jnp.float32)


def make_engine(params, **lvu_kw):
    lvu = LVUConfig(model_name_or_path="tiny", num_frames=8, **lvu_kw)
    return LVUEngine(params, CFG, lvu, dtype=jnp.float32)


class TestGroupedEqualsFull:
    def test_no_prune_logits_match_full_forward(self, params):
        ids, pixels, pixel_groups, group_grids = build_request()
        eng = make_engine(params, top_k=None, max_decode_tokens=8)
        inputs = PrefillInputs(
            input_ids=ids,
            video_grid_thw=GRID,
            pixel_groups=pixel_groups,
            group_grids=group_grids,
            second_per_grid_ts=2.0,
        )
        res = eng.generate(inputs, max_new_tokens=5)
        # oracle: ungrouped full forward; greedy continuation
        full_logits = np.asarray(
            qmodel.forward_full_sequence(
                params, CFG, ids, pixels=jnp.asarray(pixels),
                video_grid_thw=np.array([GRID]), second_per_grid_ts=[2.0],
            )
        )
        first_greedy = int(full_logits[-1].argmax())
        assert res.tokens[0] == first_greedy
        assert len(res.tokens) == 5
        assert res.cache_length == len(ids) + 4  # all tokens + KV of 4 fed-back tokens
        # (the final generated token's KV is never appended — nothing attends it)

    def test_single_vs_multi_group_same_tokens(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(params, top_k=None, max_decode_tokens=8)
        r2 = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=5,
        )
        eng1 = make_engine(params, top_k=None, max_decode_tokens=8)
        r1 = eng1.generate(
            PrefillInputs(ids, GRID, [pixels], [GRID], 2.0), max_new_tokens=5
        )
        np.testing.assert_array_equal(r1.tokens, r2.tokens)


class TestPrunedPrefill:
    def test_keynorm_prune_cache_shrinks(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(params, top_p=0.5, max_decode_tokens=8)
        inputs = PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0)
        res = eng.generate(inputs, max_new_tokens=4)
        # each group: 2 temporal patches * 64 = 128 video tokens; group 0 has
        # +5 prefix tokens. keep = int(q_len * 0.5)
        g0_in = 128 + 5
        keep0 = int(g0_in * 0.5)
        keep1 = int(128 * 0.5)
        suffix = 6  # vision_end + 5 post tokens
        expected = keep0 + keep1 + suffix + 3
        assert res.cache_length == expected
        assert len(res.tokens) == 4

    def test_topk_absolute(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(params, top_k=32, max_decode_tokens=8)
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=3,
        )
        assert res.cache_length == 32 + 32 + 6 + 2

    def test_decay_linear_unrolled_path(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(
            params, top_k=32, top_k_decay_type="linear", max_decode_tokens=8
        )
        assert not eng._uniform()
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=2,
        )
        # layer 0 keeps 32; deeper layers keep fewer; max over layers = 32
        assert res.cache_length == 32 + 32 + 6 + 1
        assert len(res.tokens) == 2

    def test_cascade_with_query_based_predictor(self, params):
        """Cascade activation pruning + query-based predictor: the unrolled
        path must carry the appended prompt rows through each layer's shrink
        (ADVICE r1: previously crashed at trace time with a broadcast error
        because x[indices] dropped the prompt tail)."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(
            params,
            top_k=16,
            top_k_predict_type="query_attention_weights",
            prefill_prune_starting_layer=0,
            max_decode_tokens=8,
        )
        assert eng.lvu.query_based and not eng._uniform()
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=2,
        )
        assert res.cache_length == 16 + 16 + 6 + 1
        assert len(res.tokens) == 2

    def test_query_based_runs(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(
            params,
            top_k=16,
            top_k_predict_type="query_attention_weights",
            max_decode_tokens=8,
        )
        assert eng.lvu.query_based
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=2,
        )
        assert res.cache_length == 16 + 16 + 6 + 1


class TestGenerateVsTorch:
    def test_greedy_matches_hf_generate(self, params):
        torch = pytest.importorskip("torch")
        from tests.test_model_parity import make_hf_config
        from transformers import Qwen2_5_VLForConditionalGeneration
        from quickvideo_tpu.models.qwen25_vl.load import params_from_torch_model

        torch.manual_seed(0)
        hf = Qwen2_5_VLForConditionalGeneration(make_hf_config()).eval().float()
        jx = params_from_torch_model(hf, CFG, dtype=jnp.float32)

        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        with torch.no_grad():
            out_t = hf.generate(
                input_ids=torch.tensor(ids)[None],
                pixel_values_videos=torch.tensor(pixels),
                video_grid_thw=torch.tensor([list(GRID)]),
                second_per_grid_ts=torch.tensor([2.0]),
                attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                max_new_tokens=6,
                do_sample=False,
            )[0, len(ids):].numpy()

        eng = LVUEngine(
            jx, CFG, LVUConfig(model_name_or_path="tiny", top_k=None,
                               max_decode_tokens=8),
            dtype=jnp.float32,
        )
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=6,
        )
        np.testing.assert_array_equal(res.tokens, out_t)


class TestFinalPromptPruning:
    def test_do_top_k_for_query(self, params):
        """Pruning toggled during generate (reference qwen25_vl.py:537-540):
        the suffix prompt's KV is pruned when do_top_k_for_query is set and
        top_k < suffix length."""
        ids, pixels, pixel_groups, group_grids = build_request(
            groups_t=(2, 2), n_post=9
        )
        eng = make_engine(
            params, top_k=4, do_top_k_for_query=True, max_decode_tokens=8
        )
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=2,
        )
        # groups keep 4 each; suffix (vision_end + 9 text = 10 tokens) is
        # pruned to 4 as well; +2 decoded
        assert res.cache_length == 4 + 4 + 4 + 1

    def test_do_top_k_for_query_query_based(self, params):
        """Query-based predictor + do_top_k_for_query: the final prompt has
        no separate query, so the predictor falls back to within-group
        attention column sums (the reference's assert at lvu/utils.py:56-59
        makes this combination unusable there; we generalize instead)."""
        ids, pixels, pixel_groups, group_grids = build_request(
            groups_t=(2, 2), n_post=9
        )
        eng = make_engine(
            params, top_k=4, do_top_k_for_query=True, max_decode_tokens=8,
            top_k_predict_type="query_attention_weights",
        )
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=2,
        )
        assert res.cache_length == 4 + 4 + 4 + 1

    def test_no_query_prune_by_default(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(
            groups_t=(2, 2), n_post=9
        )
        eng = make_engine(params, top_k=4, max_decode_tokens=8)
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=2,
        )
        assert res.cache_length == 4 + 4 + 10 + 1


class TestSampling:
    def test_sampling_filters_shapes(self, params):
        import jax.numpy as jnp
        from quickvideo_tpu.prefill.engine import LVUEngine

        logits = jnp.asarray(
            np.log(np.array([0.5, 0.25, 0.15, 0.06, 0.04], np.float32))
        )
        # top_k=2 keeps exactly the top 2
        f = LVUEngine._filter_logits(logits, top_k=2)
        kept = np.isfinite(np.asarray(f))
        assert kept.tolist() == [True, True, False, False, False]
        # top_p=0.7 keeps the smallest prefix with cum prob >= 0.7 -> {0, 1}
        f = LVUEngine._filter_logits(logits, top_p=0.7)
        kept = np.isfinite(np.asarray(f))
        assert kept.tolist() == [True, True, False, False, False]
        # top_p=0.95 keeps four
        f = LVUEngine._filter_logits(logits, top_p=0.95)
        assert np.isfinite(np.asarray(f)).sum() == 4

    def test_do_sample_runs(self, params):
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(params, top_k=16, max_decode_tokens=8)
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=4, greedy=False, temperature=0.8, top_p=0.9,
        )
        assert len(res.tokens) == 4

    def test_sample_on_host_legacy_path(self, params):
        """sample_on_device=False: per-token host sampling (one dispatch per
        token) still works and respects max_new_tokens."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(
            params, top_k=16, max_decode_tokens=8, sample_on_device=False
        )
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=4, greedy=False, temperature=0.8, top_p=0.9,
        )
        assert len(res.tokens) == 4
        # token ids are in-vocab
        assert all(0 <= t < eng.cfg.text.vocab_size for t in res.tokens)


class TestDecodeChunkEos:
    def test_eos_mid_chunk_stops(self, params):
        """EOS appearing inside a decoded chunk truncates the output."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(params, top_k=None, max_decode_tokens=16)
        # first run to learn which tokens come out greedily
        probe = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=6,
        )
        if len(probe.tokens) < 3:
            pytest.skip("degenerate greedy sequence")
        eos = int(probe.tokens[2])
        eng2 = make_engine(params, top_k=None, max_decode_tokens=16)
        res = eng2.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=6, eos_token_ids=[eos],
        )
        assert list(res.tokens) == list(probe.tokens[:3])


class TestNonAdaptiveLocalAttention:
    def test_local_attention_mode(self, params):
        """adaptive_local_attention=False: groups attend only within
        themselves (reference qwen25_vl.py:502-516 merge path) but KV still
        accumulates for the final prompt."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng = make_engine(
            params, top_k=16, adaptive_local_attention=False,
            max_decode_tokens=8,
        )
        res = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=3,
        )
        assert res.cache_length == 16 + 16 + 6 + 2
        # differs from the adaptive mode's output (later groups see the past)
        eng2 = make_engine(params, top_k=16, max_decode_tokens=8)
        res2 = eng2.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=3,
        )
        assert res.cache_length == res2.cache_length

    def test_query_based_local_attention_honored(self):
        """Regression: layer_step's query-based branch (prompt_len > 0) must
        honor attend_past=False — with a non-empty past, local-only output
        equals the empty-past output and differs from the attend-past one."""
        import dataclasses

        from quickvideo_tpu.models.qwen25_vl import language as lang
        from quickvideo_tpu.models.qwen25_vl.language import StepSpec
        from quickvideo_tpu.ops import kv_cache as kvc

        T = CFG.text
        key = jax.random.PRNGKey(0)
        lparams = lang.init_language_params(T, key, dtype=jnp.float32)
        lp = jax.tree.map(lambda a: a[0], lparams["layers"])
        q_len, prompt_len, past = 12, 4, 8
        x = jax.random.normal(
            jax.random.PRNGKey(1), (q_len, T.hidden_size), jnp.float32
        )
        cos = jnp.ones((q_len, T.head_dim), jnp.float32)
        sin = jnp.zeros((q_len, T.head_dim), jnp.float32)
        cache = kvc.init_cache(
            T.num_hidden_layers, T.num_key_value_heads, 64, T.head_dim,
            dtype=jnp.float32,
        )
        k_all = jax.random.normal(
            jax.random.PRNGKey(2), cache.k.shape, jnp.float32
        )
        v_all = jax.random.normal(
            jax.random.PRNGKey(3), cache.v.shape, jnp.float32
        )
        spec_on = StepSpec(
            cfg=T, q_len=q_len, keep_k=0, prompt_len=prompt_len,
            predict_type="query_attention_weights", attn_impl="xla",
        )
        spec_off = dataclasses.replace(spec_on, attend_past=False)
        rng = jax.random.PRNGKey(4)

        def run(spec, length):
            out = lang.layer_step(
                lp, x, cos, sin, k_all, v_all, jnp.int32(length), rng, spec
            )
            return np.asarray(out[0])

        out_on = run(spec_on, past)
        out_off = run(spec_off, past)
        out_empty = run(spec_on, 0)
        assert not np.allclose(out_on, out_off)
        np.testing.assert_allclose(out_off, out_empty, rtol=1e-5, atol=1e-5)

    def test_local_equals_adaptive_for_single_group(self, params):
        """With one group there is no past — both modes identical."""
        ids, pixels, _, _ = build_request(groups_t=(4,))
        for mode in (True, False):
            eng = make_engine(
                params, top_k=None, adaptive_local_attention=mode,
                max_decode_tokens=8,
            )
            r = eng.generate(
                PrefillInputs(ids, GRID, [pixels], [GRID], 2.0),
                max_new_tokens=4,
            )
            if mode:
                ref_tokens = r.tokens
        np.testing.assert_array_equal(r.tokens, ref_tokens)


class TestInt8KVCache:
    def test_int8_cache_close_to_bf16(self, params):
        """int8 KV prefill+decode: sane outputs, correct cache accounting,
        and logits close to the full-precision run."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng16 = make_engine(params, top_k=32, max_decode_tokens=8)
        r16 = eng16.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=4,
        )
        eng8 = make_engine(
            params, top_k=32, max_decode_tokens=8, kv_cache_dtype="int8"
        )
        r8 = eng8.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=4,
        )
        assert r8.cache_length == r16.cache_length
        assert r8.kv_cache_bytes < r16.kv_cache_bytes * 0.55
        # greedy tokens usually survive 8-bit KV; require the first to match
        assert r8.tokens[0] == r16.tokens[0]

    def test_int8k_cache_close_to_bf16(self, params):
        """K-only int8 cache ("int8k"): K int8 + scales, V stays bf16 —
        correct accounting (between int8 and bf16 sizes) and tokens close
        to the full-precision run (strictly less rounding than int8)."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        eng16 = make_engine(params, top_k=32, max_decode_tokens=8)
        r16 = eng16.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=4,
        )
        from quickvideo_tpu.ops.kv_cache import init_cache

        c = init_cache(2, 2, 64, 16, dtype=jnp.bfloat16, quantized="k")
        assert c.k.dtype == jnp.int8 and c.v.dtype == jnp.bfloat16
        assert c.k_scale is not None and c.v_scale is None
        eng8k = make_engine(
            params, top_k=32, max_decode_tokens=8, kv_cache_dtype="int8k"
        )
        r8k = eng8k.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=4,
        )
        assert r8k.cache_length == r16.cache_length
        # between the full-int8 (~0.52x) and bf16 (1.0x) cache footprints
        assert r16.kv_cache_bytes * 0.55 < r8k.kv_cache_bytes \
            < r16.kv_cache_bytes * 0.85
        assert r8k.tokens[0] == r16.tokens[0]

    def test_quantize_roundtrip(self):
        import jax.numpy as jnp
        from quickvideo_tpu.ops.kv_cache import dequantize_kv, quantize_kv

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 16, 12)) * 3,
            jnp.float32,
        )
        q, s = quantize_kv(x)
        back = dequantize_kv(q, s)
        rel = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(
            np.asarray(x)
        ).max()
        assert rel < 0.01  # 1/127 rounding


class TestOccupancyAccounting:
    def test_logical_len_tracks_max_layer_with_decay(self, params):
        """active_cap buckets derive from host-side occupancy tracking; a
        decay schedule whose deep layers resolve to top_k=0 appends the FULL
        group there, so the tracker must follow the max over layers (the
        regression: it advanced by layer-0's keep only, and a bucket below a
        deep layer's real occupancy silently truncates its attention)."""
        ids, pixels, pixel_groups, group_grids = build_request(groups_t=(2, 2))
        # exponential decay 0.25: layer0 keep=32, deeper layers hit 0 (=keep all)
        eng = make_engine(
            params, top_k=32, top_k_decay_type="exponential",
            top_k_decay_factor=0.25, max_decode_tokens=8,
        )
        assert not eng._uniform()
        from quickvideo_tpu.prefill.engine import PrefillInputs as PI

        cache, state = eng.prefill(
            PI(ids, GRID, pixel_groups, group_grids, 2.0)
        )
        per_layer = np.asarray(cache.length)
        assert per_layer.max() > per_layer.min()  # schedule diverges layers
        assert state["cache_len"] == int(per_layer.max()), (
            state["cache_len"], per_layer.tolist()
        )


class TestDecodeEarlyExit:
    def test_post_eos_steps_skip_cache_writes(self, params):
        """Once EOS appears in a decode chunk, remaining steps take the
        no-op branch: no KV appends, outputs pinned to the EOS token."""
        import jax.numpy as jnp
        from quickvideo_tpu.models.qwen25_vl.language import StepSpec
        from quickvideo_tpu.models.qwen25_vl.rope import (
            precompute_mrope_cos_sin_device, text_positions,
        )
        from quickvideo_tpu.ops import kv_cache as kvc

        t = CFG.text
        eng = make_engine(params, top_k=None, max_decode_tokens=32)
        cache = kvc.init_cache(
            t.num_hidden_layers, t.num_key_value_heads, 4096, t.head_dim,
            dtype=jnp.float32,
        )
        cache = cache.replace(
            length=jnp.full((t.num_hidden_layers,), 7, jnp.int32)
        )
        pos = text_positions(7, 64)
        cos, sin = precompute_mrope_cos_sin_device(
            jnp.asarray(pos, jnp.int32), t.head_dim, t.mrope_section,
            t.rope_theta,
        )
        spec = StepSpec(cfg=t, q_len=1, keep_k=0)
        # free-running chunk (no EOS): find what token step 0 produces
        no_eos = jnp.asarray([-1], jnp.int32)
        import jax
        _, toks_free = eng._decode_chunk_jit(
            # deep-copy: the jit donates the cache buffers
            params["language"], jax.tree.map(jnp.copy, cache), jnp.int32(1),
            cos[:32], sin[:32], no_eos, jnp.int32(32), spec=spec,
        )
        first = int(np.asarray(toks_free)[0])
        # now make that token EOS: step 0 executes, steps 1..31 skip
        cache2, toks = eng._decode_chunk_jit(
            params["language"], cache, jnp.int32(1), cos[:32], sin[:32],
            jnp.asarray([first], jnp.int32), jnp.int32(32), spec=spec,
        )
        out = np.asarray(toks)
        assert out[0] == first
        assert (out[1:] == first).all()  # pinned, not decoded
        # only ONE step appended KV
        np.testing.assert_array_equal(np.asarray(cache2.length), 7 + 1)



class TestStreamingDecode:
    """on_tokens chunked decode == single-dispatch decode, token for token
    (same jitted bodies, different host loop)."""

    def test_greedy_stream_matches_single_dispatch(self, params):
        ids, pixels, pixel_groups, group_grids = build_request()
        eng = make_engine(params, top_k=None, max_decode_tokens=8)
        ref = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=7,
        )
        chunks = []
        eng2 = make_engine(
            params, top_k=None, max_decode_tokens=8, stream_chunk_tokens=2
        )
        got = eng2.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=7, on_tokens=chunks.append,
        )
        np.testing.assert_array_equal(ref.tokens, got.tokens)
        flat = [t for c in chunks for t in c]
        np.testing.assert_array_equal(flat, got.tokens)
        # chunked: first token callback + ceil(6 / 2) chunks (EOS may cut
        # the run short on random weights, so only bound it)
        assert len(chunks) >= 2

    def test_sampled_stream_matches_single_dispatch(self, params):
        ids, pixels, pixel_groups, group_grids = build_request()
        kw = dict(top_k=None, max_decode_tokens=8, sample_on_device=True)
        eng = make_engine(params, **kw)
        ref = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=7, greedy=False, temperature=0.8, top_p=0.9,
        )
        chunks = []
        eng2 = make_engine(params, stream_chunk_tokens=2, **kw)
        got = eng2.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=7, greedy=False, temperature=0.8, top_p=0.9,
            on_tokens=chunks.append,
        )
        # both engines start from PRNGKey(0): the chunked sampler splits
        # the SAME rng stream once per chunk instead of once total, so
        # token equality is not expected — only stream consistency
        flat = [t for c in chunks for t in c]
        np.testing.assert_array_equal(flat, got.tokens)
        assert len(got.tokens) >= 1 and len(ref.tokens) >= 1

    def test_stream_stops_at_eos_mid_chunk(self, params):
        """EOS inside a chunk: the stream must stop there and never emit
        the while_loop's EOS-fill values from the unvisited tail slots."""
        ids, pixels, pixel_groups, group_grids = build_request()
        # find the natural greedy continuation first
        probe = make_engine(params, top_k=None, max_decode_tokens=8)
        free = probe.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=6,
        )
        toks = [int(t) for t in free.tokens]
        if len(toks) < 3:
            pytest.skip("random-weight run ended too early to test")
        # declare the 3rd token EOS: it lands mid-chunk at chunk size 4
        eos = toks[2]
        chunks = []
        eng = make_engine(
            params, top_k=None, max_decode_tokens=8, stream_chunk_tokens=4
        )
        got = eng.generate(
            PrefillInputs(ids, GRID, pixel_groups, group_grids, 2.0),
            max_new_tokens=6, eos_token_ids=[eos],
            on_tokens=chunks.append,
        )
        out = [int(t) for t in got.tokens]
        assert out == toks[:3]  # stopped AT the declared EOS, inclusive
        flat = [t for c in chunks for t in c]
        assert flat == out  # stream saw exactly the same, nothing extra


# -- kv_cache_dtype="auto" resolution ---------------------------------------


def test_auto_kv_dtype_thresholds():
    """Pins the measured auto-selection rule (BENCH_RESULTS.md round 4):
    bf16 at demo scale (<=64k planned slots, fits HBM), int8 above 64k slots
    (hour-scale KV-bandwidth inversion) or when bf16 would not fit beside
    the weights."""
    from quickvideo_tpu.config import resolve_auto_kv_dtype

    t7b = get_config("qwen25-vl-7b").text
    w7b_int8 = 9 << 30  # ~int8 7B weights
    hbm = 16 << 30
    # demo scale: 1024-frame strict run plans ~53k slots -> bf16
    assert resolve_auto_kv_dtype(53248, t7b, w7b_int8, hbm) == "bfloat16"
    # exactly at the threshold stays bf16 (7B bf16 cache at 64k = 3.8 GB)
    assert resolve_auto_kv_dtype(65536, t7b, w7b_int8, hbm) == "bfloat16"
    # hour scale: 2^17 slots -> int8 (bandwidth inversion AND memory)
    assert resolve_auto_kv_dtype(131072, t7b, w7b_int8, hbm) == "int8"
    # memory-bound even at small capacity: bf16-weights 7B (15.5 GB)
    assert resolve_auto_kv_dtype(32768, t7b, 15 << 30, hbm) == "int8"


def test_auto_kv_dtype_engine_resolution(params):
    """Engine-level: 'auto' resolves to a concrete dtype recorded in the
    request state, and the cache arrays match it (tiny model on CPU always
    resolves bf16 — tiny weights, tiny capacity)."""
    eng = make_engine(params, top_k=32, kv_cache_dtype="auto")
    ids, _, pixel_groups, group_grids = build_request()
    inputs = PrefillInputs(
        input_ids=ids, video_grid_thw=GRID, pixel_groups=pixel_groups,
        group_grids=group_grids,
    )
    cache, state = eng.prefill(inputs)
    assert state["kv_dtype"] == "bfloat16"
    assert cache.k_scale is None
    # forced hour-scale conditions flip the engine's resolution to int8
    import os

    os.environ["QV_HBM_GB"] = "0.00001"
    try:
        assert eng.resolve_kv_dtype(4096) == "int8"
    finally:
        del os.environ["QV_HBM_GB"]
    assert eng.resolve_kv_dtype(131072) == "int8"
