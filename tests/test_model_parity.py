"""Numerics parity vs the installed torch transformers Qwen2.5-VL on a tiny
random-weight config: rope indices, vision tower, language decoder, and full
forward logits. This is the build's substitute for the reference's
'compare against HF' implicit contract (the reference IS HF + patches)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Qwen2_5_VLForConditionalGeneration
from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
    Qwen2_5_VLConfig,
)

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.models.qwen25_vl.load import params_from_torch_model

CFG = get_config("tiny")


def make_hf_config():
    return Qwen2_5_VLConfig(
        vision_config=dict(
            depth=CFG.vision.depth,
            hidden_size=CFG.vision.hidden_size,
            intermediate_size=CFG.vision.intermediate_size,
            num_heads=CFG.vision.num_heads,
            patch_size=CFG.vision.patch_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            temporal_patch_size=CFG.vision.temporal_patch_size,
            tokens_per_second=CFG.vision.tokens_per_second,
            window_size=CFG.vision.window_size,
            fullatt_block_indexes=list(CFG.vision.fullatt_block_indexes),
            out_hidden_size=CFG.vision.out_hidden_size,
            in_channels=CFG.vision.in_channels,
        ),
        text_config=dict(
            vocab_size=CFG.text.vocab_size,
            hidden_size=CFG.text.hidden_size,
            intermediate_size=CFG.text.intermediate_size,
            num_hidden_layers=CFG.text.num_hidden_layers,
            num_attention_heads=CFG.text.num_attention_heads,
            num_key_value_heads=CFG.text.num_key_value_heads,
            rope_theta=CFG.text.rope_theta,
            rms_norm_eps=CFG.text.rms_norm_eps,
            rope_scaling={
                "type": "mrope",
                "mrope_section": list(CFG.text.mrope_section),
            },
            max_position_embeddings=32768,
            tie_word_embeddings=False,
        ),
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        vision_end_token_id=CFG.vision_end_token_id,
    )


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = make_hf_config()
    m = Qwen2_5_VLForConditionalGeneration(cfg)
    m = m.eval().float()
    return m


@pytest.fixture(scope="module")
def jx_params(hf_model):
    return params_from_torch_model(hf_model, CFG, dtype=jnp.float32)


def build_sequence(grid_thw, n_text_pre=5, n_text_post=4, seed=1):
    """[text..., vision_start, video*n, vision_end, text...]"""
    t, h, w = grid_thw
    n_merged = t * (h // 2) * (w // 2)
    rng = np.random.default_rng(seed)
    pre = rng.integers(5, 900, n_text_pre)
    post = rng.integers(5, 900, n_text_post)
    ids = np.concatenate([
        pre,
        [CFG.vision_start_token_id],
        np.full(n_merged, CFG.video_token_id),
        [CFG.vision_end_token_id],
        post,
    ]).astype(np.int64)
    s = t * h * w
    pixels = rng.standard_normal((s, CFG.vision.patch_input_dim)).astype(
        np.float32
    )
    return ids, pixels


GRID = (2, 16, 16)  # uniform windows (llm grid 8x8, window edge 4)
GRID_PAD = (1, 12, 12)  # non-uniform windows (llm grid 6x6 -> padded)


class TestRopeIndex:
    @pytest.mark.parametrize("grid", [GRID, GRID_PAD])
    def test_matches_hf(self, hf_model, grid):
        ids, _ = build_sequence(grid)
        pos_t, delta_t = hf_model.model.get_rope_index(
            torch.tensor(ids)[None],
            None,
            torch.tensor([list(grid)]),
            torch.tensor([2.0]),
            torch.ones(1, len(ids), dtype=torch.long),
        )
        pos_j, delta_j = qmodel.rope_index_for(
            CFG, ids, video_grid_thw=np.array([grid]),
            second_per_grid_ts=[2.0],
        )
        np.testing.assert_array_equal(pos_j, pos_t[:, 0].numpy())
        assert delta_j == int(delta_t[0, 0])

    def test_text_only(self, hf_model):
        ids = np.arange(10, 20, dtype=np.int64)
        pos_j, delta_j = qmodel.rope_index_for(CFG, ids)
        np.testing.assert_array_equal(pos_j, np.tile(np.arange(10), (3, 1)))
        assert delta_j == 0


class TestVisionTower:
    @pytest.mark.parametrize("grid", [GRID, GRID_PAD])
    def test_matches_hf(self, hf_model, jx_params, grid):
        _, pixels = build_sequence(grid)
        with torch.no_grad():
            out_t = hf_model.model.visual(
                torch.tensor(pixels), torch.tensor([list(grid)])
            ).numpy()
        out_j = np.asarray(
            qmodel.encode_video_group(jx_params, CFG, jnp.asarray(pixels), grid)
        )
        np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-4)


class TestFullForward:
    @pytest.mark.parametrize("grid", [GRID])
    def test_logits_match(self, hf_model, jx_params, grid):
        ids, pixels = build_sequence(grid)
        with torch.no_grad():
            out_t = hf_model(
                input_ids=torch.tensor(ids)[None],
                pixel_values_videos=torch.tensor(pixels),
                video_grid_thw=torch.tensor([list(grid)]),
                second_per_grid_ts=torch.tensor([2.0]),
            ).logits[0].numpy()
        out_j = np.asarray(
            qmodel.forward_full_sequence(
                jx_params, CFG, ids,
                pixels=jnp.asarray(pixels),
                video_grid_thw=np.array([grid]),
                second_per_grid_ts=[2.0],
            )
        )
        assert out_j.shape == out_t.shape
        np.testing.assert_allclose(out_j, out_t, rtol=3e-3, atol=3e-3)
        # greedy tokens identical
        np.testing.assert_array_equal(
            out_j.argmax(-1), out_t.argmax(-1)
        )

    def test_text_only_logits(self, hf_model, jx_params):
        ids = np.random.default_rng(2).integers(5, 900, 24)
        with torch.no_grad():
            out_t = hf_model(input_ids=torch.tensor(ids)[None]).logits[0].numpy()
        out_j = np.asarray(
            qmodel.forward_full_sequence(jx_params, CFG, ids)
        )
        np.testing.assert_allclose(out_j, out_t, rtol=3e-3, atol=3e-3)
