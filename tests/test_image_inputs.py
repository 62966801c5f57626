"""Image inputs (VERDICT r3 item 5 / missing #4).

The reference inherits image support from stock
qwen_vl_utils.process_vision_info (reference lvu/models/qwen25_lvu.py:565):
image items tokenize to `<|vision_start|><|image_pad|>*N<|vision_end|>`,
their ViT embeddings scatter into those slots, and get_rope_index mixes
image and video grids. These tests pin that against the installed HF
Qwen2.5-VL on the tiny config — rope geometry, full-forward logits, and
greedy-token parity through the ENGINE path (prefix images ride group 0,
suffix images the final prefill) — plus the LVU.chat surface."""

import numpy as np
import pytest

import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import model as qmodel

CFG = get_config("tiny")

VID_GRID = (2, 16, 16)  # 2x8x8 = 128 merged video tokens
IMG_GRID = (1, 8, 8)  # 4x4 = 16 merged image tokens


def _rand_pixels(grid, seed):
    t, h, w = grid
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (t * h * w, CFG.vision.patch_input_dim)
    ).astype(np.float32)


def _merged(grid):
    t, h, w = grid
    return t * (h // 2) * (w // 2)


def build_mixed_ids(image_pos="prefix", seed=3):
    """[text, (img), text, video, text, (img), text] with the image span in
    the prefix or the suffix."""
    rng = np.random.default_rng(seed)
    img_span = np.concatenate([
        [CFG.vision_start_token_id],
        np.full(_merged(IMG_GRID), CFG.image_token_id),
        [CFG.vision_end_token_id],
    ])
    vid_span = np.concatenate([
        [CFG.vision_start_token_id],
        np.full(_merged(VID_GRID), CFG.video_token_id),
        [CFG.vision_end_token_id],
    ])
    parts = [rng.integers(5, 900, 4)]
    if image_pos == "prefix":
        parts += [img_span, rng.integers(5, 900, 3), vid_span]
    else:
        parts += [vid_span, rng.integers(5, 900, 3), img_span]
    parts += [rng.integers(5, 900, 5)]
    return np.concatenate(parts).astype(np.int64)


# ---------------------------------------------------------------------------
# HF parity (torch harness from test_model_parity)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")

from tests.test_model_parity import hf_model, jx_params  # noqa: E402,F401


@pytest.mark.parametrize("image_pos", ["prefix", "suffix"])
def test_rope_index_mixed_image_video_matches_hf(hf_model, image_pos):  # noqa: F811
    ids = build_mixed_ids(image_pos)
    pos_t, delta_t = hf_model.model.get_rope_index(
        torch.tensor(ids)[None],
        torch.tensor([list(IMG_GRID)]),
        torch.tensor([list(VID_GRID)]),
        torch.tensor([2.0]),
        torch.ones(1, len(ids), dtype=torch.long),
    )
    pos_j, delta_j = qmodel.rope_index_for(
        CFG, ids,
        video_grid_thw=np.array([VID_GRID]),
        image_grid_thw=np.array([IMG_GRID]),
        second_per_grid_ts=[2.0],
    )
    np.testing.assert_array_equal(pos_j, pos_t[:, 0].numpy())
    assert delta_j == int(delta_t[0, 0])


def test_rope_index_image_only_matches_hf(hf_model):  # noqa: F811
    rng = np.random.default_rng(5)
    ids = np.concatenate([
        rng.integers(5, 900, 4),
        [CFG.vision_start_token_id],
        np.full(_merged(IMG_GRID), CFG.image_token_id),
        [CFG.vision_end_token_id],
        rng.integers(5, 900, 6),
    ]).astype(np.int64)
    pos_t, delta_t = hf_model.model.get_rope_index(
        torch.tensor(ids)[None],
        torch.tensor([list(IMG_GRID)]),
        None,
        None,
        torch.ones(1, len(ids), dtype=torch.long),
    )
    pos_j, delta_j = qmodel.rope_index_for(
        CFG, ids, image_grid_thw=np.array([IMG_GRID])
    )
    np.testing.assert_array_equal(pos_j, pos_t[:, 0].numpy())
    assert delta_j == int(delta_t[0, 0])


@pytest.mark.parametrize("image_pos", ["prefix", "suffix"])
def test_full_forward_logits_with_image_match_hf(
    hf_model, jx_params, image_pos  # noqa: F811
):
    ids = build_mixed_ids(image_pos)
    vid_px = _rand_pixels(VID_GRID, 11)
    img_px = _rand_pixels(IMG_GRID, 12)
    with torch.no_grad():
        out_t = hf_model(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(img_px),
            image_grid_thw=torch.tensor([list(IMG_GRID)]),
            pixel_values_videos=torch.tensor(vid_px),
            video_grid_thw=torch.tensor([list(VID_GRID)]),
            second_per_grid_ts=torch.tensor([2.0]),
        ).logits[0].numpy()
    out_j = np.asarray(qmodel.forward_full_sequence(
        jx_params, CFG, ids,
        pixels=jnp.asarray(vid_px),
        video_grid_thw=np.array([VID_GRID]),
        second_per_grid_ts=[2.0],
        image_pixels=[jnp.asarray(img_px)],
        image_grid_thw=np.array([IMG_GRID]),
    ))
    np.testing.assert_allclose(out_j, out_t, rtol=3e-3, atol=3e-3)
    np.testing.assert_array_equal(out_j.argmax(-1), out_t.argmax(-1))


@pytest.mark.parametrize("image_pos", ["prefix", "suffix"])
def test_engine_greedy_tokens_with_image_match_hf(
    hf_model, jx_params, image_pos  # noqa: F811
):
    """The ENGINE path (grouped prefill, pruning off): prefix images scatter
    inside group 0, suffix images inside the final prefill — greedy tokens
    must match HF generate."""
    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs

    ids = build_mixed_ids(image_pos)
    vid_px = _rand_pixels(VID_GRID, 11)
    img_px = _rand_pixels(IMG_GRID, 12)
    with torch.no_grad():
        out_t = hf_model.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(img_px),
            image_grid_thw=torch.tensor([list(IMG_GRID)]),
            pixel_values_videos=torch.tensor(vid_px),
            video_grid_thw=torch.tensor([list(VID_GRID)]),
            second_per_grid_ts=torch.tensor([2.0]),
            max_new_tokens=4, do_sample=False,
        )[0, len(ids):].numpy()
    eng = LVUEngine(
        jx_params, CFG,
        LVUConfig(model_name_or_path="tiny", max_decode_tokens=8),
        dtype=jnp.float32,
    )
    # two video groups of 1 temporal patch each: exercises group 0 (prefix
    # absorber) vs later groups
    t, h, w = VID_GRID
    half = t * h * w // 2
    res = eng.generate(
        PrefillInputs(
            input_ids=ids,
            video_grid_thw=VID_GRID,
            pixel_groups=[vid_px[:half], vid_px[half:]],
            group_grids=[(1, h, w), (1, h, w)],
            second_per_grid_ts=2.0,
            image_grid_thw=np.array([IMG_GRID]),
            image_pixels=[img_px],
        ),
        max_new_tokens=4,
    )
    np.testing.assert_array_equal(res.tokens, out_t)


@pytest.mark.parametrize("image_pos", ["prefix", "suffix"])
def test_engine_pp_images_match_single_chip(jx_params, image_pos):  # noqa: F811
    """Images under pipeline parallelism (VERDICT r4 missing #3): prefix
    images scatter inside the group-0 preamble feeding the pp chunk pass,
    suffix images inside the pp final prefill — greedy tokens must equal
    the single-chip engine's."""
    from quickvideo_tpu.config import LVUConfig, MeshConfig
    from quickvideo_tpu.parallel.mesh import make_mesh
    from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs

    ids = build_mixed_ids(image_pos)
    vid_px = _rand_pixels(VID_GRID, 11)
    img_px = _rand_pixels(IMG_GRID, 12)
    t, h, w = VID_GRID
    half = t * h * w // 2
    inputs = lambda: PrefillInputs(  # noqa: E731
        input_ids=ids,
        video_grid_thw=VID_GRID,
        pixel_groups=[vid_px[:half], vid_px[half:]],
        group_grids=[(1, h, w), (1, h, w)],
        second_per_grid_ts=2.0,
        image_grid_thw=np.array([IMG_GRID]),
        image_pixels=[img_px],
    )
    lcfg = LVUConfig(model_name_or_path="tiny", max_decode_tokens=8,
                     top_p=0.5)
    ref = LVUEngine(jx_params, CFG, lcfg, dtype=jnp.float32)
    want = ref.generate(inputs(), max_new_tokens=4).tokens
    mesh = make_mesh(MeshConfig(pp=3))  # tiny: 3 layers, 1/stage
    eng = LVUEngine(jx_params, CFG, lcfg, dtype=jnp.float32, mesh=mesh)
    assert eng.pp_mesh is not None
    got = eng.generate(inputs(), max_new_tokens=4).tokens
    np.testing.assert_array_equal(got, want)


def test_engine_query_based_with_suffix_image(hf_model, jx_params):  # noqa: F811
    """Query-based predictors with an image AFTER the video (VERDICT r4
    weak #3): the per-group prompt tail carries the image placeholders, and
    the preamble scatters the suffix image embeddings into it. At rho=1 the
    result must equal plain HF generate (the tail rides along as masked
    queries only); pruned runs must be deterministic."""
    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs

    ids = build_mixed_ids("suffix")
    vid_px = _rand_pixels(VID_GRID, 11)
    img_px = _rand_pixels(IMG_GRID, 12)
    t, h, w = VID_GRID
    half = t * h * w // 2
    inputs = lambda: PrefillInputs(  # noqa: E731
        input_ids=ids,
        video_grid_thw=VID_GRID,
        pixel_groups=[vid_px[:half], vid_px[half:]],
        group_grids=[(1, h, w), (1, h, w)],
        second_per_grid_ts=2.0,
        image_grid_thw=np.array([IMG_GRID]),
        image_pixels=[img_px],
    )
    with torch.no_grad():
        out_t = hf_model.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(img_px),
            image_grid_thw=torch.tensor([list(IMG_GRID)]),
            pixel_values_videos=torch.tensor(vid_px),
            video_grid_thw=torch.tensor([list(VID_GRID)]),
            second_per_grid_ts=torch.tensor([2.0]),
            max_new_tokens=4, do_sample=False,
        )[0, len(ids):].numpy()
    eng = LVUEngine(
        jx_params, CFG,
        LVUConfig(model_name_or_path="tiny", max_decode_tokens=8,
                  top_k=None,
                  top_k_predict_type="query_attention_weights"),
        dtype=jnp.float32,
    )
    assert eng.lvu.query_based
    res = eng.generate(inputs(), max_new_tokens=4)
    np.testing.assert_array_equal(res.tokens, out_t)
    # pruned query-based with the suffix image: runs and is deterministic
    eng2 = LVUEngine(
        jx_params, CFG,
        LVUConfig(model_name_or_path="tiny", max_decode_tokens=8,
                  top_k=16,
                  top_k_predict_type="query_attention_weights"),
        dtype=jnp.float32,
    )
    a = eng2.generate(inputs(), max_new_tokens=4).tokens
    b = eng2.generate(inputs(), max_new_tokens=4).tokens
    np.testing.assert_array_equal(a, b)


def test_engine_do_top_k_for_query_with_suffix_image(
    hf_model, jx_params  # noqa: F811
):
    """do_top_k_for_query with images in the suffix (VERDICT r4 weak #3):
    the pruned-suffix final prefill now scatters the image embeddings. With
    top_k >= suffix length the 'pruned' suffix keeps every row, so greedy
    tokens must equal plain HF generate; with a small top_k the path must
    run and stay deterministic."""
    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs

    ids = build_mixed_ids("suffix")
    vid_px = _rand_pixels(VID_GRID, 11)
    img_px = _rand_pixels(IMG_GRID, 12)
    t, h, w = VID_GRID
    half = t * h * w // 2
    inputs = lambda: PrefillInputs(  # noqa: E731
        input_ids=ids,
        video_grid_thw=VID_GRID,
        pixel_groups=[vid_px[:half], vid_px[half:]],
        group_grids=[(1, h, w), (1, h, w)],
        second_per_grid_ts=2.0,
        image_grid_thw=np.array([IMG_GRID]),
        image_pixels=[img_px],
    )
    with torch.no_grad():
        out_t = hf_model.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(img_px),
            image_grid_thw=torch.tensor([list(IMG_GRID)]),
            pixel_values_videos=torch.tensor(vid_px),
            video_grid_thw=torch.tensor([list(VID_GRID)]),
            second_per_grid_ts=torch.tensor([2.0]),
            max_new_tokens=4, do_sample=False,
        )[0, len(ids):].numpy()
    # suffix = image span (18) + 5 trailing text tokens = 23; top_k=512
    # keeps all of it AND all video rows (128) -> HF-exact
    eng = LVUEngine(
        jx_params, CFG,
        LVUConfig(model_name_or_path="tiny", max_decode_tokens=8,
                  top_k=512, do_top_k_for_query=True),
        dtype=jnp.float32,
    )
    res = eng.generate(inputs(), max_new_tokens=4)
    np.testing.assert_array_equal(res.tokens, out_t)
    eng2 = LVUEngine(
        jx_params, CFG,
        LVUConfig(model_name_or_path="tiny", max_decode_tokens=8,
                  top_k=16, do_top_k_for_query=True),
        dtype=jnp.float32,
    )
    a = eng2.generate(inputs(), max_new_tokens=4).tokens
    b = eng2.generate(inputs(), max_new_tokens=4).tokens
    np.testing.assert_array_equal(a, b)


def test_engine_image_only_matches_hf(hf_model, jx_params):  # noqa: F811
    """No video at all: the whole sequence runs through the final-prefill
    pass with the image scatter."""
    from quickvideo_tpu.config import LVUConfig
    from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs

    rng = np.random.default_rng(7)
    ids = np.concatenate([
        rng.integers(5, 900, 4),
        [CFG.vision_start_token_id],
        np.full(_merged(IMG_GRID), CFG.image_token_id),
        [CFG.vision_end_token_id],
        rng.integers(5, 900, 6),
    ]).astype(np.int64)
    img_px = _rand_pixels(IMG_GRID, 13)
    with torch.no_grad():
        out_t = hf_model.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(img_px),
            image_grid_thw=torch.tensor([list(IMG_GRID)]),
            max_new_tokens=4, do_sample=False,
        )[0, len(ids):].numpy()
    eng = LVUEngine(
        jx_params, CFG,
        LVUConfig(model_name_or_path="tiny", max_decode_tokens=8),
        dtype=jnp.float32,
    )
    res = eng.generate(
        PrefillInputs(
            input_ids=ids, video_grid_thw=None, pixel_groups=[],
            group_grids=[],
            image_grid_thw=np.array([IMG_GRID]),
            image_pixels=[img_px],
        ),
        max_new_tokens=4,
    )
    np.testing.assert_array_equal(res.tokens, out_t)


# ---------------------------------------------------------------------------
# LVU.chat surface (no torch needed)
# ---------------------------------------------------------------------------


def _tiny_lvu(model_type="qwen25_lvu"):
    from quickvideo_tpu.api import LVU
    from quickvideo_tpu.config import LVUConfig

    return LVU(LVUConfig(
        model_name_or_path="tiny", model_type=model_type,
        num_frames=8, video_group_size=4, top_p=0.5,
        max_decode_tokens=8, dtype="float32",
    ))


def _image_array(seed=0, h=56, w=56):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, 3), np.uint8)


@pytest.mark.parametrize("model_type", ["qwen25_lvu", "qwen25_lvu_interleaved"])
def test_lvu_chat_image_plus_video(tmp_path, model_type):
    from quickvideo_tpu.video import quickdecode as qd

    if not qd.is_available():
        pytest.skip("native decoder not built")
    video = str(tmp_path / "clip.mp4")
    qd.encode_test_video(video, width=112, height=112, nframes=32, fps=8,
                         gop=8)
    lvu = _tiny_lvu(model_type)
    messages = [{
        "role": "user",
        "content": [
            {"type": "image", "image": _image_array(1)},
            {"type": "video", "video": video},
            {"type": "text", "text": "Compare the image and the video."},
        ],
    }]
    out = lvu.chat(messages, max_new_tokens=3)
    assert len(lvu.last_result.tokens) == 3


def test_lvu_chat_image_only():
    """No video in the conversation at all: the image-only path (whole
    sequence through the final prefill) works from the chat surface and is
    deterministic. (That the pixels reach the model is pinned numerically
    by the HF-parity tests above — greedy tokens on tiny random weights can
    legitimately coincide across images, so no content-difference assert.)"""
    lvu = _tiny_lvu()

    def ask(img):
        msgs = [{
            "role": "user",
            "content": [
                {"type": "image", "image": img},
                {"type": "text", "text": "What is this?"},
            ],
        }]
        lvu.chat(msgs, max_new_tokens=4)
        return list(lvu.last_result.tokens)

    a1 = ask(_image_array(1))
    a1_again = ask(_image_array(1))
    assert a1 == a1_again  # deterministic
    assert len(a1) == 4
