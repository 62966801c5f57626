"""Qwen2.5-VL assembled model: vision tower + language decoder + mRoPE glue.

The prefill/decode *engines* live in quickvideo_tpu.prefill; this module owns
model construction, embedding assembly (scattering vision features into
video-token slots, as HF does via masked_scatter) and whole-sequence forward
for parity testing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl import rope
from quickvideo_tpu.models.qwen25_vl.config import ModelConfig
from quickvideo_tpu.models.qwen25_vl.language import (
    embed_tokens,
    full_forward_logits,
    init_language_params,
)
from quickvideo_tpu.models.qwen25_vl.vision import (
    build_layout,
    init_vision_params,
    layout_arrays_for,
    vision_forward,
)

Array = jax.Array


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(jax.random.key(seed))
    return {
        "language": init_language_params(cfg.text, k1, dtype),
        "vision": init_vision_params(cfg.vision, k2, dtype),
    }


def init_params_fast(cfg: ModelConfig, dtype=jnp.bfloat16):
    """Deterministic non-RNG init at true shapes — same compute/memory
    profile as real weights at a fraction of the init cost (billions of
    jax.random.normal samples are expensive to generate over a remote
    device transport). Used for checkpoint-less runs (benchmarks, demos);
    numerics are nonsense but well-conditioned (values in [-0.08, 0.08])."""
    shapes = jax.eval_shape(lambda: init_params(cfg, 0, dtype))

    @jax.jit
    def mk():
        def leaf(s):
            n = int(np.prod(s.shape))
            v = (
                jax.lax.iota(jnp.int32, n) % 17 - 8
            ).astype(jnp.float32) * 0.01
            return v.reshape(s.shape).astype(s.dtype)

        return jax.tree.map(leaf, shapes)

    return mk()


def layout_for(cfg: ModelConfig, grid_thw: Tuple[int, int, int]):
    return build_layout(
        tuple(int(x) for x in grid_thw),
        cfg.vision.patch_size,
        cfg.vision.spatial_merge_size,
        cfg.vision.window_size,
        cfg.vision.head_dim,
    )


def encode_video_group(
    params: dict,
    cfg: ModelConfig,
    pixels: Array,  # (S, patch_input_dim)
    grid_thw: Tuple[int, int, int],
    layout_arrays: Optional[dict] = None,
    native_hw: Optional[Tuple[int, int]] = None,
) -> Array:
    """Vision tower over one video group -> (S/merge_unit, text_hidden).

    Jitted callers pass `layout_arrays` (index tables as traced args, see
    vision.layout_arrays_for) with static (cfg, grid_thw). `native_hw` set
    means frames arrive at the decoder-native size and are Lanczos-resampled
    to the model grid on device (lvu.resize_on_device)."""
    layout = layout_for(cfg, grid_thw)
    return vision_forward(
        params["vision"], pixels, layout, cfg.vision, layout_arrays,
        native_hw=native_hw,
    )


def merge_vision_embeddings(
    text_embeds: Array,  # (L, C)
    vision_embeds: Array,  # (n_vis, C)
    token_ids: Array,  # (L,)
    video_token_id: int,
) -> Array:
    """Scatter vision features into the video-token placeholder slots (HF
    masked_scatter semantics: placeholders are filled in order)."""
    is_vis = token_ids == video_token_id
    # slot j of the sequence gets vision_embeds[rank of j among placeholders]
    rank = jnp.cumsum(is_vis.astype(jnp.int32)) - 1
    safe_rank = jnp.clip(rank, 0, vision_embeds.shape[0] - 1)
    gathered = vision_embeds[safe_rank]
    return jnp.where(is_vis[:, None], gathered.astype(text_embeds.dtype), text_embeds)


def rope_index_for(
    cfg: ModelConfig,
    input_ids: np.ndarray,
    video_grid_thw: Optional[np.ndarray] = None,
    image_grid_thw: Optional[np.ndarray] = None,
    second_per_grid_ts: Optional[Sequence[float]] = None,
):
    """Host-side mRoPE positions for a packed sequence (reference calls HF
    get_rope_index once per sequence, lvu/models/qwen25_vl.py:418-425)."""
    return rope.get_rope_index(
        input_ids,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        tokens_per_second=cfg.vision.tokens_per_second,
        image_grid_thw=image_grid_thw,
        video_grid_thw=video_grid_thw,
        second_per_grid_ts=second_per_grid_ts,
    )


def mrope_tables(
    cfg: ModelConfig, positions: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    return rope.precompute_mrope_cos_sin(
        positions,
        cfg.text.head_dim,
        cfg.text.mrope_section,
        cfg.text.rope_theta,
    )


def forward_full_sequence(
    params: dict,
    cfg: ModelConfig,
    input_ids: np.ndarray,  # (L,)
    pixels: Optional[Array] = None,  # (S, patch_input_dim)
    video_grid_thw: Optional[np.ndarray] = None,
    second_per_grid_ts: Optional[Sequence[float]] = None,
    image_pixels: Optional[Sequence[Array]] = None,  # per image
    image_grid_thw: Optional[np.ndarray] = None,  # (n_img, 3)
) -> Array:
    """Ungrouped full forward -> logits (L, V). Parity-test target vs HF.
    Image embeddings scatter into `<|image_pad|>` slots in image order (HF
    masked_scatter semantics), independently of the video scatter."""
    ids = jnp.asarray(np.asarray(input_ids), jnp.int32)
    x = embed_tokens(params["language"], ids)
    if pixels is not None:
        vis = encode_video_group(
            params, cfg, pixels, tuple(int(v) for v in video_grid_thw[0])
        )
        x = merge_vision_embeddings(x, vis, ids, cfg.video_token_id)
    if image_pixels is not None:
        embs = [
            encode_video_group(params, cfg, p, tuple(int(v) for v in g))
            for p, g in zip(image_pixels, np.asarray(image_grid_thw))
        ]
        img = embs[0] if len(embs) == 1 else jnp.concatenate(embs, axis=0)
        x = merge_vision_embeddings(x, img, ids, cfg.image_token_id)
    positions, _ = rope_index_for(
        cfg, np.asarray(input_ids), video_grid_thw=video_grid_thw,
        image_grid_thw=image_grid_thw,
        second_per_grid_ts=second_per_grid_ts,
    )
    cos, sin = mrope_tables(cfg, positions)
    return full_forward_logits(
        params["language"], x, jnp.asarray(cos), jnp.asarray(sin), cfg.text
    )
