"""Multimodal 3D RoPE (mRoPE) for Qwen2.5-VL.

Reimplements the semantics of HF's `get_rope_index` /
`apply_multimodal_rotary_pos_emb` (the functions the reference engine calls at
lvu/models/qwen25_vl.py:44-47,418-425) in a TPU-friendly split:

  * `get_rope_index` — host-side numpy, run ONCE per sequence before prefill
    (matching the reference's single full-sequence call,
    lvu/models/qwen25_vl.py:418-425). Returns (3, L) positions + rope_delta.
  * `precompute_mrope_cos_sin` — turns (3, L) positions into the MERGED
    (L, head_dim) cos/sin tables with the mrope sections already interleaved,
    so the per-group traced code does a plain elementwise rotary apply — no
    section splitting inside jit.

Pruning invariant: retained tokens keep their ORIGINAL 3D positions; decode
positions continue from rope_delta + global (unpruned) length (SURVEY.md
section 3.4; reference rope_deltas semantics).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def get_rope_index(
    input_ids: np.ndarray,  # (L,) int — single sequence, no padding
    *,
    spatial_merge_size: int,
    image_token_id: int,
    video_token_id: int,
    vision_start_token_id: int,
    tokens_per_second: float,
    image_grid_thw: Optional[np.ndarray] = None,  # (n_img, 3)
    video_grid_thw: Optional[np.ndarray] = None,  # (n_vid, 3)
    second_per_grid_ts: Optional[Sequence[float]] = None,  # (n_vid,)
) -> Tuple[np.ndarray, int]:
    """3D rope positions for one packed sequence.

    Text tokens advance all three axes together; vision blocks get
    (temporal = grid_t scaled by second_per_grid * tokens_per_second,
    height, width) positions offset so each modality block starts right after
    the max position of everything before it. Returns ((3, L) int64, delta)
    where delta = max_pos + 1 - L (HF `rope_deltas`).
    """
    input_ids = np.asarray(input_ids)
    L = input_ids.shape[0]
    if image_grid_thw is None and video_grid_thw is None:
        pos = np.arange(L, dtype=np.int64)
        return np.stack([pos, pos, pos]), 0

    vis_starts = np.nonzero(input_ids == vision_start_token_id)[0]
    vis_kinds = input_ids[vis_starts + 1] if len(vis_starts) else np.array([])
    n_images = int(np.sum(vis_kinds == image_token_id))
    n_videos = int(np.sum(vis_kinds == video_token_id))

    tokens = input_ids.tolist()
    pos_chunks: List[np.ndarray] = []
    st = 0
    img_i = vid_i = 0
    remain_images, remain_videos = n_images, n_videos
    for _ in range(n_images + n_videos):
        ed_image = tokens.index(image_token_id, st) if (
            image_token_id in tokens[st:] and remain_images > 0
        ) else L + 1
        ed_video = tokens.index(video_token_id, st) if (
            video_token_id in tokens[st:] and remain_videos > 0
        ) else L + 1
        if ed_image < ed_video:
            t, h, w = (int(x) for x in image_grid_thw[img_i])
            second_per_grid_t = 0.0
            img_i += 1
            remain_images -= 1
            ed = ed_image
        else:
            t, h, w = (int(x) for x in video_grid_thw[vid_i])
            second_per_grid_t = (
                float(second_per_grid_ts[vid_i])
                if second_per_grid_ts is not None
                else 1.0
            )
            vid_i += 1
            remain_videos -= 1
            ed = ed_video
        gh, gw = h // spatial_merge_size, w // spatial_merge_size
        text_len = ed - st
        st_idx = int(pos_chunks[-1].max()) + 1 if pos_chunks else 0
        if text_len > 0:
            r = np.arange(text_len, dtype=np.int64) + st_idx
            pos_chunks.append(np.stack([r, r, r]))
        t_index = (
            (np.arange(t, dtype=np.float64)[:, None] * second_per_grid_t
             * tokens_per_second)
            .astype(np.int64)
            .repeat(gh * gw, axis=1)
            .reshape(-1)
        )
        h_index = np.tile(np.repeat(np.arange(gh, dtype=np.int64), gw), t)
        w_index = np.tile(np.arange(gw, dtype=np.int64), t * gh)
        pos_chunks.append(
            np.stack([t_index, h_index, w_index]) + text_len + st_idx
        )
        st = ed + t * gh * gw
    if st < L:
        st_idx = int(pos_chunks[-1].max()) + 1 if pos_chunks else 0
        r = np.arange(L - st, dtype=np.int64) + st_idx
        pos_chunks.append(np.stack([r, r, r]))
    positions = np.concatenate(pos_chunks, axis=1)
    assert positions.shape == (3, L), (positions.shape, L)
    delta = int(positions.max()) + 1 - L
    return positions, delta


def precompute_mrope_cos_sin(
    positions: np.ndarray,  # (3, L) int
    head_dim: int,
    mrope_section: Sequence[int],
    rope_theta: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merged rotary tables (L, head_dim) float32.

    HF computes per-axis (3, L, head_dim) cos/sin and interleaves sections at
    every attention call (`apply_multimodal_rotary_pos_emb`, doubling
    mrope_section and picking section i from axis i%3). Since the merge
    depends only on positions, we do it once here: the first half of head_dim
    is laid out as [t-sec, h-sec, w-sec] frequencies and the second half
    repeats the pattern (the `mrope_section * 2` doubling).
    """
    half = head_dim // 2
    assert sum(mrope_section) == half, (mrope_section, head_dim)
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )  # (half,)
    # merged half-table built section-by-section (3 slices), not by a giant
    # advanced-index gather — this runs per request on the host and was the
    # dominant host cost at 100k-token scale
    L = positions.shape[1]
    merged_half = np.empty((L, half), np.float64)
    off = 0
    for i, m in enumerate(mrope_section):
        axis = i % 3
        merged_half[:, off : off + m] = (
            positions[axis, :, None].astype(np.float64)
            * inv_freq[None, off : off + m]
        )
        off += m
    # emb = cat(freqs, freqs) then per-section pick with doubled sections —
    # equivalent to repeating the merged half table twice.
    emb = np.concatenate([merged_half, merged_half], axis=-1)  # (L, head_dim)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("head_dim", "mrope_section", "rope_theta")
)
def precompute_mrope_cos_sin_device(
    positions: Array,  # (3, L) int32/int64
    head_dim: int,
    mrope_section,
    rope_theta: float,
):
    """Device-side version of precompute_mrope_cos_sin: the host here is a
    single throttled core (~5M cos/s), and computing on device also avoids
    shipping the (L, head_dim) f32 tables over the transport (only the
    (3, L) positions go up)."""
    half = head_dim // 2
    inv_freq = 1.0 / (
        rope_theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    parts = []
    off = 0
    for i, m in enumerate(mrope_section):
        parts.append(
            positions[i % 3, :, None].astype(jnp.float32)
            * inv_freq[None, off : off + m]
        )
        off += m
    merged = jnp.concatenate(parts, axis=-1)  # (L, half)
    emb = jnp.concatenate([merged, merged], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def text_positions(start: int, length: int) -> np.ndarray:
    """(3, length) positions for a pure-text continuation starting at
    `start` (used for decode: start = global_len + rope_delta)."""
    r = np.arange(start, start + length, dtype=np.int64)
    return np.stack([r, r, r])


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(q: Array, k: Array, cos: Array, sin: Array):
    """Apply merged rotary tables.

    q: (Hq, L, D), k: (Hkv, L, D); cos/sin: (L, D) float32 (already merged by
    `precompute_mrope_cos_sin`). Computed in f32, cast back to input dtype —
    matching HF numerics.
    """
    dtype = q.dtype
    c = cos[None].astype(jnp.float32)
    s = sin[None].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * c + rotate_half(qf) * s
    k_out = kf * c + rotate_half(kf) * s
    return q_out.astype(dtype), k_out.astype(dtype)
