"""Qwen2.5-VL engines: sync (batch decode) and interleaved (overlap).

`run_*` signatures mirror the reference's run_lvu_model(question, video_path)
drivers; `chat_*` accept reference-style messages lists
(lvu/models/qwen25_vl.py:314-346)."""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from quickvideo_tpu.prefill.engine import PrefillInputs
from quickvideo_tpu.tokenization import build_chat_ids_from_messages
from quickvideo_tpu.utils.timing import SpanTimer
from quickvideo_tpu.video import preprocess as pp
from quickvideo_tpu.video import reader as vreader


def init_lvu_model(lvu, config):
    """Engine init hook. The TPU build has no layers to monkey-patch — the
    pruning hook is native to the decoder stack — so this validates config
    and warms nothing. Kept for registry parity (reference
    lvu/models/__init__.py contract)."""
    return lvu


def _question_from_messages(messages) -> tuple:
    """Extract (video_path, question, video_kwargs, image_items) from
    reference-style messages. Image items keep message order (their
    placeholder expansion and embedding scatter must line up)."""
    video_path, question, vkw = None, "", {}
    images = []
    for m in messages:
        if m.get("role") != "user":
            continue
        content = m.get("content")
        if isinstance(content, str):
            question = content
            continue
        for item in content:
            if item.get("type") == "video":
                video_path = item["video"]
                vkw = {
                    k: v for k, v in item.items() if k not in ("type", "video")
                }
            elif item.get("type") == "image":
                images.append(item)
            elif item.get("type") == "text":
                question = item.get("text", "")
    return video_path, question, vkw, images


def _load_image(obj) -> np.ndarray:
    """Image item payload -> (H, W, 3) uint8 RGB. Accepts a numpy array
    (HWC or CHW) or a file path (the reference accepts paths/URLs/PIL via
    qwen_vl_utils fetch_image; offline we take paths and arrays)."""
    if isinstance(obj, np.ndarray):
        a = obj
        if a.ndim == 3 and a.shape[0] == 3 and a.shape[-1] != 3:
            a = a.transpose(1, 2, 0)
        if a.ndim != 3 or a.shape[-1] != 3:
            raise ValueError(f"image array must be HWC/CHW RGB, got {a.shape}")
        return np.ascontiguousarray(a, np.uint8)
    from PIL import Image

    with Image.open(obj) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _prepare_images(model_cfg, image_items):
    """Load + smart-resize each image to its model grid.

    Returns (pixels, grids, token_counts): per image a (1, 3, H, W) uint8
    frame (the vision tower repeats it across the temporal patch, matching
    HF's single-image handling), its (1, h, w) patch grid, and the merged
    token count for the chat-template expansion."""
    ps = model_cfg.vision.patch_size
    ms = model_cfg.vision.spatial_merge_size
    pixels, grids, counts = [], [], []
    for item in image_items:
        img = _load_image(item["image"])
        h, w = img.shape[:2]
        if "resized_height" in item and "resized_width" in item:
            rh, rw = pp.smart_resize(
                int(item["resized_height"]), int(item["resized_width"]),
                factor=ps * ms,
            )
        else:
            rh, rw = pp.smart_resize(
                h, w, factor=ps * ms,
                min_pixels=int(item.get("min_pixels", pp.MIN_PIXELS)),
                max_pixels=int(item.get("max_pixels", pp.MAX_PIXELS)),
            )
        frame = img.transpose(2, 0, 1)[None]  # (1, 3, H, W)
        if (rh, rw) != (h, w):
            frame = pp.resize_frames_bicubic(frame, rh, rw)
        grid = (1, rh // ps, rw // ps)
        pixels.append(np.ascontiguousarray(frame, np.uint8))
        grids.append(grid)
        counts.append(grid[1] // ms * (grid[2] // ms))
    return pixels, np.asarray(grids, np.int64), counts


def _config_with_video_kwargs(lvu, vkw: dict, generation_kwargs: dict):
    """Per-request sampling overrides, reference-style: the video item in the
    messages may carry fps / num_frames (the reference's fetch_video reads
    them from the message dict, lvu/models/qwen25_lvu.py:333-400); they are
    also accepted as generation kwargs (popped, not forwarded to decode)."""
    overrides = {}
    for src in (vkw, generation_kwargs):
        if "fps" in src:
            overrides["fps"] = src["fps"]
        if "nframes" in src:
            overrides["num_frames"] = src["nframes"]
        if "num_frames" in src:
            overrides["num_frames"] = src["num_frames"]
    generation_kwargs.pop("fps", None)
    generation_kwargs.pop("nframes", None)
    generation_kwargs.pop("num_frames", None)
    return lvu.config.replace(**overrides) if overrides else lvu.config


def run_sync(lvu, question: str, video_path: str, **generation_kwargs):
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "video", "video": video_path},
                {"type": "text", "text": question},
            ],
        }
    ]
    return chat_sync(lvu, messages, **generation_kwargs)


def chat_sync(lvu, messages, **generation_kwargs) -> List[str]:
    """Decode-everything-then-prefill driver (reference qwen25_lvu flow,
    SURVEY.md section 3.2). Image items (alone or alongside the video) ride
    the prefix/suffix prefill — reference image support comes from stock
    qwen_vl_utils.process_vision_info (lvu/models/qwen25_lvu.py:565)."""
    video_path, question, vkw, image_items = _question_from_messages(messages)
    cfg = _config_with_video_kwargs(lvu, vkw, generation_kwargs)
    timer = SpanTimer()
    img_px, img_grids, img_counts = (None, None, ())
    if image_items:
        with timer.span("processing"):
            img_px, img_grids, img_counts = _prepare_images(
                lvu.model_config, image_items
            )
    if video_path is None:
        # image-only request: the whole sequence runs as one prefill pass
        ids = build_chat_ids_from_messages(
            lvu.tokenizer, lvu.model_config, messages, 0,
            image_token_counts=img_counts,
        )
        inputs = PrefillInputs(
            input_ids=ids, video_grid_thw=None, pixel_groups=[],
            group_grids=[], image_grid_thw=img_grids, image_pixels=img_px,
        )
        return _generate(lvu, inputs, timer, generation_kwargs)
    with timer.span("frame_fetch"):
        frames, plan, native_hw = _fetch_frames(lvu, video_path, timer, cfg)
    n_video_tokens = sum(plan.tokens_per_group)
    ids = build_chat_ids_from_messages(
        lvu.tokenizer, lvu.model_config, messages, n_video_tokens,
        image_token_counts=img_counts,
    )
    with timer.span("processing"):
        inputs = vreader.build_prefill_inputs_from_frames(
            frames, plan, ids, native_hw=native_hw
        )
        inputs.image_grid_thw = img_grids
        inputs.image_pixels = img_px
    return _generate(lvu, inputs, timer, generation_kwargs)


def score_chat(lvu, messages, continuation) -> tuple:
    """Teacher-forced log-likelihood of `continuation` (text or token ids)
    given the chat context — the lmms-eval `loglikelihood` contract (the
    reference's eval tasks can score MC options this way instead of
    generating, reference README.md:398-412). Same input building as
    chat_sync (the reference's eval engine is the sync qwen25_lvu,
    README.md:394-396); the engine scores the continuation in one pass.
    Returns (total_logprob, is_greedy)."""
    return score_chat_multi(lvu, messages, [continuation])[0]


def score_chat_multi(lvu, messages, continuations) -> list:
    """Score several continuations against ONE shared prefill of the chat
    context — the lmms-eval multiple-choice pattern (N options per doc with
    identical context). The video decodes and prefills once;
    engine.score_continuations rewinds the cache between options. Returns a
    list of (total_logprob, is_greedy)."""
    video_path, question, vkw, image_items = _question_from_messages(messages)
    cfg = _config_with_video_kwargs(lvu, vkw, {})
    timer = SpanTimer()
    img_px, img_grids, img_counts = (None, None, ())
    if image_items:
        with timer.span("processing"):
            img_px, img_grids, img_counts = _prepare_images(
                lvu.model_config, image_items
            )
    cont_ids = [
        lvu.tokenizer.encode_text(c) if isinstance(c, str)
        else [int(t) for t in c]
        for c in continuations
    ]
    if video_path is None:
        ids = build_chat_ids_from_messages(
            lvu.tokenizer, lvu.model_config, messages, 0,
            image_token_counts=img_counts,
        )
        inputs = PrefillInputs(
            input_ids=ids, video_grid_thw=None, pixel_groups=[],
            group_grids=[], image_grid_thw=img_grids, image_pixels=img_px,
        )
        return lvu.engine.score_continuations(inputs, cont_ids, timer=timer)
    with timer.span("frame_fetch"):
        frames, plan, native_hw = _fetch_frames(lvu, video_path, timer, cfg)
    n_video_tokens = sum(plan.tokens_per_group)
    ids = build_chat_ids_from_messages(
        lvu.tokenizer, lvu.model_config, messages, n_video_tokens,
        image_token_counts=img_counts,
    )
    with timer.span("processing"):
        inputs = vreader.build_prefill_inputs_from_frames(
            frames, plan, ids, native_hw=native_hw
        )
        inputs.image_grid_thw = img_grids
        inputs.image_pixels = img_px
    return lvu.engine.score_continuations(inputs, cont_ids, timer=timer)


def _fetch_frames(lvu, video_path, timer, cfg=None):
    """Decode with optional disk frame cache (reference
    lvu/models/qwen25_lvu.py:552-592; gated by save_video_cache)."""
    from quickvideo_tpu.video import frame_cache
    from quickvideo_tpu.video.reader import open_reader, plan_from_reader

    if cfg is None:
        cfg = lvu.config
    if not cfg.save_video_cache:
        return vreader.decode_video_batch(video_path, cfg)
    name, reader = open_reader(video_path, cfg.decode_threads)
    plan = plan_from_reader(reader, cfg)
    native_hw = (
        (reader.source_height, reader.source_width)
        if cfg.resize_on_device and hasattr(reader, "source_height")
        else None
    )
    reader.close()
    cached = frame_cache.load(video_path, plan, cfg.cache_dir, native_hw)
    if cached is not None:
        return np.asarray(cached), plan, native_hw
    frames, plan, native_hw = vreader.decode_video_batch(video_path, cfg)
    frame_cache.save(video_path, plan, frames, cfg.cache_dir, native_hw)
    return frames, plan, native_hw


def run_interleaved(lvu, question: str, video_path: str, **generation_kwargs):
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "video", "video": video_path},
                {"type": "text", "text": question},
            ],
        }
    ]
    return chat_interleaved(lvu, messages, **generation_kwargs)


def chat_interleaved(lvu, messages, **generation_kwargs) -> List[str]:
    """Overlapped driver: native interval decode + host preprocessing run
    ahead of the TPU prefill loop (reference qwen25_lvu_interleaved flow,
    SURVEY.md section 3.3)."""
    from quickvideo_tpu.video.stream import AsyncPixelGroups

    video_path, question, vkw, image_items = _question_from_messages(messages)
    cfg = _config_with_video_kwargs(lvu, vkw, generation_kwargs)
    if video_path is None:
        # nothing to stream — image-only requests share the sync path
        return chat_sync(lvu, messages, **generation_kwargs)
    timer = SpanTimer()
    img_px, img_grids, img_counts = (None, None, ())
    if image_items:
        with timer.span("processing"):
            img_px, img_grids, img_counts = _prepare_images(
                lvu.model_config, image_items
            )
    stream = AsyncPixelGroups(video_path, cfg, timer=timer)
    plan = stream.plan
    n_video_tokens = sum(plan.tokens_per_group)
    ids = build_chat_ids_from_messages(
        lvu.tokenizer, lvu.model_config, messages, n_video_tokens,
        image_token_counts=img_counts,
    )
    inputs = PrefillInputs(
        input_ids=ids,
        video_grid_thw=plan.grid_thw,
        pixel_groups=iter(stream),
        group_grids=plan.group_grids,
        second_per_grid_ts=plan.second_per_grid_ts,
        native_hw=stream.native_hw,
        image_grid_thw=img_grids,
        image_pixels=img_px,
    )
    try:
        return _generate(lvu, inputs, timer, generation_kwargs)
    finally:
        stream.close()


def _generate(lvu, inputs, timer, generation_kwargs) -> List[str]:
    eos = [lvu.tokenizer.eos_token_id]
    res = lvu.engine.generate(
        inputs,
        max_new_tokens=generation_kwargs.get("max_new_tokens"),
        eos_token_ids=eos,
        greedy=not generation_kwargs.get("do_sample", False),
        temperature=generation_kwargs.get("temperature", 1.0),
        top_p=generation_kwargs.get("top_p"),
        top_k=generation_kwargs.get("top_k"),
        on_tokens=generation_kwargs.get("on_tokens"),
    )
    for k, v in timer.totals().items():
        res.timings[k] = res.timings.get(k, 0.0) + v
    lvu.last_result = res
    if lvu.config.use_tqdm or generation_kwargs.get("verbose"):
        print(
            f"Time taken -- "
            f"frame fetch: {res.timings.get('frame_fetch', 0):.2f}s, "
            f"processing: {res.timings.get('processing', 0):.2f}s, "
            f"prefill: {res.timings.get('prefill', 0):.2f}s, "
            f"decode: {res.timings.get('decode', 0):.2f}s, "
            f"e2e: {res.timings.get('e2e', 0):.2f}s"
        )
    text = lvu.tokenizer.decode(
        [t for t in res.tokens if t not in eos]
    )
    return [text]
