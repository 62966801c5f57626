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
    """Extract (video_path, question, video_kwargs) from reference-style
    messages."""
    video_path, question, vkw = None, "", {}
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
            elif item.get("type") == "text":
                question = item.get("text", "")
    return video_path, question, vkw


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
    SURVEY.md section 3.2)."""
    video_path, question, vkw = _question_from_messages(messages)
    cfg = _config_with_video_kwargs(lvu, vkw, generation_kwargs)
    timer = SpanTimer()
    with timer.span("frame_fetch"):
        frames, plan, native_hw = _fetch_frames(lvu, video_path, timer, cfg)
    n_video_tokens = sum(plan.tokens_per_group)
    ids = build_chat_ids_from_messages(
        lvu.tokenizer, lvu.model_config, messages, n_video_tokens
    )
    with timer.span("processing"):
        inputs = vreader.build_prefill_inputs_from_frames(
            frames, plan, ids, native_hw=native_hw
        )
    return _generate(lvu, inputs, timer, generation_kwargs)


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

    video_path, question, vkw = _question_from_messages(messages)
    cfg = _config_with_video_kwargs(lvu, vkw, generation_kwargs)
    timer = SpanTimer()
    stream = AsyncPixelGroups(video_path, cfg, timer=timer)
    plan = stream.plan
    n_video_tokens = sum(plan.tokens_per_group)
    ids = build_chat_ids_from_messages(
        lvu.tokenizer, lvu.model_config, messages, n_video_tokens
    )
    inputs = PrefillInputs(
        input_ids=ids,
        video_grid_thw=plan.grid_thw,
        pixel_groups=iter(stream),
        group_grids=plan.group_grids,
        second_per_grid_ts=plan.second_per_grid_ts,
        native_hw=stream.native_hw,
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
