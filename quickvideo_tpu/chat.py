"""Interactive multi-turn chat over one video with incremental KV reuse.

The reference's `chat` re-runs decode + full grouped prefill for EVERY turn
of a conversation (chat_lvu_model consumes the whole message list each call,
reference lvu/models/qwen25_lvu.py:538-548) — a follow-up question about an
hour-long movie costs as much as the first. Causal attention makes that
unnecessary: earlier tokens' KV never changes, so a session keeps the pruned
video cache (plus every past turn's suffix/answer KV) resident on the chip
and each follow-up appends only its few-dozen new template/question tokens
before decoding. Turn 2+ latency collapses from a full video prefill
(~13 s, 7B/1024 frames) to a bucketed ~64-token prefill + decode (<1 s).

Equivalence: a follow-up answered incrementally attends exactly the same
(key, value, position) set as the reference's full re-prefill of the
history-bearing message list — tokens match the from-scratch path
(tests/test_chat_session.py).

Usage:
    lvu = LVU(config)
    session = lvu.start_chat("movie.mp4")
    a1 = session.ask("What happens first?")       # full video prefill
    a2 = session.ask("Why did they do that?")     # incremental, fast
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from quickvideo_tpu.tokenization import special_ids
from quickvideo_tpu.utils.timing import SpanTimer


class ChatSession:
    """One video, many turns; the KV cache persists across `ask` calls."""

    def __init__(self, lvu, video_path: str, reserve_turns: int = 8,
                 **video_kwargs):
        if lvu.config.query_based or lvu.config.do_top_k_for_query:
            # question-dependent pruning makes the cached video KV specific
            # to turn 1's question — follow-ups would silently diverge from
            # the full-history path (same guard as BatchedQAEngine)
            raise ValueError(
                "chat sessions do not support query-based predictors or "
                "do_top_k_for_query (the pruned cache would depend on the "
                "first question); use a norm-based predictor"
            )
        self.lvu = lvu
        self.video_path = video_path
        self.video_kwargs = video_kwargs
        # per reserved turn: a question suffix bucket + the decoded answer
        self._reserve = reserve_turns * (
            lvu.config.max_decode_tokens + 256
        )
        self._cache = None
        self._ids: Optional[np.ndarray] = None  # consumed ids (KV in cache)
        self._tail: List[int] = []  # generated tokens whose KV is NOT cached
        self._cache_len = 0
        self._delta = 0
        self._pos_prefix = None  # (3, ss0) video/prefix mRoPE positions
        self._ss0 = 0
        self._session_tables = None  # (cos, sin) out to the reserve horizon
        self.turns: List[dict] = []

    # -- internals --------------------------------------------------------

    def _tok(self):
        return self.lvu.tokenizer

    def _eos(self):
        return [self._tok().eos_token_id]

    def _tables(self, total_len: int):
        """cos/sin covering the whole session: built ONCE out to the KV
        reserve horizon and sliced per turn (rows beyond the video are
        text: position = row + delta — extending the table early is free
        and keeps every follow-up on the same compiled programs)."""
        import jax.numpy as jnp

        from quickvideo_tpu.models.qwen25_vl.rope import (
            precompute_mrope_cos_sin_device,
            text_positions,
        )

        cfg = self.lvu.model_config
        need = total_len + self.lvu.config.max_decode_tokens + 32
        if self._session_tables is not None and (
            self._session_tables[0].shape[0] >= need
        ):
            return self._session_tables
        horizon = max(
            need, total_len + self._reserve
            + self.lvu.config.max_decode_tokens + 32
        )
        horizon += (-horizon) % 64
        text_rows = text_positions(
            self._ss0 + self._delta, horizon - self._ss0
        )
        all_pos = np.concatenate([self._pos_prefix, text_rows], axis=1)
        self._session_tables = precompute_mrope_cos_sin_device(
            jnp.asarray(all_pos, jnp.int32), cfg.text.head_dim,
            cfg.text.mrope_section, cfg.text.rope_theta,
        )
        return self._session_tables

    def _first_ask(self, question: str, max_new_tokens, gen):
        from quickvideo_tpu.engines.qwen25 import (
            _config_with_video_kwargs,
        )
        from quickvideo_tpu.prefill.engine import PrefillInputs
        from quickvideo_tpu.tokenization import build_chat_ids
        from quickvideo_tpu.video.stream import AsyncPixelGroups

        lvu = self.lvu
        cfg = _config_with_video_kwargs(lvu, self.video_kwargs, gen)
        timer = SpanTimer()
        stream = AsyncPixelGroups(self.video_path, cfg, timer=timer)
        plan = stream.plan
        n_video_tokens = sum(plan.tokens_per_group)
        ids = build_chat_ids(
            self._tok(), lvu.model_config, question, n_video_tokens
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
            cache, state = lvu.engine.prefill(
                inputs, timer=timer, extra_capacity=self._reserve
            )
        finally:
            stream.close()
        self._delta = state["delta"]
        # video/prefix position rows (engine already computed them), for
        # follow-up turns' tables
        self._ss0 = state["suffix_start"]
        self._pos_prefix = np.asarray(state["positions"])[:, : self._ss0]
        toks, cache, cache_len = lvu.engine._generate_from_cache(
            cache, state, max_new_tokens, self._eos(),
            greedy=not gen.get("do_sample", False),
            temperature=gen.get("temperature", 1.0), timer=timer,
            top_p=gen.get("top_p"), top_k=gen.get("top_k"),
        )
        return ids, toks, cache, cache_len, timer

    def ask(self, question: str, max_new_tokens: Optional[int] = None,
            **gen) -> str:
        lvu = self.lvu
        eng = lvu.engine
        cfg = lvu.model_config
        if self._cache is None:
            ids, toks, cache, cache_len, timer = self._first_ask(
                question, max_new_tokens, gen
            )
            out = [int(t) for t in np.asarray(toks)]
            # cache holds ids + out[:-1]; the final token is never appended
            self._ids = np.concatenate([ids, np.asarray(out[:-1], np.int64)])
            self._tail = out[-1:]
            self._cache = cache
            self._cache_len = cache_len
        else:
            im_start, im_end, newline = special_ids(cfg)
            tok = self._tok()
            suffix: List[int] = list(self._tail)
            if not suffix or suffix[-1] != im_end:
                # previous answer hit max_new without EOS: close its turn
                # the way the chat template would
                suffix += [im_end]
            suffix += [newline]
            suffix += [im_start] + tok.encode_text("user\n")
            suffix += tok.encode_text(question)
            suffix += [im_end, newline]
            suffix += [im_start] + tok.encode_text("assistant\n")

            full_ids = np.concatenate(
                [self._ids, np.asarray(suffix, np.int64)]
            )
            total_len = len(full_ids)
            capacity = int(self._cache.k.shape[2])
            # the bucketed final prefill WRITES a 32-padded bucket of rows
            # (pad rows are garbage beyond the valid length) — budget the
            # bucket, not the raw suffix, or a clamped dynamic_update_slice
            # at the capacity edge would corrupt the newest valid KV
            bucket = max(32, -(-len(suffix) // 32) * 32)
            if self._cache_len + bucket + lvu.config.max_decode_tokens \
                    > capacity:
                raise RuntimeError(
                    f"chat session KV reserve exhausted after "
                    f"{len(self.turns)} turns (capacity {capacity}); start "
                    f"a new session or raise reserve_turns"
                )
            cos, sin = self._tables(total_len)
            timer = SpanTimer()
            state = {
                "cos": cos,
                "sin": sin,
                "suffix_start": len(self._ids),
                "L": total_len,
                "delta": self._delta,
                "ids": full_ids,
                "cache_len": self._cache_len,
            }
            with timer.span("e2e"):
                toks, cache, cache_len = eng._generate_from_cache(
                    self._cache, state, max_new_tokens, self._eos(),
                    greedy=not gen.get("do_sample", False),
                    temperature=gen.get("temperature", 1.0), timer=timer,
                    top_p=gen.get("top_p"), top_k=gen.get("top_k"),
                )
            out = [int(t) for t in np.asarray(toks)]
            self._ids = np.concatenate(
                [full_ids, np.asarray(out[:-1], np.int64)]
            )
            self._tail = out[-1:]
            self._cache = cache
            self._cache_len = cache_len

        eos = set(self._eos())
        text = self._tok().decode([t for t in out if t not in eos])
        self.turns.append({
            "question": question,
            "answer": text,
            "tokens": out,
            "timings": dict(timer.totals()),
        })
        return text
