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

import json
from typing import List, Optional

import numpy as np

from quickvideo_tpu.tokenization import special_ids
from quickvideo_tpu.utils.timing import SpanTimer

SESSION_FORMAT_VERSION = 1


def _session_fingerprint(lvu) -> dict:
    """Config fields a saved session's KV depends on. A resume under a
    different value of ANY of these would silently change semantics (the
    cached KV was pruned/quantized/positioned under the saved values)."""
    c = lvu.config
    return {
        "model": c.model_name_or_path,
        "model_type": c.model_type,
        "predict_type": c.top_k_predict_type,
        "top_p": c.top_p,
        "top_k": c.top_k,
        "group": c.video_group_size,
        "dtype": c.dtype,
        "param_dtype": c.param_dtype,
        "kv_dtype": c.kv_cache_dtype,
        "decay": (c.top_k_decay_type, c.top_k_decay_factor),
        "prune_start": c.prefill_prune_starting_layer,
    }


def _pack_array(a) -> "tuple[np.ndarray, str]":
    """numpy-serializable view + dtype tag (bf16 has no portable npy repr)."""
    import jax.numpy as jnp

    a = np.asarray(a)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def _unpack_array(a: np.ndarray, tag: str) -> np.ndarray:
    import jax.numpy as jnp

    if tag == "bfloat16":
        return a.view(jnp.bfloat16)
    return a.astype(np.dtype(tag), copy=False)


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
        if getattr(lvu.engine, "pp_mesh", None) is not None:
            raise ValueError(
                "chat sessions do not support pipeline parallelism yet "
                "(the session holds a KVCache value; pp keeps the cache "
                "slabbed inside the PipelinedStack)"
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
            on_tokens=gen.get("on_tokens"),
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
                    on_tokens=gen.get("on_tokens"),
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

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        """Serialize the session — pruned video KV cache and all turn state —
        to one .npz so a LATER PROCESS resumes follow-ups at incremental
        cost (LVU.resume_chat). The reference persists only decoded frames
        (save_video_cache, reference lvu/models/qwen25_lvu.py:552-592); a
        resumed frame cache still pays the full prefill every session. Only
        populated cache slots are written: an hour-long rho=0.5 int8 session
        is ~1.5 GB on disk (7B), a 1024-frame one ~500 MB."""
        if self._cache is None:
            raise RuntimeError(
                "nothing to save: ask at least one question first"
            )
        cache = self._cache
        length = np.asarray(cache.length)
        hi = int(length.max())
        k, k_dtype = _pack_array(cache.k[:, :, :hi])
        v, v_dtype = _pack_array(cache.v[:, :, :hi])
        arrays = {
            "k": k,
            "v": v,
            "length": length,
            "ids": self._ids,
            "tail": np.asarray(self._tail, np.int64),
            "pos_prefix": np.asarray(self._pos_prefix),
        }
        if cache.quantized:
            arrays["k_scale"] = np.asarray(cache.k_scale[:, :, :hi])
            arrays["v_scale"] = np.asarray(cache.v_scale[:, :, :hi])
        meta = {
            "version": SESSION_FORMAT_VERSION,
            "fingerprint": _session_fingerprint(self.lvu),
            "k_dtype": k_dtype,
            "v_dtype": v_dtype,
            "capacity": int(cache.k.shape[2]),
            "cache_len": int(self._cache_len),
            "delta": int(self._delta),
            "ss0": int(self._ss0),
            "reserve": int(self._reserve),
            "video_path": self.video_path,
            "turns": [
                {k2: v2 for k2, v2 in t.items() if k2 != "timings"}
                for t in self.turns
            ],
        }
        with open(path, "wb") as f:
            np.savez(f, meta=json.dumps(meta), **arrays)

    @classmethod
    def load(cls, lvu, path: str) -> "ChatSession":
        """Rebuild a saved session under `lvu`. The live config must match
        the saved session's KV-semantics fields exactly (fingerprint check):
        the cached KV was pruned and positioned under those values."""
        import jax.numpy as jnp

        from quickvideo_tpu.ops.kv_cache import KVCache

        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        if meta["version"] != SESSION_FORMAT_VERSION:
            raise ValueError(
                f"session file version {meta['version']} != "
                f"{SESSION_FORMAT_VERSION}"
            )
        want = _session_fingerprint(lvu)
        got = meta["fingerprint"]
        # JSON round-trips tuples as lists; normalize before comparing
        norm = lambda d: json.loads(json.dumps(d))  # noqa: E731
        if norm(want) != norm(got):
            diff = {
                k: (got.get(k), norm(want)[k])
                for k in norm(want)
                if got.get(k) != norm(want)[k]
            }
            raise ValueError(
                f"saved session's config does not match this LVU's "
                f"(saved, current): {diff}"
            )
        cp_mesh = getattr(lvu.engine, "cp_mesh", None)
        session = cls(lvu, meta["video_path"])
        session._reserve = meta["reserve"]
        k = _unpack_array(data["k"], meta["k_dtype"])
        v = _unpack_array(data["v"], meta["v_dtype"])
        L, H, hi, D = k.shape
        capacity = meta["capacity"]
        if cp_mesh is not None:
            # CP shards the capacity axis over sp: round the resumed cache
            # up to the CP quantum (same rule as a fresh prefill's capacity
            # plan; the extra tail slots are garbage-above-length)
            quantum = 4096 * cp_mesh.shape["sp"]
            capacity = -(-capacity // quantum) * quantum
        quantized = "k_scale" in data

        def grow(a, fill_dtype):
            full = np.zeros(a.shape[:2] + (capacity,) + a.shape[3:],
                            dtype=fill_dtype)
            full[:, :, :hi] = a
            return jnp.asarray(full)

        cache = KVCache(
            k=grow(k, k.dtype),
            v=grow(v, v.dtype),
            length=jnp.asarray(data["length"], jnp.int32),
            k_scale=(
                grow(data["k_scale"][..., None], np.float32)[..., 0]
                if quantized else None
            ),
            v_scale=(
                grow(data["v_scale"][..., None], np.float32)[..., 0]
                if quantized else None
            ),
        )
        if cp_mesh is not None:
            from quickvideo_tpu.parallel.context_parallel import (
                shard_cache_cp,
            )

            cache = shard_cache_cp(cache, cp_mesh)
        elif getattr(lvu.engine, "tp_cache_mesh", None) is not None:
            from quickvideo_tpu.parallel.sharding import shard_cache

            cache = shard_cache(cache, lvu.engine.tp_cache_mesh)
        else:
            import jax

            cache = jax.device_put(cache)
        session._cache = cache
        session._cache_len = meta["cache_len"]
        session._delta = meta["delta"]
        session._ss0 = meta["ss0"]
        session._ids = np.asarray(data["ids"], np.int64)
        session._tail = [int(t) for t in data["tail"]]
        session._pos_prefix = np.asarray(data["pos_prefix"])
        session.turns = list(meta["turns"])
        return session
