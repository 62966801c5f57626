"""Batched offline QA: in-chip data-parallel generate over N same-video-
geometry requests.

The reference gets evaluation throughput by sharding examples across 8 GPU
processes with `accelerate launch` (reference README.md:398-412); a TPU chip
can instead batch the whole prefill+decode as one vmapped program — the
language stack's matmuls grow a batch dimension (better MXU utilization at
small per-sample shapes) and one dispatch drives B requests.

Constraints (v1): every request in a batch must share the video geometry —
identical input_ids up to the video end (same chat prefix, same
grid/groups); questions (the suffix) may differ in content and length.
Exactly the lmms-eval shape: one video, many multiple-choice questions.
Greedy decode only; query-based predictors excluded (their prompt-append
changes per-sample group shapes).

Memory: B caches are resident — size the batch as
B * layers * kv_heads * capacity * head_dim * bytes alongside the weights.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.models.qwen25_vl.language import StepSpec
from quickvideo_tpu.ops import kv_cache as kvc
from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs
from quickvideo_tpu.config import resolve_effective_top_k


class BatchedQAEngine:
    """vmapped view over an LVUEngine's compiled step bodies."""

    def __init__(self, engine: LVUEngine):
        self.eng = engine
        if engine.lvu.query_based:
            raise ValueError("batched mode does not support query-based "
                             "predictors (per-sample prompt appends)")
        self._jits = {}

    # -- vmapped jit builders (cached per static spec) --------------------

    def _group_vjit(self, spec):
        key = ("group", spec)
        if key not in self._jits:
            e = self.eng

            def f(p, cache, ids, cos, sin, off, vis, gi):
                return e._group_body(
                    p, cache, ids, cos, sin, off, vis, None, gi, spec
                )

            self._jits[key] = jax.jit(jax.vmap(
                f, in_axes=(None, 0, None, None, None, None, 0, None)
            ), donate_argnums=(1,))
        return self._jits[key]

    def _final_vjit(self, spec):
        key = ("final", spec)
        if key not in self._jits:
            e = self.eng

            def f(p, cache, ids_pad, cos, sin, off, valid):
                return e._final_prefill_body(
                    p, cache, ids_pad, cos, sin, off, valid, spec
                )

            self._jits[key] = jax.jit(jax.vmap(
                f, in_axes=(None, 0, 0, None, None, None, 0)
            ), donate_argnums=(1,))
        return self._jits[key]

    def _decode_vjit(self, spec):
        key = ("decode", spec)
        if key not in self._jits:
            e = self.eng

            def f(p, cache, tok0, cos_c, sin_c):
                return e._decode_chunk_body_fixed(
                    p, cache, tok0, cos_c, sin_c, spec
                )

            self._jits[key] = jax.jit(jax.vmap(
                f, in_axes=(None, 0, 0, 0, 0)
            ), donate_argnums=(1,))
        return self._jits[key]

    def _vision_vjit(self, grid, native_hw=None):
        key = ("vision", grid, native_hw)
        if key not in self._jits:
            cfg = self.eng.cfg

            def f(p, px, la):
                return qmodel.encode_video_group(
                    p, cfg, px, grid, la, native_hw=native_hw
                )

            self._jits[key] = jax.jit(jax.vmap(f, in_axes=(None, 0, None)))
        return self._jits[key]

    # -- main entry -------------------------------------------------------

    def generate_batch(
        self,
        requests: Sequence[PrefillInputs],
        max_new_tokens: int,
        eos_token_ids: Sequence[int] = (),
    ) -> List[np.ndarray]:
        eng = self.eng
        cfg = eng.cfg
        lvu = eng.lvu
        b = len(requests)
        assert b >= 1
        # plan_capacity and the rope tables are sized from max_decode_tokens;
        # a larger request would silently clamp cache appends onto the last
        # slot — clamp here, mirroring LVUEngine.generate
        max_new_tokens = min(
            max_new_tokens or lvu.max_decode_tokens, lvu.max_decode_tokens
        )
        grid0 = tuple(int(x) for x in requests[0].video_grid_thw)
        ggrids0 = [tuple(int(x) for x in g) for g in requests[0].group_grids]
        ids_list = [np.asarray(r.input_ids) for r in requests]

        # shared geometry validation
        vid_idx = np.nonzero(ids_list[0] == cfg.video_token_id)[0]
        first_vid, last_vid = int(vid_idx[0]), int(vid_idx[-1])
        ss = last_vid + 1  # suffix start, shared
        for r, ids in zip(requests, ids_list):
            if tuple(int(x) for x in r.video_grid_thw) != grid0 or [
                tuple(int(x) for x in g) for g in r.group_grids
            ] != ggrids0:
                raise ValueError("batch requires identical video geometry")
            if len(ids) < ss or not np.array_equal(ids[:ss], ids_list[0][:ss]):
                raise ValueError(
                    "batch requires identical tokens up to the video end"
                )

        lens = np.array([len(i) for i in ids_list])
        l_max = int(lens.max())

        # rope tables once, at l_max (+ decode slack) — positions depend on
        # the shared video geometry and the row index only
        positions, delta = qmodel.rope_index_for(
            cfg, np.concatenate([
                ids_list[int(np.argmax(lens))],
            ]),
            video_grid_thw=np.array([grid0]),
            second_per_grid_ts=[requests[0].second_per_grid_ts],
        )
        from quickvideo_tpu.models.qwen25_vl.rope import (
            precompute_mrope_cos_sin_device,
            text_positions,
        )

        dec_pos = text_positions(l_max + delta, lvu.max_decode_tokens + 64)
        all_pos = np.concatenate([positions, dec_pos], axis=1)
        cos, sin = precompute_mrope_cos_sin_device(
            jnp.asarray(all_pos, jnp.int32), cfg.text.head_dim,
            cfg.text.mrope_section, cfg.text.rope_theta,
        )

        # capacity & stacked caches
        group_tokens = []
        for t_g, h, w in ggrids0:
            sm = cfg.vision.spatial_merge_size
            group_tokens.append(t_g * (h // sm) * (w // sm))
        group_input_lens = list(group_tokens)
        group_input_lens[0] += first_vid
        capacity = eng.plan_capacity(group_input_lens, 0, int(lens.max()) - ss)
        if lvu.kv_cache_capacity:
            if capacity > lvu.kv_cache_capacity:
                raise ValueError(
                    f"needs {capacity} KV slots > kv_cache_capacity"
                )
            capacity = lvu.kv_cache_capacity
        quant = lvu.kv_cache_dtype == "int8"
        caches = jax.vmap(lambda _: kvc.init_cache(
            cfg.text.num_hidden_layers, cfg.text.num_key_value_heads,
            capacity, cfg.text.head_dim, dtype=eng.dtype, quantized=quant,
        ))(jnp.arange(b))

        # --- grouped prefill, one vmapped dispatch per group ---
        ids_shared = jnp.asarray(ids_list[0][:ss], jnp.int32)
        n_layers = cfg.text.num_hidden_layers
        past = 0
        pixel_iters = [list(r.pixel_groups) for r in requests]
        for gi, grid in enumerate(ggrids0):
            in_len = group_input_lens[gi]
            pix = jnp.asarray(np.stack([pg[gi] for pg in pixel_iters]))
            if pix.dtype != jnp.uint8:
                pix = pix.astype(eng.dtype)
            vis = self._vision_vjit(grid, requests[0].native_hw)(
                eng.params, pix, eng._layout_arrays(grid)
            )
            spec = StepSpec(
                cfg=cfg.text, q_len=in_len,
                keep_k=resolve_effective_top_k(lvu, 0, n_layers, in_len),
                predict_type=lvu.top_k_predict_type,
                needs_probs=lvu.needs_attn_stats,
                attn_impl=lvu.attention_impl,
                attend_past=lvu.adaptive_local_attention,
                kv_quant=quant,
            )
            caches = self._group_vjit(spec)(
                eng.params["language"], caches, ids_shared, cos, sin,
                np.int32(past), vis, np.int32(gi),
            )
            past += in_len

        # --- final (question) prefill: per-sample padded bucket ---
        suffix_lens = lens - ss
        bucket = max(32, int(-(-suffix_lens.max() // 32) * 32))
        ids_pad = np.zeros((b, bucket), np.int64)
        for i, ids in enumerate(ids_list):
            ids_pad[i, : lens[i] - ss] = ids[ss:]
        fspec = StepSpec(
            cfg=cfg.text, q_len=bucket, keep_k=0,
            attn_impl=lvu.attention_impl, kv_quant=quant,
        )
        caches, logits = self._final_vjit(fspec)(
            eng.params["language"], caches, jnp.asarray(ids_pad, jnp.int32),
            cos, sin, np.int32(ss), jnp.asarray(suffix_lens, jnp.int32),
        )

        # --- greedy chunked decode, all samples in lockstep ---
        dspec = StepSpec(cfg=cfg.text, q_len=1, keep_k=0, kv_quant=quant)
        toks = [[int(t)] for t in np.asarray(jnp.argmax(logits, axis=-1))]
        eos = set(int(t) for t in eos_token_ids)
        chunk = 32
        n_out = 1
        while n_out < max_new_tokens and not all(
            len(t) >= max_new_tokens or t[-1] in eos for t in toks
        ):
            i0 = n_out - 1
            # per-sample decode positions start at that sample's true length
            row_idx = jnp.asarray(
                lens[:, None] + i0 + np.arange(chunk)[None, :], jnp.int32
            )
            cos_c = jnp.take(cos, row_idx, axis=0)
            sin_c = jnp.take(sin, row_idx, axis=0)
            last = jnp.asarray([t[-1] for t in toks], jnp.int32)
            caches, out = self._decode_vjit(dspec)(
                eng.params["language"], caches, last, cos_c, sin_c,
            )
            out = np.asarray(out)
            for i in range(b):
                if len(toks[i]) >= max_new_tokens or toks[i][-1] in eos:
                    continue  # finished samples decode garbage; drop it
                for t in out[i].tolist():
                    if len(toks[i]) >= max_new_tokens:
                        break
                    toks[i].append(int(t))
                    if t in eos:
                        break
            n_out += chunk

        result = []
        for t in toks:
            t = t[:max_new_tokens]
            if eos:
                for j, tok in enumerate(t):
                    if tok in eos:
                        t = t[: j + 1]
                        break
            result.append(np.asarray(t, np.int64))
        return result
