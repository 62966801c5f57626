"""Batched offline QA: amortized generate over N same-video requests.

The reference gets evaluation throughput by sharding examples across 8 GPU
processes with `accelerate launch` (reference README.md:398-412). On a TPU
chip the dominant per-sample cost for the lmms-eval shape (one video, many
multiple-choice questions) is the VIDEO prefill, which is identical for
every question — so it runs ONCE and each question's suffix prefill +
decode runs against a copy of the shared pruned cache through the engine's
single-sample compiled programs. Per-question cost collapses from a full
prefill to a ~32-token bucket prefill + a short decode.

(Design note: two fully-vmapped formulations were implemented and measured
SLOWER than sequential on v5e — see the comment in generate_batch.)

Constraints (v1): every request in a batch must share the video geometry —
identical input_ids up to the video end (same chat prefix, same
grid/groups); questions (the suffix) may differ in content and length.
Greedy decode only; query-based predictors excluded (their prompt-append
changes per-sample group shapes).
"""

from __future__ import annotations

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
    """Shared-video-prefill amortizer over an LVUEngine."""

    def __init__(self, engine: LVUEngine):
        self.eng = engine
        if engine.lvu.query_based:
            raise ValueError("batched mode does not support query-based "
                             "predictors (per-sample prompt appends)")

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

        # 64-row table bucket, matching the engine (stable traced shapes)
        n_dec = lvu.max_decode_tokens + 64
        n_dec += (-(l_max + n_dec)) % 64
        dec_pos = text_positions(l_max + delta, n_dec)
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
        caches = kvc.init_cache(
            cfg.text.num_hidden_layers, cfg.text.num_key_value_heads,
            capacity, cfg.text.head_dim, dtype=eng.dtype, quantized=quant,
        )

        # --- grouped prefill ONCE (every sample shares the video; its KV
        # trajectory is question-independent), then each question's tiny
        # suffix+decode runs through the engine's single-sample programs
        # against a copy of the shared cache. This amortizes the expensive
        # part — B identical video prefills collapse to one. (Two vmapped
        # designs were tried and measured SLOWER than sequential: fully
        # vmapped prefill at 0.53x — vmapped stacked-cache updates and the
        # vmapped flash kernel both degrade — and vmapped suffix+decode
        # after a fork at 0.89x, because per-sample lengths turn every
        # decode append into an XLA scatter.)
        ids_shared = jnp.asarray(ids_list[0][:ss], jnp.int32)
        n_layers = cfg.text.num_hidden_layers
        past = 0
        # only request 0's pixels are consumed (the prefill is shared);
        # materializing every request's groups would run B-1 redundant
        # video decodes for streaming inputs
        pixel_groups0 = list(requests[0].pixel_groups)
        cache0 = caches
        for gi, grid in enumerate(ggrids0):
            in_len = group_input_lens[gi]
            pix = jnp.asarray(pixel_groups0[gi])
            if pix.dtype != jnp.uint8:
                pix = pix.astype(eng.dtype)
            vis = eng._vision_jit(
                eng.params, cfg, pix, grid, eng._layout_arrays(grid),
                native_hw=requests[0].native_hw,
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
            cache0 = eng._group_jit(
                eng.params["language"], cache0, ids_shared, cos, sin,
                np.int32(past), vis, None, np.int32(gi), spec=spec,
            )
            past += in_len

        shared_len = int(np.asarray(cache0.length).max())

        # --- per-question suffix prefill + decode over a cache copy; the
        # rope tables are shared (positions depend only on the row index
        # and the common video geometry) and every sample reuses the
        # engine's already-compiled bucketed final-prefill and
        # single-dispatch decode programs
        from quickvideo_tpu.utils.timing import SpanTimer

        result = []
        for i in range(b):
            cache_i = (
                cache0 if i == b - 1  # last sample may consume the original
                else jax.tree.map(jnp.copy, cache0)
            )
            state = {
                "cos": cos,
                "sin": sin,
                "suffix_start": ss,
                "L": int(lens[i]),
                "ids": ids_list[i],
                "cache_len": shared_len,
            }
            toks, _, _ = eng._generate_from_cache(
                cache_i, state, max_new_tokens, list(eos_token_ids),
                greedy=True, temperature=1.0, timer=SpanTimer(),
            )
            result.append(np.asarray(toks, np.int64))
        return result
