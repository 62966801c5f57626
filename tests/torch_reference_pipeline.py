"""Reference-faithful torch pipeline: grouped prefill + per-layer KV pruning
+ greedy decode on the HF tiny Qwen2.5-VL — the cross-implementation ORACLE
for QA-algorithm parity (VERDICT r1 item 4).

This is an independent reimplementation of the reference's semantics — NOT a
copy of its code — following:
  - group geometry: group 0 absorbs the pre-video prompt, the suffix prompt
    goes to the final prefill (reference lvu/models/qwen25_vl.py:464-474,
    524-539)
  - positions computed once for the full sequence, sliced contiguously per
    group (reference :418-425, 491-493); retained tokens keep their original
    mRoPE positions (never renumbered)
  - per-layer post-attention prune of the current group's cache segment
    (reference lvu/utils.py:197-376): key_norms_small keeps the k tokens
    with the SMALLEST heads-flattened L2 key norm (utils.py:129-136);
    query-based modes keep the k with the largest accumulated prompt->key
    attention (utils.py:55-57, lvu/lvu_cache.py:90-117)
  - query-based mode: the suffix prompt rides appended to every group's
    input; its K/V are stripped before caching; attention over the group
    runs with a bottom-right-aligned causal mask over (q=video+prompt,
    k=past+video) — flash-attn semantics when k_len > q_len
  - top_p fraction resolves against the current group's video length
    (utils.py:241-242)

Everything runs in f32 eager torch so the JAX engine (also f32 on CPU) can
be compared token-for-token and index-set-for-index-set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import torch
from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
    apply_multimodal_rotary_pos_emb,
)


def _repeat_kv(x: torch.Tensor, n_rep: int) -> torch.Tensor:
    # (B, Hkv, L, D) -> (B, Hkv*n_rep, L, D)
    b, h, l, d = x.shape
    if n_rep == 1:
        return x
    return x[:, :, None].expand(b, h, n_rep, l, d).reshape(b, h * n_rep, l, d)


def _key_norms_small_indices(k_seg: torch.Tensor, keep: int) -> torch.Tensor:
    """k_seg: (Hkv, L, D). Keep-smallest heads-flattened L2 norm; returned
    sorted by position (boolean-mask gather order, reference
    lvu/utils.py:133-136,191-194)."""
    h, l, d = k_seg.shape
    norms = k_seg.permute(1, 0, 2).reshape(l, h * d).norm(2, dim=-1)
    idx = torch.argsort(norms, stable=True)[:keep]
    return torch.sort(idx).values


def _query_attention_indices(accum: torch.Tensor, keep: int) -> torch.Tensor:
    """Largest accumulated prompt->key scores (reference lvu/utils.py:55-57)."""
    idx = torch.argsort(accum, descending=True, stable=True)[:keep]
    return torch.sort(idx).values


def _attention_weights_sum_indices(
    p_cols: torch.Tensor, keep: int
) -> torch.Tensor:
    """p_cols: (Lq, seg_len) head-mean attention probs of the group's query
    rows over the group's OWN key columns (full softmax denominator). Column
    i's score is the sum over query rows >= i (reference lvu/utils.py:64-69:
    `attn_weights_i[i:, i].sum()`); keep the largest, position order."""
    lq, seg = p_cols.shape
    rows = torch.arange(lq)[:, None]
    cols = torch.arange(seg)[None, :]
    scores = p_cols.masked_fill(rows < cols, 0.0).sum(dim=0)
    idx = torch.argsort(scores, descending=True, stable=True)[:keep]
    return torch.sort(idx).values


@dataclass
class RefTrace:
    """Per-(group, layer) retained index sets + final tokens, for comparison."""

    retained: List[List[np.ndarray]] = field(default_factory=list)
    tokens: Optional[np.ndarray] = None
    cache_lengths: Optional[List[int]] = None


@torch.no_grad()
def run_reference_pipeline(
    hf,
    ids: np.ndarray,
    pixels: np.ndarray,  # (S, patch_input_dim)
    grid_thw,
    second_per_grid_ts: float,
    groups_t,  # temporal patches per group
    *,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    predict_type: str = "key_norms_small",
    max_new_tokens: int = 6,
    # reference decay schedules (lvu/utils.py:244-251): applied per layer
    # AFTER top_p resolution
    top_k_decay_type: Optional[str] = None,
    top_k_decay_factor: float = 0.5,
    # cascade activation pruning (lvu/lvu_config.py:50-55 ->
    # utils.py:277,344-372): layers >= this index also prune the hidden
    # states / positions fed to the NEXT layer
    prefill_prune_starting_layer: Optional[int] = None,
    # reference qwen25_vl.py:502-516: False = each group attends only
    # itself (no past passed to the group forward); pruned K/V still
    # concatenate into the running cache for the final prefill
    adaptive_local_attention: bool = True,
    # reference qwen25_lvu.py generate wrapper (lvu/models/qwen25_vl.py:539):
    # enable pruning during the final/suffix prefill too
    do_top_k_for_query: bool = False,
) -> RefTrace:
    model = hf.model
    lm = model.language_model
    layers = list(lm.layers)
    tcfg = hf.config.text_config
    n_rep = tcfg.num_attention_heads // tcfg.num_key_value_heads
    head_dim = tcfg.hidden_size // tcfg.num_attention_heads
    scale = head_dim ** -0.5
    query_based = "query" in predict_type

    ids_t = torch.tensor(np.asarray(ids))[None]
    L = ids_t.shape[1]

    # vision + embedding scatter (HF forward path)
    vis = model.visual(
        torch.tensor(np.asarray(pixels), dtype=torch.float32),
        grid_thw=torch.tensor([list(grid_thw)]),
    )
    x_full = lm.embed_tokens(ids_t)
    vid_mask = ids_t[0] == hf.config.video_token_id
    x_full[0, vid_mask] = vis.to(x_full.dtype)

    # full-sequence mRoPE positions, once
    position_ids, delta = model.get_rope_index(
        ids_t,
        video_grid_thw=torch.tensor([list(grid_thw)]),
        second_per_grid_ts=torch.tensor([second_per_grid_ts]),
        attention_mask=torch.ones_like(ids_t),
    )
    # cos/sin for any position row set: rotary_emb(x, pos (3, B, L))
    def rope_tables(pos):
        return lm.rotary_emb(x_full, pos)

    # group geometry
    vid_idx = np.nonzero(np.asarray(ids) == hf.config.video_token_id)[0]
    first_vid = int(vid_idx[0])
    suffix_start = int(vid_idx[-1]) + 1
    t, h, w = grid_thw
    sm = hf.config.vision_config.spatial_merge_size
    tokens_per_t = (h // sm) * (w // sm)
    group_tokens = [tg * tokens_per_t for tg in groups_t]
    group_input_lens = list(group_tokens)
    group_input_lens[0] += first_vid

    prompt_ids = np.asarray(ids)[suffix_start:]
    prompt_len = len(prompt_ids) if query_based else 0
    x_prompt = lm.embed_tokens(torch.tensor(prompt_ids)[None]) if prompt_len else None

    # per-layer KV cache: lists of (Hkv, len, D)
    cache_k = [torch.zeros(tcfg.num_key_value_heads, 0, head_dim) for _ in layers]
    cache_v = [torch.zeros(tcfg.num_key_value_heads, 0, head_dim) for _ in layers]
    trace = RefTrace(retained=[])

    def layer_forward(li, x, cos, sin, past_k, past_v, *, q_mask_kind,
                      video_len):
        """One decoder layer over x (1, Lq, C). Returns (x_out, k_new, v_new,
        accum, p_cols) where k_new/v_new are the VIDEO-only K/V (prompt
        stripped), accum the prompt->key scores (None unless query mode), and
        p_cols the (Lq, Lq) head-mean attention probs over the group's own
        key columns (for the attention-statistics predictors)."""
        layer = layers[li]
        lq = x.shape[1]
        hst = layer.input_layernorm(x)
        q = layer.self_attn.q_proj(hst).view(1, lq, -1, head_dim).transpose(1, 2)
        k = layer.self_attn.k_proj(hst).view(1, lq, -1, head_dim).transpose(1, 2)
        v = layer.self_attn.v_proj(hst).view(1, lq, -1, head_dim).transpose(1, 2)
        q, k = apply_multimodal_rotary_pos_emb(
            q, k, cos, sin, tcfg.rope_scaling["mrope_section"]
        )

        accum = None
        if q_mask_kind == "query":
            # strip prompt K/V before caching; accumulate prompt->video-key
            # attention: softmax over video keys only, no causal, summed over
            # prompt queries, averaged over query heads (lvu_cache.py:100-116)
            k_vid = k[:, :, :video_len]
            v_vid = v[:, :, :video_len]
            q_prompt = q[:, :, video_len:]
            scores = torch.einsum(
                "bhqd,bhkd->bhqk", q_prompt,
                _repeat_kv(k_vid, n_rep),
            ) * scale
            accum = scores.softmax(-1).sum(dim=2).mean(dim=1)[0]  # (video_len,)
            k_use = torch.cat([past_k[None], k_vid], dim=2)
            v_use = torch.cat([past_v[None], v_vid], dim=2)
        else:
            k_use = torch.cat([past_k[None], k], dim=2)
            v_use = torch.cat([past_v[None], v], dim=2)

        kl = k_use.shape[2]
        att = torch.einsum(
            "bhqd,bhkd->bhqk", q, _repeat_kv(k_use, n_rep)
        ) * scale
        # bottom-right-aligned causal (flash semantics for k_len >= q_len):
        # query row i attends key col j iff j <= i + k_len - q_len
        rows = torch.arange(lq)[:, None]
        cols = torch.arange(kl)[None, :]
        causal = cols <= rows + (kl - lq)
        att = att.masked_fill(~causal[None, None], float("-inf"))
        p = att.softmax(-1)
        # flash semantics: a row with NO attendable key outputs zeros (under
        # the bottom-right mask early video rows in query mode have none);
        # plain softmax would produce NaNs there
        has_key = causal.any(dim=-1)  # (lq,)
        p = torch.where(has_key[None, None, :, None], p, torch.zeros(()))
        p = torch.nan_to_num(p)
        out = torch.einsum("bhqk,bhkd->bhqd", p, _repeat_kv(v_use, n_rep))
        out = out.transpose(1, 2).reshape(1, lq, -1)
        x = x + layer.self_attn.o_proj(out)
        x = x + layer.mlp(layer.post_attention_layernorm(x))
        # head-mean probs over the group's OWN columns (the appended segment,
        # last lq columns of k_use) under the FULL softmax denominator —
        # reference utils.py:33 `attn_weights[bz_i].mean(0)[:, -k_len:]`
        p_cols = p[0].mean(0)[:, kl - lq:]
        if q_mask_kind == "query":
            return x, k[:, :, :video_len][0], v[:, :, :video_len][0], accum, p_cols
        return x, k[0], v[0], accum, p_cols

    total_layers = len(layers)

    def resolve_keep(li, seg_len):
        """Effective per-layer k: top_p fraction of the CURRENT segment
        length (reference lvu/utils.py:241-242), then the decay schedule
        (utils.py:244-251). 0 = no pruning for this (layer, segment)."""
        keep = top_k
        if top_p is not None and top_p >= 0:
            keep = min(keep or seg_len, int(seg_len * top_p))
        if not top_k_decay_type:
            pass
        elif top_k_decay_type == "linear":
            keep = keep - int(keep * (li / total_layers))
        elif top_k_decay_type == "exponential":
            keep = int(keep * (top_k_decay_factor ** li))
        else:
            raise ValueError(top_k_decay_type)
        if not keep or keep <= 0 or seg_len <= keep:
            return 0
        return keep

    def select_indices(k_new, accum, p_cols, keep):
        if predict_type == "key_norms_small":
            return _key_norms_small_indices(k_new, keep)
        if predict_type == "query_attention_weights":
            return _query_attention_indices(accum, keep)
        if predict_type == "attention_weights_sum":
            return _attention_weights_sum_indices(p_cols, keep)
        raise ValueError(predict_type)

    psl = prefill_prune_starting_layer
    assert not (psl is not None and prompt_len), (
        "oracle: cascade + query-based not combined (engine matches)"
    )

    # --- grouped prefill ---
    offset = 0
    for gi, in_len in enumerate(group_input_lens):
        x_g = x_full[:, offset : offset + in_len]
        pos_g = position_ids[:, :, offset : offset + in_len + prompt_len]
        if prompt_len:
            x_g = torch.cat([x_g, x_prompt], dim=1)
        cos, sin = rope_tables(pos_g)
        trace.retained.append([])
        video_len = in_len
        x_cur = x_g
        cos_cur, sin_cur = cos, sin
        for li in range(len(layers)):
            # adaptive_local_attention=False: the group forward sees NO past
            # (reference qwen25_vl.py:502-516 omits past_key_values); the
            # pruned K/V still concatenate into the running cache below
            past_k = cache_k[li] if adaptive_local_attention else cache_k[li][:, :0]
            past_v = cache_v[li] if adaptive_local_attention else cache_v[li][:, :0]
            x_cur, k_new, v_new, accum, p_cols = layer_forward(
                li, x_cur, cos_cur, sin_cur, past_k, past_v,
                q_mask_kind="query" if prompt_len else "plain",
                video_len=video_len,
            )
            seg_len = k_new.shape[1]
            keep = resolve_keep(li, seg_len)
            if keep:
                idx = select_indices(k_new, accum, p_cols, keep)
                trace.retained[gi].append(np.asarray(idx))
                k_new = k_new[:, idx]
                v_new = v_new[:, idx]
                # cascade activation pruning (prune_for_next_layer): the
                # NEXT layer sees only the kept rows — hidden states and
                # rope rows gathered, segment length shrinks
                if psl is not None and psl >= 0 and li >= psl \
                        and li < total_layers - 1:
                    x_cur = x_cur[:, idx]
                    cos_cur = cos_cur.index_select(-2, idx)
                    sin_cur = sin_cur.index_select(-2, idx)
                    video_len = keep
            else:
                trace.retained[gi].append(np.arange(seg_len))
            cache_k[li] = torch.cat([cache_k[li], k_new], dim=1)
            cache_v[li] = torch.cat([cache_v[li], v_new], dim=1)
        offset += in_len

    # --- final (suffix) prefill; prunes only under do_top_k_for_query
    # (reference wraps generate with lvu_config.enable=do_top_k_for_query,
    # lvu/models/qwen25_vl.py:538-540) ---
    x_s = x_full[:, suffix_start:L]
    pos_s = position_ids[:, :, suffix_start:L]
    cos, sin = rope_tables(pos_s)
    x_cur = x_s
    for li in range(len(layers)):
        x_cur, k_new, v_new, _, p_cols = layer_forward(
            li, x_cur, cos, sin, cache_k[li], cache_v[li],
            q_mask_kind="plain", video_len=x_s.shape[1],
        )
        if do_top_k_for_query:
            seg_len = k_new.shape[1]
            keep = resolve_keep(li, seg_len)
            if keep:
                idx = select_indices(k_new, None, p_cols, keep)
                k_new = k_new[:, idx]
                v_new = v_new[:, idx]
        cache_k[li] = torch.cat([cache_k[li], k_new], dim=1)
        cache_v[li] = torch.cat([cache_v[li], v_new], dim=1)

    # --- greedy decode (reference model.generate continuation:
    # rope_deltas semantics — decode position = L + delta + step) ---
    logits = hf.lm_head(lm.norm(x_cur[:, -1]))
    tokens = [int(logits.argmax())]
    d = int(delta[0])
    for step in range(max_new_tokens - 1):
        pos_val = L + d + step
        pos = torch.full((3, 1, 1), pos_val, dtype=position_ids.dtype)
        cos, sin = rope_tables(pos)
        x_cur = lm.embed_tokens(torch.tensor([[tokens[-1]]]))
        for li in range(len(layers)):
            x_cur, k_new, v_new, _, _ = layer_forward(
                li, x_cur, cos, sin, cache_k[li], cache_v[li],
                q_mask_kind="plain", video_len=1,
            )
            cache_k[li] = torch.cat([cache_k[li], k_new], dim=1)
            cache_v[li] = torch.cat([cache_v[li], v_new], dim=1)
        logits = hf.lm_head(lm.norm(x_cur[:, -1]))
        tokens.append(int(logits.argmax()))

    trace.tokens = np.asarray(tokens, np.int64)
    trace.cache_lengths = [int(ck.shape[1]) for ck in cache_k]
    return trace
