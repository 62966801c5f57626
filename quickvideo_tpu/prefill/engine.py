"""Grouped-prefill state machine + decode loop.

TPU-native rebuild of the reference's chat driver (reference
lvu/models/qwen25_vl.py:348-548 `chat_lvu_model`, call stack in SURVEY.md
section 3.2):

  1. Full token sequence + mRoPE positions computed ONCE up front
     (reference :418-425); merged cos/sin tables precomputed host-side.
  2. Video token groups sliced per group; group 0 absorbs the pre-video
     prompt tokens (reference :474); the suffix prompt goes to the final
     prefill+generate call (reference :524-539).
  3. Each group runs one compiled `prefill_step`: vision encode -> embed
     scatter -> decoder stack with per-layer prune-and-append into the
     preallocated KV cache. Fixed group shapes => one compile per distinct
     (q_len, keep_k) — the engine pads the tail group when needed.
  4. Greedy/sampling decode continues from rope_delta + global length
     (reference rope_deltas semantics, :418-425).

The engine is synchronous w.r.t. its inputs; overlapped decode/preprocess
feeding is layered on top by quickvideo_tpu.video.stream (reference
interleaved engine equivalent).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from quickvideo_tpu.config import LVUConfig, kv_quant_mode, resolve_effective_top_k
from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.models.qwen25_vl.config import ModelConfig
from quickvideo_tpu.models.qwen25_vl.language import (
    StepSpec,
    compute_logits,
    decode_step,
    embed_tokens,
    prefill_step,
    prefill_step_unrolled,
)
from quickvideo_tpu.ops import kv_cache as kvc
from quickvideo_tpu.utils.timing import SpanTimer

Array = jax.Array


@dataclass
class PrefillInputs:
    """Everything the engine needs for one request, host-side.

    Built by the API layer / processor from a chat message; tests build it
    synthetically. `pixel_groups` may be a list (sync mode) or any iterator
    (streaming mode — overlapped decode feeds groups as they arrive).
    """

    input_ids: np.ndarray  # (L,) full packed sequence
    video_grid_thw: Optional[Tuple[int, int, int]]  # full-video grid; None
    # for image-only / text-only requests (no video placeholder span)
    pixel_groups: Iterable[np.ndarray]  # per group: (S_g, patch_input_dim)
    group_grids: Sequence[Tuple[int, int, int]]  # per group (t_g, h, w)
    second_per_grid_ts: float = 1.0
    num_video_tokens: Optional[int] = None
    native_hw: Optional[Tuple[int, int]] = None  # frames arrive at this
    # decoder-native (H, W); the vision program Lanczos-resamples to the
    # model grid on device (lvu.resize_on_device)
    # --- image inputs (reference inherits them from stock qwen_vl_utils,
    # lvu/models/qwen25_lvu.py:565; rope.get_rope_index already mixes
    # image+video grids) ---
    image_grid_thw: Optional[np.ndarray] = None  # (n_img, 3) rows (1, h, w)
    image_pixels: Optional[Sequence[np.ndarray]] = None  # per image: a
    # (1, 3, H, W) uint8 frame at the image's resized grid (the vision
    # program repeats it across the temporal patch, matching HF)


@dataclass
class GenerationResult:
    tokens: np.ndarray
    timings: dict = field(default_factory=dict)
    cache_length: int = 0
    prefill_tokens: int = 0
    kv_cache_bytes: int = 0  # actual retained KV bytes (max over layers)
    kv_unpruned_bytes: int = 0  # what an unpruned cache would hold
    
    @property
    def kv_memory_fraction(self) -> float:
        """retained / unpruned KV memory (reference headline: 0.5 at
        rho=0.5, README.md:44)."""
        return self.kv_cache_bytes / max(self.kv_unpruned_bytes, 1)


def enable_compilation_cache():
    """Persistent XLA compilation cache — first-run compiles over the remote
    TPU compile service take minutes; cached reruns take seconds. Delegates
    to the single canonical setup in utils/compile_cache.py (opt-out via
    QV_COMPILE_CACHE=0 or legacy QV_NO_COMPILE_CACHE; directory via
    QV_COMPILE_CACHE_DIR) so the engine and the standalone benchmarks share
    ONE cache dir and one env contract."""
    from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()


def _maybe_sync(x):
    """QV_SYNC_SPANS=1: force device sync inside each timing span so spans
    reflect true device time (diagnostics only — kills pipelining)."""
    import os

    if os.environ.get("QV_SYNC_SPANS"):
        jax.block_until_ready(x)
        # axon block_until_ready can be a no-op; force a tiny D2H. Slice ONE
        # element on device first — np.asarray on a full leaf would pull the
        # whole KV cache (GBs) across the tunnel per span.
        leaves = jax.tree.leaves(x)
        if leaves:
            np.asarray(leaves[0].ravel()[:1])
    return x


class LVUEngine:
    """One model + one LVUConfig; reusable across requests."""

    def __init__(
        self,
        params: dict,
        model_cfg: ModelConfig,
        lvu_cfg: LVUConfig,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        enable_compilation_cache()
        self.params = params
        self.cfg = model_cfg
        self.lvu = lvu_cfg
        self.dtype = dtype
        # one-time lane-padded copies of the vision qkv/wo weights for the
        # 2D padded-head attention path (padding inside the traced forward
        # re-derives them per block per group call — weights are jit
        # arguments, so XLA cannot hoist the pads)
        import os as _os

        if (
            "vision" in params
            and _os.environ.get("QV_VISION_2D", "1") != "0"
            and (
                bool(_os.environ.get("QV_PALLAS_INTERPRET"))
                or jax.default_backend() not in ("cpu", "gpu")
            )
        ):
            from quickvideo_tpu.models.qwen25_vl.vision import (
                add_padded_block_weights,
            )

            self.params = dict(params)
            self.params["vision"] = add_padded_block_weights(
                params["vision"], model_cfg.vision
            )
            # fused dual-GEMM+SwiGLU+quantize MLP path (int8 towers only):
            # gate|up concat-padded + row-padded wd (ops/fused_vision_mlp)
            from quickvideo_tpu.ops.quantization import vision_mlp_act_quant

            if vision_mlp_act_quant():
                from quickvideo_tpu.ops.fused_vision_mlp import (
                    fuse_vision_mlp_weights,
                )

                self.params["vision"] = fuse_vision_mlp_weights(
                    self.params["vision"], model_cfg.vision
                )
        # context parallelism: with an sp axis > 1 the KV cache capacity is
        # sharded across the mesh and attention over the past runs as
        # LSE-merged per-shard partials (VERDICT r1 item 5: auto-routed here,
        # not just in dryrun/unit tests)
        self.cp_mesh = None
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            self.cp_mesh = mesh
        # tensor parallelism: shard the KV cache's kv-head axis over tp so
        # appends of tp-sharded K/V rows stay local instead of all-gathering
        # into a replicated multi-GB buffer (cache_sharding's design,
        # parallel/sharding.py). CP takes precedence (capacity axis); tp
        # must divide the kv-head count or the cache stays replicated.
        self.tp_cache_mesh = None
        if (
            mesh is not None
            and self.cp_mesh is None
            and mesh.shape.get("pp", 1) == 1  # pp owns its slabbed cache
            and mesh.shape.get("tp", 1) > 1
            and model_cfg.text.num_key_value_heads % mesh.shape["tp"] == 0
        ):
            self.tp_cache_mesh = mesh
        # pipeline parallelism: layer slabs over a pp axis. Each request
        # builds a PipelinedStack (it owns the slabbed cache); video groups
        # ride the skewed pipeline, prefix/suffix/decode run as sequential
        # all-stage chunk passes (parallel/pipeline.py). Random predictors
        # draw from a different (equally valid) rng stream than the
        # single-device path: the stack folds one rng by global layer index
        # instead of per-group (deterministic predictors are bit-matched —
        # tests/test_pipeline_parallel.py).
        self.pp_mesh = None
        if mesh is not None and mesh.shape.get("pp", 1) > 1:
            if mesh.shape.get("sp", 1) > 1:
                raise ValueError(
                    "pp does not compose with sp inside a stage (context "
                    "parallelism is a non-pp mesh mode); tp inside a stage "
                    f"IS supported (mesh shape {dict(mesh.shape)})"
                )
            if model_cfg.text.num_hidden_layers % mesh.shape["pp"]:
                raise ValueError(
                    f"num_hidden_layers={model_cfg.text.num_hidden_layers} "
                    f"not divisible by pp={mesh.shape['pp']}"
                )
            self.pp_mesh = mesh
            from jax.sharding import NamedSharding, PartitionSpec

            # chunk/tick operands must be committed to the pp mesh's device
            # set (embeds/tables may come off programs placed on a different
            # set, e.g. the dryrun's dp x tp x sp mesh)
            self._pp_rep = NamedSharding(mesh, PartitionSpec())
        self._prefill_jit = jax.jit(
            prefill_step, static_argnames=("spec",), donate_argnames=("cache",)
        )
        self._prefill_unrolled_jit = jax.jit(
            prefill_step_unrolled,
            static_argnames=("specs",),
            donate_argnames=("cache",),
        )
        self._decode_jit = jax.jit(
            self._decode_body, static_argnames=("spec",), donate_argnames=("cache",)
        )
        self._vision_jit = jax.jit(
            qmodel.encode_video_group,
            static_argnames=("cfg", "grid_thw", "native_hw"),
        )
        self._layout_arrays_cache = {}
        self._embed_scatter_jit = jax.jit(self._embed_scatter)
        self._group_jit = jax.jit(
            self._group_body, static_argnames=("spec",),
            donate_argnames=("cache",),
        )
        self._group_unrolled_jit = jax.jit(
            self._group_unrolled_body, static_argnames=("specs",),
            donate_argnames=("cache",),
        )
        self._decode_chunk_jit = jax.jit(
            self._decode_chunk_body, static_argnames=("spec",),
            donate_argnames=("cache",),
        )
        self._decode_sample_chunk_jit = jax.jit(
            self._decode_sample_chunk_body,
            static_argnames=("spec", "top_p", "top_k"),
            donate_argnames=("cache",),
        )
        self._final_prefill_jit = jax.jit(
            self._final_prefill_body, static_argnames=("spec",),
            donate_argnames=("cache",),
        )
        # pp path building blocks: the group preamble (slice+embed+scatter)
        # as its own program feeding the pipeline tick, and a logits head
        # over the chunk pass's output hidden states
        self._preamble_jit = jax.jit(
            self._group_preamble, static_argnames=("spec",)
        )
        self._logits_jit = jax.jit(compute_logits, static_argnames=("cfg",))
        self._score_jit = jax.jit(
            self._score_body, static_argnames=("spec",),
            donate_argnames=("cache",),
        )
        self._score_gather_jit = jax.jit(self._score_gather)
        self._rng = jax.random.key(lvu_cfg.seed)
        self._base_rng = jax.random.key(lvu_cfg.seed + 1)

    # -- jit bodies ------------------------------------------------------

    def _embed_scatter(self, embed: Array, ids: Array, vis: Optional[Array],
                       img: Optional[Array] = None):
        # embed passed as an ARGUMENT — a closure capture would bake the
        # multi-GB embedding table into the HLO as a constant
        from quickvideo_tpu.ops.quantization import qtake

        x = qtake(embed, ids, self.dtype)
        if vis is not None:
            x = qmodel.merge_vision_embeddings(
                x, vis, ids, self.cfg.video_token_id
            )
        if img is not None:
            x = qmodel.merge_vision_embeddings(
                x, img, ids, self.cfg.image_token_id
            )
        return x

    def _decode_body(self, params, cache, token_id, cos, sin, spec):
        return decode_step(params, cache, token_id, cos, sin, spec)

    def _group_preamble(
        self, params_lang, ids_full, cos_full, sin_full, offset,
        vis, prompt_ids, group_idx, spec, img=None,
    ):
        """Shared group-step preamble: slice ids/positions at `offset`,
        embed + vision scatter, derive the per-group rng. One definition so
        the uniform (_group_body) and per-layer-spec (_group_unrolled_body)
        programs cannot drift. `img` carries image-tower embeddings for the
        image tokens inside this block (only group 0 — the prefix absorber —
        can contain them)."""
        in_len = spec.q_len - spec.prompt_len
        g_ids = jax.lax.dynamic_slice(ids_full, (offset,), (in_len,))
        if prompt_ids is not None:
            g_ids = jnp.concatenate([g_ids, prompt_ids])
        # reference slices positions CONTIGUOUSLY past the group
        # (qwen25_vl.py:492) — in query-based mode prompt tokens get the
        # positions of the tokens that follow the group (documented quirk)
        g_cos = jax.lax.dynamic_slice(
            cos_full, (offset, 0), (spec.q_len, cos_full.shape[1])
        )
        g_sin = jax.lax.dynamic_slice(
            sin_full, (offset, 0), (spec.q_len, sin_full.shape[1])
        )
        x = embed_tokens(params_lang, g_ids)
        if vis is not None:
            x = qmodel.merge_vision_embeddings(
                x, vis, g_ids, self.cfg.video_token_id
            )
        if img is not None:
            x = qmodel.merge_vision_embeddings(
                x, img, g_ids, self.cfg.image_token_id
            )
        rng = jax.random.fold_in(self._base_rng, group_idx)
        return x, g_cos, g_sin, rng

    def _group_body(
        self, params_lang, cache, ids_full, cos_full, sin_full, offset,
        vis, prompt_ids, group_idx, spec, img=None,
    ):
        """Whole-group step in ONE compiled program: slice ids/positions at
        `offset`, embed + vision scatter, run the decoder stack with
        prune-and-append. Returns the updated cache."""
        x, g_cos, g_sin, rng = self._group_preamble(
            params_lang, ids_full, cos_full, sin_full, offset,
            vis, prompt_ids, group_idx, spec, img=img,
        )
        cache, _ = prefill_step(params_lang, cache, x, g_cos, g_sin, rng, spec)
        return cache

    def _group_unrolled_body(
        self, params_lang, cache, ids_full, cos_full, sin_full, offset,
        vis, prompt_ids, group_idx, specs, img=None,
    ):
        x, g_cos, g_sin, rng = self._group_preamble(
            params_lang, ids_full, cos_full, sin_full, offset,
            vis, prompt_ids, group_idx, specs[0], img=img,
        )
        cache, _ = prefill_step_unrolled(
            params_lang, cache, x, g_cos, g_sin, rng, specs
        )
        return cache

    def _final_prefill_body(
        self, params_lang, cache, ids_pad, cos_full, sin_full, offset,
        valid, spec, img=None,
    ):
        """Padded-bucket suffix prefill + logits of the last VALID row, in
        one program (exact suffix shapes would recompile per question).
        `img` carries image-tower embeddings for image tokens in the suffix
        (pad rows beyond `valid` are zeros, never image ids)."""
        x = embed_tokens(params_lang, ids_pad)
        if img is not None:
            x = qmodel.merge_vision_embeddings(
                x, img, ids_pad, self.cfg.image_token_id
            )
        g_cos = jax.lax.dynamic_slice(
            cos_full, (offset, 0), (spec.q_len, cos_full.shape[1])
        )
        g_sin = jax.lax.dynamic_slice(
            sin_full, (offset, 0), (spec.q_len, sin_full.shape[1])
        )
        rng = jax.random.fold_in(self._base_rng, 2**31 - 1)
        cache, hidden = prefill_step(
            params_lang, cache, x, g_cos, g_sin, rng, spec, advance=valid
        )
        last = jax.lax.dynamic_index_in_dim(hidden, valid - 1, 0, keepdims=False)
        logits = compute_logits(params_lang, last, self.cfg.text)
        return cache, logits

    def _score_body(
        self, params_lang, cache, ids_pad, cos_w, sin_w, valid, cont_start,
        spec, img=None,
    ):
        """Teacher-forced continuation scoring in ONE program: run the
        padded [suffix + continuation] block through the stack against the
        video cache, log-softmax every row's logits, and gather the target
        (= next) token's logprob for the continuation rows. Row r predicts
        ids_pad[r+1]; continuation rows are [cont_start-1, valid-1).
        Returns (sum_logprob f32, all_greedy bool) — the lmms-eval
        `loglikelihood` contract (reference hookup README.md:398-412)."""
        x = embed_tokens(params_lang, ids_pad)
        if img is not None:
            x = qmodel.merge_vision_embeddings(
                x, img, ids_pad, self.cfg.image_token_id
            )
        rng = jax.random.fold_in(self._base_rng, 2**31 - 2)
        cache, hidden = prefill_step(
            params_lang, cache, x, cos_w, sin_w, rng, spec, advance=valid
        )
        logits = compute_logits(params_lang, hidden, self.cfg.text)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        r = jnp.arange(ids_pad.shape[0])
        targets = jnp.roll(ids_pad, -1)  # t[r] = ids_pad[r+1]; the rolled
        # last row is garbage but always masked (r < valid-1)
        mask = (r >= cont_start - 1) & (r < valid - 1)
        row_lp = jnp.take_along_axis(lp, targets[:, None], axis=-1)[:, 0]
        total = jnp.sum(jnp.where(mask, row_lp, 0.0))
        greedy = jnp.all(
            jnp.where(mask, jnp.argmax(logits, axis=-1) == targets, True)
        )
        return cache, total, greedy

    @staticmethod
    def _score_gather(logits, ids_pad, valid, cont_start):
        """Gather the continuation rows' target logprobs from a padded
        logits block — same masking contract as _score_body's tail (row r
        predicts ids_pad[r+1]; continuation rows are [cont_start-1,
        valid-1)). Used by the pp scoring path, where the logits head runs
        outside the stack's chunk program."""
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        r = jnp.arange(ids_pad.shape[0])
        targets = jnp.roll(ids_pad, -1)
        mask = (r >= cont_start - 1) & (r < valid - 1)
        row_lp = jnp.take_along_axis(lp, targets[:, None], axis=-1)[:, 0]
        total = jnp.sum(jnp.where(mask, row_lp, 0.0))
        greedy = jnp.all(
            jnp.where(mask, jnp.argmax(logits, axis=-1) == targets, True)
        )
        return total, greedy

    def _decode_chunk_body(self, params_lang, cache, tok0, cos_chunk,
                           sin_chunk, eos_ids, n_stop, spec):
        """Greedy decode of a whole generation device-side — ONE dispatch
        for up to max_decode_tokens (the transport RTT dominates per-token
        decode; per-32-token chunking paid one RTT per chunk). The
        lax.while_loop stops at EOS or at the traced `n_stop` bound (the
        request's max_new — traced so every request shares one compiled
        program at the max_decode_tokens static shape); each skipped step
        saves a full weight-streaming pass (~12-14 ms/token on the 7B).
        NOT lax.cond-per-step: a conditional over the cache carry breaks
        XLA's in-place aliasing and copies the cache every step (measured
        654 ms/token); while_loop keeps the same aliased-carry dataflow as
        scan. Unvisited output slots stay at the EOS-fill value (the host
        discards post-EOS tokens anyway)."""
        n = cos_chunk.shape[0]
        fill = eos_ids[0]

        def cond(carry):
            cache, tok, i, toks = carry
            bound = jnp.minimum(jnp.int32(n), n_stop)
            return (i < bound) & jnp.logical_not(jnp.any(tok == eos_ids))

        def body(carry):
            cache, tok, i, toks = carry
            cache, logits = decode_step(
                params_lang, cache, tok, cos_chunk[i][None],
                sin_chunk[i][None], spec,
            )
            nxt = jnp.argmax(logits).astype(jnp.int32)
            toks = toks.at[i].set(nxt)
            return cache, nxt, i + 1, toks

        cache, _, _, toks = jax.lax.while_loop(
            cond, body,
            (cache, tok0, jnp.int32(0), jnp.full((n,), fill, jnp.int32)),
        )
        return cache, toks

    def _decode_sample_chunk_body(
        self, params_lang, cache, tok0, cos_chunk, sin_chunk, rng,
        temperature, eos_ids, n_stop, spec, top_p, top_k,
    ):
        """Sampled decode of a whole chunk device-side: filter + categorical
        run in-graph, so sampling pays one transport RTT per chunk instead of
        per token (the reference samples inside HF generate on-device too).
        top_p/top_k are static (fixed per request); temperature is traced.
        Early exit at EOS or the traced n_stop bound via while_loop (see
        _decode_chunk_body)."""
        n = cos_chunk.shape[0]
        fill = eos_ids[0]

        def cond(carry):
            cache, tok, rng, i, toks = carry
            bound = jnp.minimum(jnp.int32(n), n_stop)
            return (i < bound) & jnp.logical_not(jnp.any(tok == eos_ids))

        def body(carry):
            cache, tok, rng, i, toks = carry
            rng, sub = jax.random.split(rng)
            cache, logits = decode_step(
                params_lang, cache, tok, cos_chunk[i][None],
                sin_chunk[i][None], spec,
            )
            flt = self._filter_logits(logits, top_p, top_k)
            nxt = jax.random.categorical(sub, flt / temperature).astype(
                jnp.int32
            )
            toks = toks.at[i].set(nxt)
            return cache, nxt, rng, i + 1, toks

        cache, _, _, _, toks = jax.lax.while_loop(
            cond, body,
            (cache, tok0, rng, jnp.int32(0), jnp.full((n,), fill, jnp.int32)),
        )
        return cache, toks

    def _pp_head(self):
        """Replicated {embed, norm, lm_head} on the pp mesh — the decode
        chunk's in-graph embed + logits head (one-time device_put)."""
        if not hasattr(self, "_pp_head_cache"):
            pl = self.params["language"]
            self._pp_head_cache = jax.device_put(
                {"embed": pl["embed"], "norm": pl["norm"],
                 "lm_head": pl["lm_head"]},
                self._pp_rep,
            )
        return self._pp_head_cache

    def _layout_arrays(self, grid):
        if grid not in self._layout_arrays_cache:
            from quickvideo_tpu.models.qwen25_vl.vision import layout_arrays_for

            self._layout_arrays_cache[grid] = layout_arrays_for(
                qmodel.layout_for(self.cfg, grid)
            )
        return self._layout_arrays_cache[grid]

    # -- planning --------------------------------------------------------

    def resolve_kv_dtype(self, capacity: int) -> str:
        """Resolve kv_cache_dtype='auto' to a concrete dtype for a request
        with `capacity` planned KV slots (config.resolve_auto_kv_dtype has
        the measured rule); explicit dtypes pass through."""
        if self.lvu.kv_cache_dtype != "auto":
            return self.lvu.kv_cache_dtype
        import os

        from quickvideo_tpu.config import resolve_auto_kv_dtype

        if not hasattr(self, "_weight_bytes"):
            self._weight_bytes = sum(
                getattr(a, "nbytes", 0) for a in jax.tree.leaves(self.params)
            )
        hbm_env = os.environ.get("QV_HBM_GB")
        if hbm_env:
            hbm = int(float(hbm_env) * (1 << 30))
        else:
            hbm = 16 << 30  # v5e default
            try:
                stats = jax.devices()[0].memory_stats()
                if stats and stats.get("bytes_limit"):
                    hbm = int(stats["bytes_limit"])
            except Exception:
                pass
        return resolve_auto_kv_dtype(
            capacity, self.cfg.text, self._weight_bytes, hbm,
            compute_itemsize=jnp.dtype(self.dtype).itemsize,
        )

    @staticmethod
    def _cache_quant(cache):
        """Quant mode as recorded BY the cache arrays themselves (robust for
        caches built under kv_cache_dtype='auto' or loaded from a saved chat
        session): k_scale+v_scale -> int8 K and V; k_scale only -> K-only."""
        if cache.k_scale is None:
            return False
        return True if cache.v_scale is not None else "k"

    def _uniform(self) -> bool:
        return (
            self.lvu.top_k_decay_type is None
            and self.lvu.prefill_prune_starting_layer is None
        )

    def _layer_specs(self, base: StepSpec) -> Tuple[StepSpec, ...]:
        """Per-layer specs for the unrolled path (decay / cascade)."""
        cfg = self.cfg.text
        n = cfg.num_hidden_layers
        specs = []
        q_len = base.q_len
        psl = self.lvu.prefill_prune_starting_layer
        for li in range(n):
            k = resolve_effective_top_k(self.lvu, li, n, q_len - base.prompt_len)
            cascade = (
                isinstance(psl, int) and psl >= 0 and li >= psl and k > 0
            )
            specs.append(
                dataclasses.replace(
                    base, q_len=q_len, keep_k=k, cascade=cascade
                )
            )
            if cascade and li < n - 1:
                q_len = k + base.prompt_len
        return tuple(specs)

    def plan_capacity(
        self, group_token_counts: Sequence[int], prefix_len: int,
        suffix_len: int,
    ) -> int:
        """Worst-case (max over layers) cache capacity in tokens."""
        n = self.cfg.text.num_hidden_layers
        # decode appends at most max_decode_tokens rows (the while_loop
        # stops at EOS/max_new in-graph); keep the 32-row rounding so the
        # capacity stays stable across small max_decode_tokens changes
        decode_budget = -(-self.lvu.max_decode_tokens // 32) * 32
        total = prefix_len + suffix_len + decode_budget
        for gt in group_token_counts:
            keeps = [
                resolve_effective_top_k(self.lvu, li, n, gt) or gt
                for li in range(n)
            ]
            total += max(keeps)
        # unified-kernel slack: during group i the buffer transiently holds
        # the RAW group at [length, length+G) before the compact overwrites it
        total += max(group_token_counts, default=0)
        # round up to a multiple of 4096: the stacked flash kernel needs
        # block_k to divide capacity (it shrinks block_k to a divisor —
        # an odd capacity would collapse it to 1, and the int8-KV variant
        # asserts 128-alignment), and the decode occupancy buckets are
        # 4096-granular anyway
        return -(-int(total) // 4096) * 4096

    # -- main entry points ----------------------------------------------

    def prefill(
        self,
        inputs: PrefillInputs,
        timer: Optional[SpanTimer] = None,
        extra_capacity: int = 0,
    ):
        """Run grouped prefill over the video; returns (cache, state dict for
        generate()). `extra_capacity` reserves additional KV slots beyond
        this request's plan (multi-turn chat sessions append future turns'
        suffixes and answers into the same cache)."""
        timer = timer or SpanTimer()
        cfg = self.cfg
        lvu = self.lvu
        ids = np.asarray(inputs.input_ids)
        L = len(ids)

        img_grids = None
        if inputs.image_grid_thw is not None and len(inputs.image_grid_thw):
            img_grids = np.asarray(inputs.image_grid_thw).reshape(-1, 3)
        with timer.span("rope"):
            positions, delta = qmodel.rope_index_for(
                cfg, ids,
                video_grid_thw=(
                    np.array([inputs.video_grid_thw])
                    if inputs.video_grid_thw is not None else None
                ),
                image_grid_thw=img_grids,
                second_per_grid_ts=(
                    [inputs.second_per_grid_ts]
                    if inputs.video_grid_thw is not None else None
                ),
            )
            # precompute decode positions too: text continuation from
            # max_pos+1 == L + delta (reference rope_deltas semantics)
            from quickvideo_tpu.models.qwen25_vl.rope import text_positions

            # extra decode rows pad the TABLE length to a 64-row bucket:
            # the cos/sin (and ids) lengths are traced shapes in every
            # program, so without bucketing each distinct question length
            # recompiled the whole program set (observed as "run 1 is 2x
            # slower" — the warmup question has a different length)
            n_dec = lvu.max_decode_tokens + 32
            n_dec += (-(L + n_dec)) % 64
            dec_pos = text_positions(L + delta, n_dec)
            all_pos = np.concatenate([positions, dec_pos], axis=1)
            # tables are built ON DEVICE: the host core is slow and the
            # (L, head_dim) tables would otherwise ship over the transport
            from quickvideo_tpu.models.qwen25_vl.rope import (
                precompute_mrope_cos_sin_device,
            )

            cos, sin = precompute_mrope_cos_sin_device(
                jnp.asarray(all_pos, jnp.int32),
                cfg.text.head_dim,
                cfg.text.mrope_section,
                cfg.text.rope_theta,
            )

        # --- token geometry (reference qwen25_vl.py:464-474) ---
        vid_idx = np.nonzero(ids == cfg.video_token_id)[0]
        n_vid = len(vid_idx)
        if n_vid == 0:
            if img_grids is None:
                raise ValueError(
                    "input_ids contain no video tokens "
                    f"(video_token_id={cfg.video_token_id}) and no images; "
                    "grouped video prefill needs a vision placeholder span"
                )
            # image-only request: no video groups — the whole sequence runs
            # through the final-prefill pass (image scatter included)
            suffix_start = 0
            group_tokens = []
            group_input_lens = []
        else:
            first_vid, last_vid = int(vid_idx[0]), int(vid_idx[-1])
            suffix_start = last_vid + 1
            group_tokens = []
            for t_g, h, w in inputs.group_grids:
                merged = t_g * (h // cfg.vision.spatial_merge_size) * (
                    w // cfg.vision.spatial_merge_size
                )
                group_tokens.append(merged)
            assert sum(group_tokens) == n_vid, (sum(group_tokens), n_vid)
            # group 0 absorbs the pre-video prompt tokens
            group_input_lens = list(group_tokens)
            group_input_lens[0] += first_vid

        # --- image encode (reference qwen25_lvu.py:565 via qwen_vl_utils;
        # images sit in the prefix — scattered inside group 0 — or the
        # suffix — scattered in the final prefill) ---
        img_prefix = img_suffix = None
        if img_grids is not None:
            pix_list = inputs.image_pixels or []
            if len(pix_list) != len(img_grids):
                raise ValueError(
                    f"{len(img_grids)} image grids but {len(pix_list)} "
                    "image pixel arrays"
                )
            embs = []
            with timer.span("vision"):
                for g, pix in zip(img_grids, pix_list):
                    gtup = tuple(int(v) for v in g)
                    p = jnp.asarray(pix)
                    if p.dtype != jnp.uint8:
                        p = p.astype(self.dtype)
                    embs.append(self._vision_jit(
                        self.params, cfg, p, gtup,
                        self._layout_arrays(gtup), native_hw=None,
                    ))
            img_embeds = (
                jnp.concatenate(embs, axis=0) if len(embs) > 1 else embs[0]
            )
            n_img_prefix = int(
                np.sum(ids[:suffix_start] == cfg.image_token_id)
            )
            n_img_total = int(np.sum(ids == cfg.image_token_id))
            if int(img_embeds.shape[0]) != n_img_total:
                raise ValueError(
                    f"image grids produce {int(img_embeds.shape[0])} tokens "
                    f"but input_ids contain {n_img_total} image placeholders"
                )
            img_prefix = img_embeds[:n_img_prefix] if n_img_prefix else None
            img_suffix = (
                img_embeds[n_img_prefix:]
                if n_img_total > n_img_prefix else None
            )

        capacity = self.plan_capacity(group_input_lens, 0, L - suffix_start)
        if extra_capacity:
            capacity = -(-(capacity + int(extra_capacity)) // 4096) * 4096
        # under CP the capacity must divide by the sp axis so shards are
        # equal — AND each shard must stay a multiple of 4096, or the flash
        # kernel's block_k divisor loop collapses toward 1 on shard
        # capacities with an odd factor (e.g. sp=3: 65536 -> 65538/3 =
        # 21846 = 2*3*11*331)
        quantum = 4096
        if self.cp_mesh is not None:
            quantum = 4096 * self.cp_mesh.shape["sp"]
            capacity = -(-capacity // quantum) * quantum
        if lvu.kv_cache_capacity:
            # fixed capacity pins cache shapes across requests (one compiled
            # program set regardless of video length, bounded by this cap).
            # Align DOWN to the quantum: the configured value is a memory
            # budget chosen to fit HBM beside the weights, so it is never
            # silently exceeded (rounding up by quantum-1 slots at sp=3 on
            # the 7B would over-allocate ~12% of the cache)
            cap_fixed = (lvu.kv_cache_capacity // quantum) * quantum
            if capacity > cap_fixed:
                raise ValueError(
                    f"request needs {capacity} KV slots > configured "
                    f"kv_cache_capacity={lvu.kv_cache_capacity} aligned "
                    f"down to the {quantum}-slot quantum ({cap_fixed})"
                )
            capacity = cap_fixed
        kv_dtype = self.resolve_kv_dtype(capacity)
        kv_quant = kv_quant_mode(kv_dtype)
        pp_stack = None
        with timer.span("cache_alloc"):
            if self.pp_mesh is not None:
                from quickvideo_tpu.parallel.pipeline import PipelinedStack

                if not self._uniform():
                    raise ValueError(
                        "pipeline parallelism does not support decay/"
                        "cascade schedules (per-layer shape changes need "
                        "the unrolled path; run with pp=1)"
                    )
                pp_stack = PipelinedStack(
                    self.pp_mesh, cfg.text,
                    self.params["language"]["layers"], capacity,
                    dtype=self.dtype,
                    quantized=kv_quant,
                    rng=self._base_rng,
                )
                cache = None
            else:
                cache = kvc.init_cache(
                    cfg.text.num_hidden_layers,
                    cfg.text.num_key_value_heads,
                    capacity,
                    cfg.text.head_dim,
                    dtype=self.dtype,
                    quantized=kv_quant,
                )
            if cache is None:
                pass
            elif self.cp_mesh is not None:
                # int8/int8k scales shard on the same capacity axis as the
                # values (parallel/context_parallel.shard_cache_cp)
                from quickvideo_tpu.parallel.context_parallel import (
                    shard_cache_cp,
                )

                cache = shard_cache_cp(cache, self.cp_mesh)
            elif self.tp_cache_mesh is not None:
                from quickvideo_tpu.parallel.sharding import shard_cache

                cache = shard_cache(cache, self.tp_cache_mesh)

        prompt_ids = ids[suffix_start:]
        prompt_len = len(prompt_ids) if lvu.query_based else 0

        # --- group loop ---
        past_len = 0
        logical_len = 0
        n_layers = cfg.text.num_hidden_layers
        # pad ids to the same 64-token bucket as the rope tables (see the
        # rope span): the group program only reads rows < suffix_start, so
        # pad content is dead — this just stabilizes the traced shape
        ids_j = jnp.asarray(
            np.pad(ids, (0, (-len(ids)) % 64)), jnp.int32
        )
        prompt_ids_j = (
            jnp.asarray(prompt_ids, jnp.int32) if prompt_len else None
        )
        # per-group image embeddings for the scatter: group 0 absorbs the
        # prefix (prefix images), and in query-based mode every group appends
        # the prompt tail — suffix image placeholders ride along and fill in
        # order (merge_vision_embeddings is order-based, so group 0 takes
        # prefix+suffix concatenated)
        img_g0, img_rest = img_prefix, None
        if prompt_len and img_suffix is not None:
            img_g0 = (
                jnp.concatenate([img_prefix, img_suffix])
                if img_prefix is not None else img_suffix
            )
            img_rest = img_suffix
        pp_stream_key = None
        pixel_iter = inputs.pixel_groups
        if lvu.use_tqdm:
            # reference progress-bar contract (qwen25_vl.py:477-478)
            from tqdm import tqdm

            pixel_iter = tqdm(
                pixel_iter, desc="Processing video groups",
                total=len(inputs.group_grids),
            )
        for gi, pixels in enumerate(pixel_iter):
            grid = tuple(int(x) for x in inputs.group_grids[gi])
            in_len = group_input_lens[gi]
            with timer.span("vision"):
                pix = jnp.asarray(pixels)  # uint8 stays uint8 (device-side
                # normalize); float test inputs pass through in compute dtype
                if pix.dtype != jnp.uint8:
                    pix = pix.astype(self.dtype)
                vis = _maybe_sync(self._vision_jit(
                    self.params, cfg, pix, grid, self._layout_arrays(grid),
                    native_hw=inputs.native_hw,
                ))
            q_len = in_len + prompt_len
            # bound each group's flash k-grid to an occupancy bucket:
            # empty capacity tail steps cost ~2-3 us each even with their
            # DMA elided, ~1.3 s across a 32-group run at 64k capacity
            # (early groups have tiny occupancy but full-size grids).
            # LINEAR buckets at capacity/8 granularity (min 8192, kept a
            # block_k multiple): power-of-two buckets made every group past
            # half-capacity attend over the FULL cache — at the strict 7B
            # 1024f shape that is 15 of 32 groups at eff_cap 65536 against
            # true occupancy 33-43k, ~2.2 s of pure wasted flash. Linear
            # buckets bound the waste to <=capacity/8 slots per group for
            # the same one-time compile count (<=8 variants).
            if cache is not None:
                capacity = int(cache.k.shape[2])
            needed = logical_len + q_len
            gran = max(8192, capacity // 8)
            acap = max(8192, -(-needed // gran) * gran)
            base = StepSpec(
                cfg=cfg.text,
                q_len=q_len,
                keep_k=resolve_effective_top_k(lvu, 0, n_layers, in_len),
                predict_type=lvu.top_k_predict_type,
                needs_probs=lvu.needs_attn_stats,
                prompt_len=prompt_len,
                attn_impl=lvu.attention_impl,
                attend_past=lvu.adaptive_local_attention,
                kv_quant=kv_quant,
                cp_mesh=self.cp_mesh,
                ref_query_mask=lvu.reference_query_mask,
                active_cap=0 if (
                    self.cp_mesh is not None or acap >= capacity
                ) else acap,
            )
            # one dispatch per group: slice + embed + scatter + full stack
            # (per-op dispatch over the device transport costs 100s of ms)
            with timer.span("prefill"):
                if pp_stack is not None:
                    # pipeline path: the preamble program produces this
                    # group's embeds + rotary windows; group 0 (it absorbs
                    # the pre-video prompt, so its q_len is unique) and any
                    # ragged group run as sequential all-stage chunk passes;
                    # uniform groups ride the skewed pipeline. active_cap
                    # buckets are disabled — in-flight groups share ONE tick
                    # program, and a per-group cap would retrace it.
                    spec_pp = dataclasses.replace(base, active_cap=0)
                    x, g_cos, g_sin, _ = self._preamble_jit(
                        self.params["language"], ids_j, cos, sin,
                        np.int32(past_len), vis, prompt_ids_j,
                        np.int32(gi), spec=spec_pp,
                        img=img_g0 if gi == 0 else img_rest,
                    )
                    x, g_cos, g_sin = (
                        jax.device_put(a, self._pp_rep)
                        for a in (x, g_cos, g_sin)
                    )
                    key = (spec_pp, q_len)
                    if gi == 0:
                        pp_stack.chunk(x, g_cos, g_sin, spec_pp)
                    else:
                        if pp_stack.stream_open and key != pp_stream_key:
                            pp_stack.end_stream()
                        if not pp_stack.stream_open:
                            pp_stack.start_stream(
                                spec_pp, q_len, int(x.shape[-1]),
                                int(g_cos.shape[-1]), x.dtype, g_cos.dtype,
                            )
                            pp_stream_key = key
                        pp_stack.push_group(x, g_cos, g_sin)
                    _maybe_sync(pp_stack.lengths)
                elif self._uniform():
                    cache = _maybe_sync(self._group_jit(
                        self.params["language"], cache, ids_j, cos, sin,
                        np.int32(past_len), vis, prompt_ids_j,
                        np.int32(gi), spec=base,
                        img=img_g0 if gi == 0 else img_rest,
                    ))
                else:
                    cache = _maybe_sync(self._group_unrolled_jit(
                        self.params["language"], cache, ids_j, cos, sin,
                        np.int32(past_len), vis, prompt_ids_j,
                        np.int32(gi), specs=self._layer_specs(base),
                        img=img_g0 if gi == 0 else img_rest,
                    ))
            past_len += in_len
            if self._uniform():
                logical_len += base.append_n
            else:
                # decay/cascade schedules: a layer whose resolved top_k is 0
                # appends the FULL group — occupancy accounting (and the
                # active_cap buckets derived from it) must track the max
                # over layers, same as plan_capacity
                logical_len += max(
                    resolve_effective_top_k(lvu, li, n_layers, in_len)
                    or in_len
                    for li in range(n_layers)
                )
        assert past_len == suffix_start, (past_len, suffix_start)
        if pp_stack is not None and pp_stack.stream_open:
            with timer.span("prefill"):
                pp_stack.end_stream()  # drain the S-1 in-flight groups

        state = {
            "cos": cos,
            "sin": sin,
            "suffix_start": suffix_start,
            "L": L,
            "delta": delta,
            "ids": ids,
            "positions": positions,  # host (3, L) mRoPE rows (chat sessions
            # extend these instead of re-walking the packed sequence)
            "timer": timer,
            # logical cache occupancy tracked host-side: the decode chunks
            # overshoot (fixed 32-size) and the device counter includes the
            # never-attended tail
            "cache_len": logical_len,
            # pp mode: the slabbed cache lives inside the stack; `cache` is
            # None and generate routes through _generate_from_stack
            "pp_stack": pp_stack,
            # image-tower embeddings for image tokens in the suffix — the
            # final prefill scatters them (prefix images went into group 0)
            "img_suffix": img_suffix,
            # concrete dtype this request's cache was allocated under
            # ('auto' resolves per request from the planned capacity)
            "kv_dtype": kv_dtype,
        }
        return cache, state

    def generate(
        self,
        inputs: PrefillInputs,
        max_new_tokens: Optional[int] = None,
        eos_token_ids: Sequence[int] = (),
        greedy: bool = True,
        temperature: float = 1.0,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        on_tokens=None,
    ) -> GenerationResult:
        """Full request: grouped prefill + final prompt + decode.

        `on_tokens(list[int])` streams newly decoded token ids as they
        materialize (chunks of `LVUConfig.stream_chunk_tokens`); when set,
        decode switches from one whole-generation dispatch to chunked
        dispatches (one transport RTT per chunk)."""
        timer = SpanTimer()
        with timer.span("e2e"):
            cache, state = self.prefill(inputs, timer)
            tokens, cache, cache_len = self._generate_from_cache(
                cache, state, max_new_tokens, eos_token_ids, greedy,
                temperature, timer, top_p=top_p, top_k=top_k,
                on_tokens=on_tokens,
            )
        t = self.cfg.text
        itemsize = jnp.dtype(self.dtype).itemsize
        # bytes per (K, V) token slot: int8 stores 1B values + one f32
        # scale per head_dim row; int8k quantizes K only
        k_b, v_b = {
            "int8": (t.head_dim + 4, t.head_dim + 4),
            "int8k": (t.head_dim + 4, t.head_dim * itemsize),
        }.get(
            state["kv_dtype"],
            (t.head_dim * itemsize, t.head_dim * itemsize),
        )
        per_tok = t.num_hidden_layers * t.num_key_value_heads * (k_b + v_b)
        return GenerationResult(
            tokens=tokens,
            timings=timer.totals(),
            cache_length=cache_len,
            prefill_tokens=state["L"],
            kv_cache_bytes=cache_len * per_tok,
            kv_unpruned_bytes=(state["L"] + len(tokens)) * per_tok,
        )

    def score_continuation(
        self,
        inputs: PrefillInputs,
        continuation_ids: Sequence[int],
        timer: Optional[SpanTimer] = None,
    ) -> Tuple[float, bool]:
        """Teacher-forced log-likelihood of `continuation_ids` given the
        request context — the lmms-eval `loglikelihood` contract (several of
        the reference's benchmark tasks score MC options this way instead of
        generating; reference hookup README.md:398-412).

        The video/prefix prefill runs exactly as generate()'s (grouped,
        pruned); the suffix prompt and the continuation then run as ONE
        bucketed pass whose per-position log-softmax is gathered at the
        target ids in-graph (only two scalars cross the transport). The
        suffix is never pruned during scoring (do_top_k_for_query applies to
        generation, not teacher forcing). Returns
        (total_logprob, is_greedy)."""
        return self.score_continuations(inputs, [continuation_ids], timer)[0]

    def score_continuations(
        self,
        inputs: PrefillInputs,
        continuations: Sequence[Sequence[int]],
        timer: Optional[SpanTimer] = None,
    ) -> list:
        """Score SEVERAL continuations against ONE shared (video + context)
        prefill — the lmms-eval multiple-choice pattern issues N
        `loglikelihood` requests with identical context per doc, and
        re-running the full grouped video prefill per option would multiply
        the dominant cost by N. The cache's per-layer lengths are copied
        before each option's scoring pass and restored after (rows written
        past the restored length are dead — the next option overwrites
        them), so every option scores against the identical pruned video
        cache. Returns a list of (total_logprob, is_greedy)."""
        timer = timer or SpanTimer()
        lvu = self.lvu
        conts = [np.asarray(c, np.int64) for c in continuations]
        for cont in conts:
            if len(cont) == 0:
                raise ValueError("continuation_ids is empty")
            if len(cont) > lvu.max_decode_tokens:
                raise ValueError(
                    f"continuation has {len(cont)} tokens > "
                    f"max_decode_tokens={lvu.max_decode_tokens}; raise "
                    "max_decode_tokens (the rope tables only extend that "
                    "far past the prompt)"
                )
        cache, state = self.prefill(inputs, timer)
        results = []
        for i, cont in enumerate(conts):
            last = i == len(conts) - 1
            cache, res = self._score_one(cache, state, cont, timer,
                                         restore=not last)
            results.append(res)
        return results

    def _score_one(self, cache, state, cont, timer, restore: bool):
        """One continuation against the prefilled cache/state. When
        `restore`, the cache (or pp stack) per-layer lengths are rewound
        afterwards so the caller can score another continuation against
        the same video cache; `+ 0` copies the length array because the
        scoring jit donates the cache buffers."""
        lvu = self.lvu
        cos, sin = state["cos"], state["sin"]
        ss, L = state["suffix_start"], state["L"]
        suffix_len = L - ss
        combined = np.concatenate([state["ids"][ss:], cont])
        q = len(combined)
        bucket = max(32, -(-q // 32) * 32)
        ids_pad = np.zeros(bucket, np.int64)
        ids_pad[:q] = combined
        img_suffix = state.get("img_suffix")
        with timer.span("score"):
            if state.get("pp_stack") is not None:
                stack = state["pp_stack"]
                saved_len = stack.lengths + 0 if restore else None
                spec = StepSpec(
                    cfg=self.cfg.text, q_len=bucket, keep_k=0,
                    attn_impl=lvu.attention_impl,
                    kv_quant=stack.quantized,
                )
                x = self._embed_scatter_jit(
                    self.params["language"]["embed"],
                    jnp.asarray(ids_pad, jnp.int32), None, img_suffix,
                )
                x, c_w, s_w = (
                    jax.device_put(a, self._pp_rep)
                    for a in (x, cos[ss : ss + bucket], sin[ss : ss + bucket])
                )
                h = stack.chunk(x, c_w, s_w, spec)
                logits = self._logits_jit(
                    self.params["language"], jnp.asarray(np.asarray(h)),
                    self.cfg.text,
                )
                # in-graph gather: only the two result scalars cross the
                # transport (a host-side (bucket, vocab) log-softmax pull
                # would be ~300 MB per option over this tunnel)
                total_j, greedy_j = self._score_gather_jit(
                    logits, jnp.asarray(ids_pad, jnp.int32),
                    np.int32(q), np.int32(suffix_len),
                )
                total = float(total_j)
                greedy = bool(greedy_j)
                if restore:
                    stack.lengths = saved_len
            else:
                saved_len = cache.length + 0 if restore else None
                spec = StepSpec(
                    cfg=self.cfg.text, q_len=bucket, keep_k=0,
                    attn_impl=lvu.attention_impl,
                    kv_quant=self._cache_quant(cache),
                    cp_mesh=self.cp_mesh,
                )
                cache, total_j, greedy_j = self._score_jit(
                    self.params["language"], cache,
                    jnp.asarray(ids_pad, jnp.int32),
                    cos[ss : ss + bucket], sin[ss : ss + bucket],
                    np.int32(q), np.int32(suffix_len),
                    spec=spec, img=img_suffix,
                )
                total = float(total_j)
                greedy = bool(greedy_j)
                if restore:
                    cache = dataclasses.replace(cache, length=saved_len)
        return cache, (total, greedy)

    @staticmethod
    def _filter_logits(logits, top_p=None, top_k=None):
        """Standard nucleus / top-k sampling filters (HF generate parity —
        the reference passes generation kwargs straight through to HF
        generate, lvu/lvu.py:45-51)."""
        if top_k is not None and top_k > 0:
            # clamp like HF's TopKLogitsWarper: top_k >= vocab is a common
            # "effectively disabled" value and must not index out of bounds
            kth = jnp.sort(logits)[-min(int(top_k), logits.shape[-1])]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if top_p is not None and 0 < top_p < 1:
            sorted_logits = jnp.sort(logits)[::-1]
            probs = jax.nn.softmax(sorted_logits)
            csum = jnp.cumsum(probs)
            # keep the smallest prefix with cumulative prob >= top_p
            cutoff_idx = jnp.argmax(csum >= top_p)
            cutoff = sorted_logits[cutoff_idx]
            logits = jnp.where(logits < cutoff, -jnp.inf, logits)
        return logits

    def _generate_from_stack(
        self, stack, state, max_new_tokens, eos_token_ids, greedy,
        temperature, timer, top_p=None, top_k=None, on_tokens=None,
    ):
        """Suffix prefill + decode against a PipelinedStack (pp mode).

        The suffix prompt runs as one sequential all-stage chunk at its
        exact length (recompiles per distinct question length; pp targets
        multi-chip serving where that one-time cost amortizes). Decode then
        runs DEVICE-SIDE in whole chunks (PipelinedStack.decode_chunk):
        greedy and sample_on_device generations pay one dispatch per
        generation (or per `stream_chunk_tokens` chunk when streaming) —
        the same no-per-token-RTT contract as the single-chip
        _decode_chunk_body. sample_on_device=False keeps the per-token
        host-sampling loop for reproducibility."""
        cfg = self.cfg
        lvu = self.lvu
        ids = state["ids"]
        cos, sin = state["cos"], state["sin"]
        ss, L = state["suffix_start"], state["L"]
        max_new = min(
            max_new_tokens or lvu.max_decode_tokens, lvu.max_decode_tokens
        )
        n_layers = cfg.text.num_hidden_layers
        suffix_len = L - ss
        keep_k = 0
        if lvu.do_top_k_for_query:
            keep_k = resolve_effective_top_k(lvu, 0, n_layers, suffix_len)
        with timer.span("final_prefill"):
            spec = StepSpec(
                cfg=cfg.text, q_len=suffix_len, keep_k=keep_k,
                predict_type=lvu.top_k_predict_type,
                needs_probs=(
                    (lvu.needs_attn_stats or lvu.query_based)
                    if keep_k > 0 else False
                ),
                attn_impl=lvu.attention_impl,
                kv_quant=stack.quantized,
            )
            x = self._embed_scatter_jit(
                self.params["language"]["embed"],
                jnp.asarray(ids[ss:], jnp.int32), None,
                state.get("img_suffix"),
            )
            x, c_s, s_s = (
                jax.device_put(a, self._pp_rep)
                for a in (x, cos[ss:L], sin[ss:L])
            )
            h = stack.chunk(x, c_s, s_s, spec)
            # one hidden row hops meshes host-side: params may live on a
            # different device set than the pp stack (cheap: (C,) floats)
            logits = self._logits_jit(
                self.params["language"], np.asarray(h[-1]), cfg.text
            )

        out_tokens: List[int] = []
        dspec = StepSpec(
            cfg=cfg.text, q_len=1, keep_k=0, causal=False,
            attn_impl=lvu.attention_impl,
            kv_quant=stack.quantized,
        )
        eos_arr = jnp.asarray(
            sorted(eos_token_ids) if eos_token_ids else [-1], jnp.int32
        )
        mdt = lvu.max_decode_tokens
        stream_c = 0
        if on_tokens is not None:
            stream_c = max(1, min(32, int(lvu.stream_chunk_tokens)))

        def _consume(toks):
            for t in np.asarray(toks).tolist():
                if len(out_tokens) >= max_new:
                    break
                out_tokens.append(int(t))
                if on_tokens is not None:
                    on_tokens([int(t)])
                if t in eos_token_ids:
                    break

        def _consume_n(toks, bound):
            new = []
            hit = False
            for t in np.asarray(toks).tolist()[:bound]:
                new.append(int(t))
                if t in eos_token_ids:
                    hit = True
                    break
            out_tokens.extend(new)
            return new, hit

        def _put(a):
            return jax.device_put(a, self._pp_rep)

        with timer.span("decode"):
            # first token from the final-prefill logits (host-side, exactly
            # as the single-chip path)
            if greedy:
                nxt = int(jnp.argmax(logits))
            else:
                self._rng, rng0 = jax.random.split(self._rng)
                flt = self._filter_logits(logits, top_p, top_k)
                nxt = int(jax.random.categorical(rng0, flt / temperature))
            out_tokens.append(nxt)
            if on_tokens is not None:
                on_tokens([nxt])
            device_loop = greedy or lvu.sample_on_device
            if max_new > 1 and nxt not in eos_token_ids and device_loop:
                # remaining tokens decode in whole chunks DEVICE-SIDE
                # (PipelinedStack.decode_chunk): the in-graph while_loop
                # embeds, runs all stages, samples on the last stage, and
                # broadcasts each token over the mesh — one dispatch for the
                # whole generation (or per stream chunk), killing the
                # per-token host RTT the round-4 pp path paid
                kw = dict(
                    spec=dspec, greedy=greedy,
                    temperature=float(temperature),
                    top_p=float(top_p) if top_p is not None else None,
                    top_k=int(top_k) if top_k is not None else None,
                    filter_fn=LVUEngine._filter_logits,
                    vocab=cfg.text.vocab_size,
                )
                head = self._pp_head()
                eos_d = _put(eos_arr)
                if on_tokens is None:
                    self._rng, rng = jax.random.split(self._rng)
                    toks = stack.decode_chunk(
                        head, out_tokens[-1], _put(cos[L : L + mdt]),
                        _put(sin[L : L + mdt]), eos_d, max_new - 1,
                        rng=_put(rng), **kw,
                    )
                    _consume(toks)
                else:
                    pos = L
                    while len(out_tokens) < max_new:
                        n_stop = min(stream_c, max_new - len(out_tokens))
                        self._rng, rng = jax.random.split(self._rng)
                        toks = stack.decode_chunk(
                            head, out_tokens[-1],
                            _put(cos[pos : pos + stream_c]),
                            _put(sin[pos : pos + stream_c]),
                            eos_d, n_stop, rng=_put(rng), **kw,
                        )
                        new, hit = _consume_n(toks, n_stop)
                        if new:
                            on_tokens(new)
                        if hit or not new:
                            break
                        pos += n_stop
            elif max_new > 1 and nxt not in eos_token_ids:
                # legacy per-token host sampling (sample_on_device=False):
                # one chunk pass + transport RTT per token, for repro
                for step in range(1, max_new):
                    pos_idx = L + step - 1  # decode tables start at row L
                    x = self._embed_scatter_jit(
                        self.params["language"]["embed"],
                        jnp.asarray([out_tokens[-1]], jnp.int32), None,
                    )
                    x, c_s, s_s = (
                        _put(a)
                        for a in (
                            x, cos[pos_idx : pos_idx + 1],
                            sin[pos_idx : pos_idx + 1],
                        )
                    )
                    h = stack.chunk(x, c_s, s_s, dspec)
                    logits = self._logits_jit(
                        self.params["language"], np.asarray(h[-1]), cfg.text
                    )
                    self._rng, rng = jax.random.split(self._rng)
                    flt = self._filter_logits(logits, top_p, top_k)
                    nxt = int(
                        jax.random.categorical(rng, flt / temperature)
                    )
                    out_tokens.append(nxt)
                    if on_tokens is not None:
                        on_tokens([nxt])
                    if nxt in eos_token_ids:
                        break
        suffix_advance = keep_k if keep_k > 0 else suffix_len
        logical = state["cache_len"] + suffix_advance + max(
            0, len(out_tokens) - 1
        )
        return np.asarray(out_tokens, np.int64), None, logical

    def _generate_from_cache(
        self, cache, state, max_new_tokens, eos_token_ids, greedy,
        temperature, timer, top_p=None, top_k=None, on_tokens=None,
    ):
        if state.get("pp_stack") is not None:
            return self._generate_from_stack(
                state["pp_stack"], state, max_new_tokens, eos_token_ids,
                greedy, temperature, timer, top_p=top_p, top_k=top_k,
                on_tokens=on_tokens,
            )
        cfg = self.cfg
        lvu = self.lvu
        ids = state["ids"]
        cos, sin = state["cos"], state["sin"]
        ss, L = state["suffix_start"], state["L"]
        max_new = min(
            max_new_tokens or lvu.max_decode_tokens, lvu.max_decode_tokens
        )
        n_layers = cfg.text.num_hidden_layers

        # final prompt prefill (reference :524-539; pruning only if
        # do_top_k_for_query toggles it on during generate)
        suffix_len = L - ss
        keep_k = 0
        if lvu.do_top_k_for_query:
            keep_k = resolve_effective_top_k(lvu, 0, n_layers, suffix_len)
        img_suffix = state.get("img_suffix")
        # quant mode from the cache arrays themselves (not the config string:
        # 'auto' resolves per request, and resumed chat sessions carry caches
        # built under an earlier resolution)
        kv_quant = self._cache_quant(cache)
        with timer.span("final_prefill"):
            if keep_k > 0:
                # exact shape when the suffix itself is pruned (rare path)
                spec = StepSpec(
                    cfg=cfg.text, q_len=suffix_len, keep_k=keep_k,
                    predict_type=lvu.top_k_predict_type,
                    # query-based predictors have no separate prompt here
                    # (the suffix IS the query): they fall back to
                    # within-group column sums, which requires probs
                    needs_probs=lvu.needs_attn_stats or lvu.query_based,
                    attn_impl=lvu.attention_impl,
                    kv_quant=kv_quant,
                    cp_mesh=self.cp_mesh,
                )
                x = self._embed_scatter_jit(
                    self.params["language"]["embed"],
                    jnp.asarray(ids[ss:], jnp.int32), None, img_suffix,
                )
                self._rng, rng = jax.random.split(self._rng)
                cache, hidden = self._prefill_jit(
                    self.params["language"], cache, x, cos[ss:L], sin[ss:L],
                    rng, spec=spec,
                )
                logits = compute_logits(
                    self.params["language"], hidden[-1], cfg.text
                )
            else:
                # BUCKETED: pad the suffix to a multiple of 32 so every
                # question length reuses one compiled program; only the first
                # `valid` appended rows advance the cache (padded rows are
                # garbage beyond the valid length and get overwritten/masked)
                bucket = max(32, -(-suffix_len // 32) * 32)
                pad = bucket - suffix_len
                ids_pad = np.zeros(bucket, np.int64)
                ids_pad[:suffix_len] = ids[ss:]
                spec = StepSpec(
                    cfg=cfg.text, q_len=bucket, keep_k=0,
                    attn_impl=lvu.attention_impl,
                    kv_quant=kv_quant,
                    cp_mesh=self.cp_mesh,
                )
                # pre-sliced rope window: keeps the compiled program's
                # shapes independent of the TABLE length, so any question
                # (or chat-session follow-up) at any total sequence length
                # reuses one program (table rows cover ss+bucket: the table
                # always carries max_decode_tokens+32 rows past L)
                cache, logits = self._final_prefill_jit(
                    self.params["language"], cache,
                    jnp.asarray(ids_pad, jnp.int32),
                    cos[ss : ss + bucket], sin[ss : ss + bucket],
                    np.int32(0), np.int32(suffix_len),
                    spec=spec, img=img_suffix,
                )

        out_tokens: List[int] = []
        dspec = StepSpec(
            cfg=cfg.text, q_len=1, keep_k=0,
            kv_quant=kv_quant,
            cp_mesh=self.cp_mesh,
        )
        # decode occupancy is known host-side -> bound each chunk's attention
        # to the next power-of-two bucket above it. The flash kernel's static
        # grid otherwise pays ~3 us per empty capacity block-step per layer
        # (7 ms/token at 64k capacity with 1k valid, measured); buckets cost
        # at most log2(capacity/4096) extra one-time compiles.
        suffix_advance = keep_k if keep_k > 0 else suffix_len
        decode_base = state["cache_len"] + suffix_advance
        capacity = cache.k.shape[2]

        def _decode_spec() -> StepSpec:
            if self.cp_mesh is not None:
                return dspec  # shard-local capacities stay fixed
            # budget the full max_decode_tokens (the while_loop may run that
            # far): one 4096-multiple bucket (= one compile) per video size
            needed = decode_base + lvu.max_decode_tokens
            b = max(4096, -(-needed // 4096) * 4096)
            return dspec if b >= capacity else dataclasses.replace(
                dspec, active_cap=b
            )

        eos_arr = jnp.asarray(
            sorted(eos_token_ids) if eos_token_ids else [-1], jnp.int32
        )
        mdt = lvu.max_decode_tokens

        def _consume(toks):
            for t in np.asarray(toks).tolist():
                if len(out_tokens) >= max_new:
                    break
                out_tokens.append(int(t))
                if t in eos_token_ids:
                    break

        def _consume_n(toks, bound):
            """Chunked-stream consume: at most `bound` tokens (slots past
            the while_loop's n_stop hold the EOS-fill value and must not be
            mistaken for a generated EOS). Returns (new_tokens, hit_eos)."""
            new = []
            hit = False
            for t in np.asarray(toks).tolist()[:bound]:
                new.append(int(t))
                if t in eos_token_ids:
                    hit = True
                    break
            out_tokens.extend(new)
            return new, hit

        # streaming decode: the single-dispatch whole-generation decode
        # cannot surface tokens incrementally, so a callback switches to
        # fixed-size chunks — one dispatch + one transport RTT per chunk
        # of `stream_chunk_tokens` (<=32: the rope tables carry exactly
        # max_decode_tokens+32 rows past L, which bounds the final
        # chunk's static slice). Chunk results are bit-identical to the
        # single dispatch: same jitted body, same carries.
        stream_c = 0
        if on_tokens is not None:
            stream_c = max(1, min(32, int(lvu.stream_chunk_tokens)))

        with timer.span("decode"):
            if greedy:
                # the whole generation decodes in ONE device dispatch: the
                # while_loop stops at EOS or max_new in-graph, so there is
                # no per-chunk transport RTT and no post-EOS waste. Static
                # shape = max_decode_tokens -> one compiled program per
                # video config regardless of the request's max_new.
                nxt = int(jnp.argmax(logits))
                out_tokens.append(nxt)
                if on_tokens is not None:
                    on_tokens([nxt])
                if max_new > 1 and nxt not in eos_token_ids:
                    if on_tokens is None:
                        cache, toks = self._decode_chunk_jit(
                            self.params["language"], cache, np.int32(nxt),
                            cos[L : L + mdt], sin[L : L + mdt],
                            eos_arr, np.int32(max_new - 1),
                            spec=_decode_spec(),
                        )
                        _consume(toks)
                    else:
                        pos = L
                        ds = _decode_spec()
                        while len(out_tokens) < max_new:
                            n_stop = min(stream_c, max_new - len(out_tokens))
                            cache, toks = self._decode_chunk_jit(
                                self.params["language"], cache,
                                np.int32(out_tokens[-1]),
                                cos[pos : pos + stream_c],
                                sin[pos : pos + stream_c],
                                eos_arr, np.int32(n_stop), spec=ds,
                            )
                            new, hit = _consume_n(toks, n_stop)
                            if new:
                                on_tokens(new)
                            if hit or not new:
                                break
                            pos += n_stop
            elif lvu.sample_on_device:
                # first token from the final-prefill logits (host), then the
                # rest sampled in-graph in the same single dispatch
                self._rng, rng0 = jax.random.split(self._rng)
                flt = self._filter_logits(logits, top_p, top_k)
                nxt = int(jax.random.categorical(rng0, flt / temperature))
                out_tokens.append(nxt)
                if on_tokens is not None:
                    on_tokens([nxt])
                tp = float(top_p) if top_p is not None else None
                tk = int(top_k) if top_k is not None else None
                if max_new > 1 and nxt not in eos_token_ids:
                    if on_tokens is None:
                        self._rng, rng = jax.random.split(self._rng)
                        cache, toks = self._decode_sample_chunk_jit(
                            self.params["language"], cache, np.int32(nxt),
                            cos[L : L + mdt], sin[L : L + mdt],
                            rng, np.float32(temperature), eos_arr,
                            np.int32(max_new - 1),
                            spec=_decode_spec(), top_p=tp, top_k=tk,
                        )
                        _consume(toks)
                    else:
                        pos = L
                        ds = _decode_spec()
                        while len(out_tokens) < max_new:
                            n_stop = min(stream_c, max_new - len(out_tokens))
                            self._rng, rng = jax.random.split(self._rng)
                            cache, toks = self._decode_sample_chunk_jit(
                                self.params["language"], cache,
                                np.int32(out_tokens[-1]),
                                cos[pos : pos + stream_c],
                                sin[pos : pos + stream_c],
                                rng, np.float32(temperature), eos_arr,
                                np.int32(n_stop),
                                spec=ds, top_p=tp, top_k=tk,
                            )
                            new, hit = _consume_n(toks, n_stop)
                            if new:
                                on_tokens(new)
                            if hit or not new:
                                break
                            pos += n_stop
            else:
                # legacy per-token host sampling (sample_on_device=False):
                # one transport RTT per token; kept for debugging/repro
                for step in range(max_new):
                    self._rng, rng = jax.random.split(self._rng)
                    flt = self._filter_logits(logits, top_p, top_k)
                    nxt = int(
                        jax.random.categorical(rng, flt / temperature)
                    )
                    out_tokens.append(nxt)
                    if on_tokens is not None:
                        on_tokens([nxt])
                    if nxt in eos_token_ids:
                        break
                    pos_idx = L + step  # decode tables start at row L
                    cache, logits = self._decode_jit(
                        self.params["language"], cache,
                        np.int32(nxt),
                        cos[pos_idx : pos_idx + 1],
                        sin[pos_idx : pos_idx + 1],
                        spec=dspec,
                    )
        logical = state["cache_len"] + suffix_advance + max(
            0, len(out_tokens) - 1
        )
        return np.asarray(out_tokens, np.int64), cache, logical
