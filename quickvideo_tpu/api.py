"""Public API facade: the `LVU` class (reference lvu/lvu.py:7-57 surface).

LVU(config) loads/initializes the model, builds the TPU engine, and binds the
registered engine's run/chat drivers as methods — the same registry contract
as the reference (lvu/lvu.py:32-43) without monkey-patching model internals.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp

from quickvideo_tpu.config import LVUConfig
from quickvideo_tpu.models import (
    ensure_builtin_engines,
    lvu_chat_model_map,
    lvu_init_model_map,
    lvu_run_model_map,
)
from quickvideo_tpu.models.qwen25_vl import get_config
from quickvideo_tpu.models.qwen25_vl import model as qmodel
from quickvideo_tpu.prefill.engine import LVUEngine
from quickvideo_tpu.tokenization import load_tokenizer

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


class LVU:
    def __init__(self, config: LVUConfig, params: Optional[dict] = None):
        from quickvideo_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()
        ensure_builtin_engines()
        self.config = config
        self.model_config = get_config(config.model_name_or_path or "qwen25-vl-7b")
        dtype = _DTYPES[config.dtype]
        int8_weights = config.param_dtype == "int8"
        if params is not None:
            self.params = params
        elif os.path.isdir(config.model_name_or_path or ""):
            from quickvideo_tpu.models.qwen25_vl.load import load_params

            self.params = load_params(
                config.model_name_or_path, self.model_config, dtype
            )
            if int8_weights:
                from quickvideo_tpu.ops.quantization import (
                    quantize_model_params,
                )

                self.params = quantize_model_params(self.params)
        else:
            # Not a local checkpoint dir. A name with a "/" is an HF repo id
            # the caller expected to be real weights — refuse rather than
            # silently generating fluent nonsense from random weights. Bare
            # preset names (qwen25-vl-7b, ...) opt into deterministic
            # fast-init for offline benchmarking at the true shapes.
            name = config.model_name_or_path or ""
            if "/" in name:
                raise ValueError(
                    f"model_name_or_path {name!r} is not a local directory. "
                    "Download the checkpoint and pass its path, or pass a "
                    "preset name (qwen25-vl-3b/7b/72b) to benchmark with "
                    "deterministic random weights."
                )
            import logging

            logging.getLogger(__name__).warning(
                "No checkpoint at %r: initializing deterministic RANDOM "
                "weights (%s preset shapes). Generations are meaningless; "
                "this mode exists for benchmarking only.",
                name, self.model_config.name,
            )
            if int8_weights:
                # quantized fast-init WITHOUT materializing the bf16 tree
                # first (7B bf16 + int8 copies would exceed a 16 GB chip)
                from quickvideo_tpu.ops.quantization import (
                    init_params_fast_quantized,
                )

                self.params = init_params_fast_quantized(
                    self.model_config, dtype
                )
            else:
                self.params = qmodel.init_params_fast(self.model_config, dtype)
        self.tokenizer = load_tokenizer(
            config.model_name_or_path or "", self.model_config
        )
        self.mesh = None
        if config.mesh.num_devices > 1:
            # place params with TP/replicated shardings; the same jitted
            # programs then run SPMD over the mesh
            from quickvideo_tpu.parallel import make_mesh, shard_params

            self.mesh = make_mesh(config.mesh)
            if config.mesh.pp > 1:
                # pp places the language layer stack itself (one slab per
                # stage, tp-sharded within the stage when mesh.tp > 1 —
                # parallel/pipeline.py PipelinedStack); replicating the full
                # weights here first would defeat pp's memory scaling at the
                # model sizes pp exists for. sp does not compose with pp
                # (engine validates).
                pass
            else:
                self.params = shard_params(self.params, self.mesh)
        self.engine = LVUEngine(
            self.params, self.model_config, config, dtype, mesh=self.mesh
        )
        self.last_result = None
        self.init_lvu()

    def init_lvu(self):
        model_type = self.config.model_type
        if model_type not in lvu_init_model_map:
            raise ValueError(
                f"model_type {model_type!r} not registered; have "
                f"{sorted(lvu_init_model_map)}"
            )
        lvu_init_model_map[model_type](self, self.config)
        self._run = lvu_run_model_map[model_type]
        self._chat = lvu_chat_model_map.get(model_type)

    def generate(self, question: str, video_path: str, **generation_kwargs) -> List[str]:
        return self._run(self, question, video_path, **generation_kwargs)

    def loglikelihood(self, context: str, video_path: Optional[str],
                      continuation) -> tuple:
        """Teacher-forced (total_logprob, is_greedy) of `continuation` (text
        or token ids) given the chat-formatted context — the lmms-eval
        `loglikelihood` contract (reference eval hookup README.md:398-412).
        The video prefill runs grouped+pruned exactly as generate()'s."""
        from quickvideo_tpu.engines.qwen25 import score_chat

        content = []
        if video_path is not None:
            content.append({"type": "video", "video": video_path})
        content.append({"type": "text", "text": context})
        return score_chat(
            self, [{"role": "user", "content": content}], continuation
        )

    def loglikelihood_multi(self, context: str, video_path: Optional[str],
                            continuations) -> list:
        """Score several continuations against ONE shared prefill of the
        (video, context) — the lmms-eval multiple-choice pattern issues N
        `loglikelihood` requests with identical context per doc; running
        the full grouped video prefill once instead of N times is the
        difference between ~(prefill + N suffixes) and N x prefill.
        Returns a list of (total_logprob, is_greedy)."""
        from quickvideo_tpu.engines.qwen25 import score_chat_multi

        content = []
        if video_path is not None:
            content.append({"type": "video", "video": video_path})
        content.append({"type": "text", "text": context})
        return score_chat_multi(
            self, [{"role": "user", "content": content}], continuations
        )

    def chat(self, messages, **generation_kwargs) -> List[str]:
        if self._chat is None:
            raise ValueError(
                f"model_type {self.config.model_type!r} has no chat driver"
            )
        return self._chat(self, messages, **generation_kwargs)

    def start_chat(self, video_path: str, reserve_turns: int = 8,
                   **video_kwargs):
        """Interactive multi-turn session over one video: the pruned video
        KV cache stays resident and each follow-up `ask` appends only its
        question tokens — turn 2+ skips the video prefill entirely
        (quickvideo_tpu.chat.ChatSession; `chat` re-prefills per call like
        the reference)."""
        from quickvideo_tpu.chat import ChatSession

        return ChatSession(
            self, video_path, reserve_turns=reserve_turns, **video_kwargs
        )

    def resume_chat(self, path: str):
        """Resume a `ChatSession.save()`d session: the pruned video KV cache
        loads from disk, so the first follow-up costs an incremental ask
        (<1 s) instead of a full decode + video prefill. The live config
        must match the saved session's pruning/dtype fields exactly."""
        from quickvideo_tpu.chat import ChatSession

        return ChatSession.load(self, path)
