"""Qwen2.5-VL in JAX: the flagship VideoLLM family (reference targets
Qwen2.5-VL-7B-Instruct, reference README.md:35-44)."""

from quickvideo_tpu.models.qwen25_vl.config import (
    ModelConfig,
    TextConfig,
    VisionConfig,
    PRESETS,
    get_config,
)
