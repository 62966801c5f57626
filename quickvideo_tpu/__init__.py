"""quickvideo-tpu: TPU-native long-video understanding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
TIGER-AI-Lab/QuickVideo (reference: /root/reference):

- QuickDecoder  -> C++ keyframe-aligned parallel CPU video decoder
                   (`quickvideo_tpu.video`), streaming RGB frame blocks to TPU.
- QuickPrefill  -> group-based chunked prefill with per-layer KV-cache pruning
                   (`quickvideo_tpu.prefill`), Pallas flash-attention and
                   select-and-compact kernels (`quickvideo_tpu.ops`).
- Overlap       -> async host decode/preprocess pipeline hidden behind TPU
                   prefill (`quickvideo_tpu.video.stream`).
- Multi-chip    -> jax.sharding Mesh + pjit sharding of weights and sequence
                   (`quickvideo_tpu.parallel`).

Public API mirrors the reference's `lvu` package (reference lvu/__init__.py):
`LVU`, `LVUConfig` with `generate()` / `chat()`.
"""

from quickvideo_tpu.config import LVUConfig, LVULayerConfig

__version__ = "0.1.0"

__all__ = ["LVU", "LVUConfig", "LVULayerConfig"]


def __getattr__(name):
    # Lazy import: LVU pulls in the full model stack; keep `import
    # quickvideo_tpu` cheap for config-only users (e.g. CLI help).
    if name == "LVU":
        from quickvideo_tpu.api import LVU

        return LVU
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
