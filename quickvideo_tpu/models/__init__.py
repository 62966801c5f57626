"""Model families.

Engine registry parity with the reference's plugin scan (reference
lvu/models/__init__.py:5-19): each engine module registers init/run/chat
callables under its `model_type` string. In the TPU build registration is
explicit (no import-time directory scan — keeps jit caches and imports
deterministic), but the registry contract is the same.
"""

from typing import Callable, Dict

lvu_init_model_map: Dict[str, Callable] = {}
lvu_run_model_map: Dict[str, Callable] = {}
lvu_chat_model_map: Dict[str, Callable] = {}


def register_engine(model_type: str, init_fn: Callable, run_fn: Callable, chat_fn=None):
    assert init_fn is not None and run_fn is not None, (
        f"engine {model_type!r} must provide init and run functions"
    )
    lvu_init_model_map[model_type] = init_fn
    lvu_run_model_map[model_type] = run_fn
    if chat_fn is not None:
        lvu_chat_model_map[model_type] = chat_fn


def ensure_builtin_engines():
    """Import built-in engine modules (idempotent)."""
    from quickvideo_tpu import engines  # noqa: F401
