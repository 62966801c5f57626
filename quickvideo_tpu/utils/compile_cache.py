"""Persistent XLA compilation cache.

Cold compiles of the 7B prefill/decode programs take ~10-15 minutes over
this environment's remote-tunnel compile service; without a persistent
cache EVERY process pays that again (the in-memory cache dies with the
process). jax's persistent cache keys serialized executables by HLO +
compile options + backend version, so repeat bench/probe/serving runs with
unchanged traced code start in seconds.

Opt-out with QV_COMPILE_CACHE=0; relocate with QV_COMPILE_CACHE_DIR.
Safe everywhere: if the backend can't serialize executables jax just
skips the cache (warning once), and CPU test runs get faster too.
"""

import os


def enable_persistent_cache() -> str | None:
    """Configure jax's persistent compilation cache (idempotent).

    This is THE cache setup — the engine calls it on every init and the
    benchmarks call it at import; there must be exactly one cache dir and
    one env contract (a second implementation with different defaults
    would silently split the cache and double every cold compile).

    Returns the cache dir, or None when disabled by env."""
    if (
        os.environ.get("QV_COMPILE_CACHE", "1") == "0"
        or os.environ.get("QV_NO_COMPILE_CACHE")  # legacy opt-out
    ):
        return None
    import jax

    cache_dir = os.environ.get(
        "QV_COMPILE_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "quickvideo_tpu_xla_cache"
        ),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the default 1 s floor would skip small-but-hot programs; any
        # compile that took >0.5 s is worth persisting here (the transport
        # alone makes every remote compile expensive)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None  # older jax without these flags
    return cache_dir
