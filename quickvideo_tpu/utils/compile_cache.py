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

    Returns the cache dir, or None when disabled by env."""
    if os.environ.get("QV_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    cache_dir = os.environ.get(
        "QV_COMPILE_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "quickvideo_tpu_xla_cache"
        ),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the default 1 s floor would skip small-but-hot programs; any compile
    # that took >0.5 s is worth persisting here (the transport alone makes
    # every remote compile expensive)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
