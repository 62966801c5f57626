"""Does host->device upload overlap device compute on this transport?

The strict-resize hour row shows ~21 s of `device_put` for ~2 GB of uint8
frames while the chip also runs ~34 s of compute — ~100 MB/s effective,
vs ~870 MB/s implied by the demo row's hidden 0.7 s upload. Hypothesis:
transfers and compute dispatches serialize on the tunnel stream, so
upload time ADDS to e2e instead of hiding. This probe measures device_put
throughput (a) on an idle device and (b) while a long compute chain runs
asynchronously. If (b) ~= (a), overlap works and the hour row's stall is
elsewhere; if (b) collapses or the compute tail stretches by the upload
time, the transport serializes and the lever is fewer bytes (e.g. YUV420
at 1.5 B/px + on-device color conversion), not more threads.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickvideo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

MB = int(os.environ.get("H2D_MB", 256))        # total upload per arm
CHUNK_MB = int(os.environ.get("H2D_CHUNK_MB", 16))
COMPUTE_S = float(os.environ.get("H2D_COMPUTE_S", 8.0))


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n_chunks = MB // CHUNK_MB
    chunks = [
        rng.integers(0, 255, CHUNK_MB * 1024 * 1024, dtype=np.uint8)
        for _ in range(n_chunks)
    ]

    # long async compute: chained matmuls sized to ~COMPUTE_S. scan keeps
    # the chain sequential (each step consumes the previous output, so
    # nothing can be elided) and the static length pins one executable.
    d = 4096
    a = jnp.asarray(rng.standard_normal((d, d)) * 0.01, jnp.bfloat16)

    per_mm = 2 * d ** 3 / 197e12  # bf16 matmul seconds at v5e peak
    iters = max(1, int(COMPUTE_S / per_mm * 0.5))  # ~50% efficiency guess

    @jax.jit
    def burn(a):
        def body(x, _):
            y = x @ x
            # renormalize so the chain neither explodes nor collapses
            return y / (jnp.max(jnp.abs(y)) + 1e-6), ()
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return out

    def sync(x):
        # block_until_ready does NOT serialize against in-flight work on
        # the tunneled axon platform (measured: a multi-second scan chain
        # "completes" in 0.00 s); a scalar fetch is a real device sync —
        # it cannot return until the producing program finished.
        return float(np.asarray(jax.numpy.ravel(x)[0]))

    sync(burn(a))  # compile + first run retired

    def upload_all():
        t0 = time.perf_counter()
        devs = [jax.device_put(c) for c in chunks]
        sync(devs[-1])  # transfers retire in order on the single stream
        return time.perf_counter() - t0, devs

    # (a) idle upload
    dt_idle, devs = upload_all()
    del devs
    print(f"idle upload: {MB} MB in {dt_idle:.2f} s = "
          f"{MB / dt_idle:.0f} MB/s")

    # measure real compute duration alone
    t0 = time.perf_counter()
    sync(burn(a))
    dt_burn = time.perf_counter() - t0
    print(f"compute alone: {dt_burn:.2f} s (iters={iters})")

    # (b) upload while compute runs (dispatch async, then upload)
    out = burn(a)
    t0 = time.perf_counter()
    dt_busy, devs = upload_all()
    sync(out)
    dt_total = time.perf_counter() - t0
    print(f"busy upload: {MB} MB in {dt_busy:.2f} s = "
          f"{MB / dt_busy:.0f} MB/s while ~{dt_burn:.1f} s compute ran")
    print(f"combined window: {dt_total:.2f} s "
          f"(serial would be ~{dt_burn + dt_idle:.2f} s, "
          f"overlapped ~{max(dt_burn, dt_idle):.2f} s)")


if __name__ == "__main__":
    main()
