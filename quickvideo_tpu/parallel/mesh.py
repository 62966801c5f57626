"""Device mesh construction.

Axes (quickvideo_tpu.config.MeshConfig):
  dp — data parallel: independent requests (eval sharding; the reference's
       only multi-device use is accelerate-launched eval DP, README.md:405)
  pp — pipeline parallel: layer slabs over stages, skewed pipeline over video
       groups (parallel/pipeline.py; composes with tp inside a stage,
       not with sp)
  tp — tensor parallel: attention heads / MLP columns over ICI
  sp — sequence parallel: group token axis for very large prefill groups
       (SURVEY.md section 5.7 TPU equivalent)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from quickvideo_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.num_devices
    if len(devices) < need:
        raise ValueError(
            f"mesh {cfg} needs {need} devices, have {len(devices)}"
        )
    arr = np.array(devices[:need]).reshape(cfg.dp, cfg.pp, cfg.tp, cfg.sp)
    return Mesh(arr, axis_names=cfg.axis_names())


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(), jax.devices()[:1])


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Multi-host (DCN) backend initialization — SURVEY section 5.8's
    `jax.distributed.initialize` story for >1-host slices.

    Call ONCE per process before any jax computation. Afterwards
    `jax.devices()` spans every process (ordered by process id), so
    `make_mesh` lays the OUTER axes (dp, then pp) across hosts over DCN
    while tp/sp stay within a host on ICI — the scaling-book placement the
    (dp, pp, tp, sp) reshape order encodes. Per-request engine work is
    unchanged: GSPMD inserts the cross-host collectives.

    With no arguments, reads QV_COORDINATOR / QV_NUM_PROCESSES /
    QV_PROCESS_ID from the environment (mirroring the reference's
    accelerate-launch env contract for eval DP, reference README.md:398-412)
    and no-ops single-process runs. Returns True if distributed mode was
    initialized. Idempotent: a second call is a no-op.

    Smoke-tested with 2 CPU processes in tests/test_multihost.py; on real
    multi-host TPU slices the same call runs per host with the slice's
    coordinator.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("QV_COORDINATOR")
    if num_processes is None:
        n = os.environ.get("QV_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("QV_PROCESS_ID")
        process_id = int(p) if p else None
    if not num_processes or num_processes == 1:
        return False
    global _DISTRIBUTED
    if _DISTRIBUTED:  # idempotent (probing jax.process_count() here would
        return True   # itself initialize the backend too early)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _DISTRIBUTED = True
    return True


_DISTRIBUTED = False
