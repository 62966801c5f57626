"""Device mesh construction.

Axes (quickvideo_tpu.config.MeshConfig):
  dp — data parallel: independent requests (eval sharding; the reference's
       only multi-device use is accelerate-launched eval DP, README.md:405)
  pp — pipeline parallel: layer slabs over stages, skewed pipeline over video
       groups (parallel/pipeline.py; engine path requires tp == sp == 1)
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
