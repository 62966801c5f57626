"""Multi-chip execution: mesh construction and sharding rules (no reference
equivalent — the reference is single-GPU, SURVEY.md section 2.2; scaling here
is mesh + GSPMD sharding annotations over ICI)."""

from quickvideo_tpu.parallel.mesh import make_mesh
from quickvideo_tpu.parallel.pipeline import PipelinedStack, make_pp_mesh
from quickvideo_tpu.parallel.sharding import (
    cache_sharding,
    param_shardings,
    shard_cache,
    shard_params,
)
