"""Multi-chip sharding of the matching pipeline.

The reference is single-process SSE (SURVEY.md §2.5); every parallel axis
here is new design:

- ``data``     — batch of scenes (DP).
- ``template`` — template-bank shards (the TP analog: objects x views x
  scales split across chips; per-shard top-K then an all_gather merge).
- ``tile``     — image-tile shards with halo exchange (SP analog; round 2).
"""

from sixdpose_tpu.parallel.mesh import make_mesh
from sixdpose_tpu.parallel.sharded_match import (
    pad_templates,
    sharded_detect,
    sharded_multiscale_detect,
)

__all__ = [
    "make_mesh",
    "sharded_detect",
    "sharded_multiscale_detect",
    "pad_templates",
]
