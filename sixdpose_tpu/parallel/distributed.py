"""Multi-host initialization and scaling measurement.

The reference has no distributed backend (SURVEY.md §5); here multi-host
runs use ``jax.distributed`` + the same shard_map pipelines as
single-host — the mesh simply spans all processes' devices (data/template
collectives ride ICI within a slice, DCN across hosts feeds the data axis).

On a single host these helpers degrade to the local device set, so the
same driver script works from 1 chip to a pod slice.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from sixdpose_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-process; no-op for a
    single process (args resolve from cluster env vars when omitted)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def global_mesh(template: int = 1, tile: int = 1):
    """A mesh over ALL processes' devices: data axis absorbs whatever is
    left after the template/tile factors."""
    n = jax.device_count()
    data = max(n // (template * tile), 1)
    return make_mesh(data=data, template=template, tile=tile)


def measure_scaling(step_fn, args_for, sizes, warmup: int = 1, iters: int = 5):
    """Throughput scaling efficiency across mesh sizes.

    Args:
      step_fn: f(mesh, *args) -> outputs (blocking handled here).
      args_for: f(mesh) -> args tuple (inputs sized to the mesh).
      sizes: list of device counts to test (must divide availability).

    Returns {size: {"s_per_step", "efficiency"}} with efficiency relative
    to linear scaling from the smallest size.
    """
    results = {}
    base = None
    for size in sizes:
        devs = jax.devices()[:size]
        mesh = make_mesh(data=size, devices=devs)
        args = args_for(mesh)
        for _ in range(warmup):
            jax.block_until_ready(step_fn(mesh, *args))
        t0 = time.time()
        for _ in range(iters):
            out = step_fn(mesh, *args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        per_item = dt / size  # work scales with the data axis
        if base is None:
            base = per_item
        results[size] = {
            "s_per_step": dt,
            "efficiency": base / per_item if per_item > 0 else 0.0,
        }
    return results
