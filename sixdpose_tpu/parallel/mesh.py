"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    template: int = 1,
    tile: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, template, tile) mesh over the available devices.

    Collectives along ``template`` and ``tile`` ride the fastest (innermost)
    axes; ``data`` is outermost since DP needs no per-step communication —
    the standard layout recipe (ICI for tensor-like axes, DCN across hosts).
    """
    devs = list(devices if devices is not None else jax.devices())
    need = data * template * tile
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(data, template, tile)
    return Mesh(arr, ("data", "template", "tile"))
