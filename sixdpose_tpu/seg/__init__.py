"""3-D convex segmentation + global registration (reference: cxx_3d_seg/).

API mirrors cxx_3d_seg.h:19-29: ``convex_cloud_seg(rgb, depth, K)`` ->
segment indices + world/normal maps; ``pose_estimation(cloud, model)`` ->
4x4 transform accepted by LCP score.
"""

from typing import Tuple

import numpy as np

from sixdpose_tpu.seg.dasp import (
    DaspConfig,
    alic_iterate,
    convex_grouping,
    floyd_steinberg_seeds,
    pixel_stage,
)
from sixdpose_tpu.seg.registration import pose_estimation
from sixdpose_tpu.seg.slic import superpixels_asp, superpixels_slic

__all__ = [
    "DaspConfig",
    "pixel_stage",
    "floyd_steinberg_seeds",
    "alic_iterate",
    "convex_grouping",
    "convex_cloud_seg",
    "pose_estimation",
    "superpixels_slic",
    "superpixels_asp",
]


def convex_cloud_seg(
    rgb: np.ndarray,
    depth: np.ndarray,
    K: np.ndarray,
    cfg: DaspConfig = None,
    seed_pad: int = 128,
):
    """Segment an RGB-D frame into convex parts.

    Reference: cxx_3d_seg::convex_cloud_seg (cxx_3d_seg.cpp:3-50) —
    DASP superpixels then convexity grouping.  Returns
    (indices (H, W) int [-1 invalid], world (H, W, 3) float meters,
    normal (H, W, 3) float).
    """
    import jax.numpy as jnp

    K = np.asarray(K, np.float64)
    if cfg is None:
        cfg = DaspConfig(focal_px=float(K[0, 0]), cx=float(K[0, 2]), cy=float(K[1, 2]))

    px = pixel_stage(jnp.asarray(rgb), jnp.asarray(depth), cfg)
    density = np.asarray(px["density"])
    seeds = floyd_steinberg_seeds(density)
    if len(seeds) == 0:
        h, w = depth.shape
        return (
            np.full((h, w), -1, np.int64),
            np.asarray(px["world"]),
            np.asarray(px["normal"]),
        )
    # Pad seed count to a bucket (stable jit shapes across frames).
    s_pad = -(-len(seeds) // seed_pad) * seed_pad
    seed_xy = np.zeros((s_pad, 2), np.float32)
    seed_xy[: len(seeds)] = seeds
    seed_valid = np.zeros((s_pad,), bool)
    seed_valid[: len(seeds)] = True

    indices, sp = alic_iterate(
        px, jnp.asarray(seed_xy), jnp.asarray(seed_valid), cfg, s_pad
    )
    segments = convex_grouping(
        np.asarray(indices),
        np.asarray(sp["world"]),
        np.asarray(sp["normal"]),
        np.asarray(sp["num"]),
        cfg,
    )
    return segments, np.asarray(px["world"]), np.asarray(px["normal"])
