"""Depth-histogram scale proposal with 1-D NMS.

Reference behavior (linemodLevelup/notes.md:44-63, readme.md:29-34): build
a histogram of scene depths, pick ~5 peaks by 1-D NMS, and match templates
scaled to each peak depth ("cut original img to several almost-same-depth
parts, then scale template just one time to each part").  The reference
never checked the histogram code in; drivers select per-scale template
files by hand (test.cpp:116, 178).  Here it is a first-class jit stage
(SURVEY.md §2.1 "multi-scale strategy").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("num_scales", "bin_mm", "lo_mm", "hi_mm", "nms_radius", "min_pixels"),
)
def propose_depths(
    depth: jnp.ndarray,
    num_scales: int = 5,
    bin_mm: int = 100,
    lo_mm: int = 400,
    hi_mm: int = 2000,
    nms_radius: int = 2,
    min_pixels: int = 200,
):
    """Candidate object depths from the scene depth histogram.

    Args:
      depth: (H, W) uint16 depth in mm.
      num_scales: number of depth proposals S (reference: "typically 5").
      bin_mm: histogram bin width.
      lo_mm / hi_mm: depth range considered.
      nms_radius: half-window (in bins) for the 1-D peak NMS.
      min_pixels: minimum pixels in a bin for a valid peak.

    Returns:
      depths: (S,) float32 candidate depths in mm (0 where no valid peak).
      counts: (S,) int32 pixel support of each peak.
    """
    nb = (hi_mm - lo_mm) // bin_mm
    d = depth.astype(jnp.int32).reshape(-1)
    ok = (d >= lo_mm) & (d < hi_mm)
    bins = jnp.clip((d - lo_mm) // bin_mm, 0, nb - 1)
    hist = jnp.zeros((nb,), jnp.int32).at[bins].add(ok.astype(jnp.int32))

    # 1-D NMS: a bin survives if it is the max over +-nms_radius bins.
    padded = jnp.pad(hist, nms_radius)
    windows = jnp.stack(
        [padded[i : i + nb] for i in range(2 * nms_radius + 1)], axis=0
    )
    local_max = hist >= jnp.max(windows, axis=0)
    peak_counts = jnp.where(local_max & (hist >= min_pixels), hist, 0)

    top_counts, top_idx = jax.lax.top_k(peak_counts, num_scales)
    centers = (lo_mm + (top_idx.astype(jnp.float32) + 0.5) * bin_mm)
    depths = jnp.where(top_counts > 0, centers, 0.0)
    return depths, top_counts


@functools.partial(
    jax.jit,
    static_argnames=("num_scales", "bin_mm", "lo_mm", "hi_mm", "nms_radius", "min_pixels"),
)
def propose_depth_bins(
    depth: jnp.ndarray,
    num_scales: int = 5,
    bin_mm: int = 100,
    lo_mm: int = 400,
    hi_mm: int = 2000,
    nms_radius: int = 2,
    min_pixels: int = 200,
):
    """Like :func:`propose_depths` but returns histogram-bin INDICES, for
    selecting among kernels prebuilt per discrete depth bin.

    Returns (bin_idx (S,) int32, depths (S,) float32, counts (S,) int32);
    bin_idx is 0 and depth 0 where no valid peak.
    """
    depths, counts = propose_depths(
        depth, num_scales, bin_mm, lo_mm, hi_mm, nms_radius, min_pixels
    )
    idx = jnp.clip(
        ((depths - lo_mm) / bin_mm).astype(jnp.int32), 0, (hi_mm - lo_mm) // bin_mm - 1
    )
    idx = jnp.where(counts > 0, idx, 0)
    return idx, depths, counts


def bin_centers(bin_mm: int = 100, lo_mm: int = 400, hi_mm: int = 2000):
    """Static depth-bin centers matching propose_depth_bins."""
    import numpy as np

    nb = (hi_mm - lo_mm) // bin_mm
    return lo_mm + (np.arange(nb) + 0.5) * bin_mm
