"""Spatial (tile) sharding of detection with halo exchange.

SURVEY.md §2.5/§5: the "sequence/context parallel" analog — the scene
image shards into row slabs across the ``tile`` mesh axis; each shard
computes quantization -> response -> similarity on its slab extended by a
halo (the template extent wf x hf is the fundamental halo,
linemodLevelup.cpp:1299-1300, plus the quantization/refinement margins),
then per-shard top-K candidates are merged with one ``all_gather`` —
ring-attention-style structure where "KV" = template features and "Q" =
image tiles.

Halos are exchanged with ``jax.lax.ppermute`` between row-neighbor shards
(rides ICI on hardware).  Worth it for large scenes (e.g. T-LESS canon
2560x1920); for VGA the halo can rival the slab, which is why the
(data, template) axes are the default and ``tile`` is opt-in.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sixdpose_tpu.config import DetectorConfig
from sixdpose_tpu.models.detector import detect_frame_core


def required_halo(cfg: DetectorConfig, kh0: int) -> int:
    """Rows of context a tile needs beyond its slab on each side.

    Bottom: a placement whose origin row is owned may read down the
    template extent at level 0 (kh0) plus the 16-placement refinement
    window (16 * t0); top: the refinement may move an origin up by
    8 * t0.  Both plus the quantization neighborhood (blur/sobel/normals/
    median ~ 16 px) and pyramid rounding.
    """
    t0 = cfg.t_at_level[0]
    quant = 16
    down = kh0 + 16 * t0 + quant
    up = 8 * t0 + quant
    pow2 = 2 ** (cfg.pyramid_levels - 1)
    h = max(down, up)
    return -(-h // pow2) * pow2  # multiple of the pyramid factor


def tiled_detect(
    mesh: Mesh,
    rgb: jnp.ndarray,
    depth,
    kernels: Tuple[jnp.ndarray, ...],
    nfeats: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    cfg: DetectorConfig,
    threshold: float,
    feats: Tuple[jnp.ndarray, ...] = None,
    valids: Tuple[jnp.ndarray, ...] = None,
):
    """Detect one frame with the image row-sharded over mesh axis 'tile'.

    Args:
      rgb: (H, W, 3) uint8, H divisible by the tile-axis size.
      depth: (H, W) uint16 or None.
      feats/valids: optional per-level padded feature lists (replicated —
        template axis is whole here); enables the feature-sparse
        scoring/refinement paths.

    Design note — raw pixels vs response maps on the wire: each shard
    recomputes quantization over its halo (a ~16 px margin) rather than
    exchanging precomputed response maps.  Response maps are 16 uint8
    channels/pixel vs 5 bytes/pixel raw (rgb+depth), so pixel exchange
    moves ~3x less over ICI; the recompute it buys is a sliver of the
    ~1 ms full-frame pyramid.  Exchange bandwidth is the scarcer
    resource, so raw-pixel halos are the keeper design.

    Returns (tid, x, y, score): (top_k,) merged candidates in GLOBAL
    pixel coordinates (score sorted descending, -1 invalid).
    """
    n_tile = mesh.shape["tile"]
    h = rgb.shape[0]
    slab = h // n_tile
    kh0 = kernels[0].shape[2]
    halo = min(required_halo(cfg, kh0), slab * (n_tile - 1))
    hops = -(-halo // slab)  # ring hops needed when halo spans > 1 slab
    top_k = cfg.top_k
    has_depth = depth is not None
    has_sparse = feats is not None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("tile"),
            P("tile") if has_depth else None,
            P(),
            P(),
            P(),
            P() if has_sparse else None,
            P() if has_sparse else None,
        ),
        out_specs=P(),
        check_vma=False,
    )
    def step(rgb_s, dep_s, kern, nf, wh, feat_r, val_r):
        tidx = jax.lax.axis_index("tile")

        def with_halo(x_s):
            """Extend a slab with `halo` rows of context from each side,
            via ring hops (halo may span several neighbor slabs; shards at
            the image border keep zero padding)."""
            fwd = [(i, (i + 1) % n_tile) for i in range(n_tile)]
            bwd = [(i, (i - 1) % n_tile) for i in range(n_tile)]
            up_parts, down_parts = [], []
            cur_u = cur_d = x_s
            for hop in range(1, hops + 1):
                cur_u = jax.lax.ppermute(cur_u, "tile", fwd)   # from i-hop
                cur_d = jax.lax.ppermute(cur_d, "tile", bwd)   # from i+hop
                mask_u = (tidx >= hop).astype(x_s.dtype)
                mask_d = (tidx < n_tile - hop).astype(x_s.dtype)
                shape1 = (1,) * x_s.ndim
                up_parts.insert(0, cur_u * mask_u.reshape(shape1))
                down_parts.append(cur_d * mask_d.reshape(shape1))
            full = jnp.concatenate(up_parts + [x_s] + down_parts, axis=0)
            start = hops * slab - halo
            return jax.lax.dynamic_slice_in_dim(full, start, slab + 2 * halo, 0)

        rgb_h = with_halo(rgb_s)
        dep_h = with_halo(dep_s) if has_depth else None

        tid, x, y, score, _keep = detect_frame_core(
            rgb_h, dep_h, kern, nf, wh, cfg, threshold, apply_nms=False,
            feats=feat_r, valids=val_r,
        )
        # Convert to global coordinates; own only origins inside the slab.
        y_global = y - halo + tidx * slab
        own = (y >= halo) & (y < halo + slab) & (score >= 0)
        score = jnp.where(own, score, -1.0)

        g = jax.lax.all_gather((tid, x, y_global, score), "tile")  # (T, K)
        gt, gx, gy, gs = jax.tree.map(lambda a: a.reshape(-1), g)
        top_scores, idx = jax.lax.top_k(gs, top_k)
        return gt[idx], gx[idx], gy[idx], top_scores

    return step(
        rgb, depth, kernels, nfeats, whs,
        feats if has_sparse else None,
        valids if has_sparse else None,
    )
