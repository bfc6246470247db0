"""Hough voting and scene ROI handling for LCHF.

Reference: LCHF_test.py:260-425 — dense ROIs at stride 5 with a 5x5 mean
patch depth, forest leaf prediction per ROI, then votes into a 5-D
(x/10, y/10, theta0, theta1, theta2) tensor with depth-ratio-scaled
translation offsets; top-10 bins are the pose hypotheses.

The vote accumulation runs as one jit scatter-add over all
(roi, tree, leaf-sample) triples.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.lchf.feature import mean_depth_5x5


def dense_rois(
    depth: np.ndarray,
    stride: int = 5,
    width: int = 50,
    height: int = 50,
    dep_off: Tuple[int, int] = (10, 10),
) -> np.ndarray:
    """(M, 5) rois [x, y, w, h, patch_depth] (LCHF_test.py:303-334);
    patch depth = 5x5 mean of nonzero depth at (x+10, y+10); rois with no
    valid depth are dropped."""
    rows, cols = depth.shape
    zavg = mean_depth_5x5(depth)  # window centered; reference anchors top-left
    xs = np.arange(0, cols - width - 2 * stride, stride)
    ys = np.arange(0, rows - height - 2 * stride, stride)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    # reference averages depth[y+10 : y+15, x+10 : x+15] (top-left anchored);
    # our zavg is centered, so sample at +12.
    dz = zavg[np.clip(gy + dep_off[1] + 2, 0, rows - 1), np.clip(gx + dep_off[0] + 2, 0, cols - 1)]
    ok = dz > 0
    rois = np.stack(
        [gx[ok], gy[ok], np.full(ok.sum(), width), np.full(ok.sum(), height), dz[ok].astype(np.int64)],
        axis=1,
    )
    return rois.astype(np.int64)


@functools.partial(
    jax.jit, static_argnames=("vote_shape", "steps", "num_angle_bins")
)
def accumulate_votes(
    roi_xy: jnp.ndarray,       # (V, 2) roi x, y per vote
    roi_depth: jnp.ndarray,    # (V,) patch depth per vote
    offsets: jnp.ndarray,      # (V, 3) training-sample t (x, y, z offset)
    rpys: jnp.ndarray,         # (V, 3) training-sample rpy
    weights: jnp.ndarray,      # (V,) vote weight
    train_radius: float,
    vote_shape: Tuple[int, int, int, int, int],
    steps: int = 10,
    num_angle_bins: int = 10,
):
    """Scatter-add all votes into the 5-D tensor (LCHF_test.py:343-390)."""
    nx, ny, na = vote_shape[0], vote_shape[1], vote_shape[2]
    scale = train_radius / jnp.maximum(roi_depth.astype(jnp.float32), 1.0)
    off_x = offsets[:, 0] * scale
    off_y = offsets[:, 1] * scale
    bx = ((roi_xy[:, 0].astype(jnp.float32) - off_x) / steps).astype(jnp.int32)
    by = ((roi_xy[:, 1].astype(jnp.float32) - off_y) / steps).astype(jnp.int32)
    th = (rpys / 2.0 / 3.14 * num_angle_bins).astype(jnp.int32)
    ok = (
        (bx >= 0) & (bx < nx) & (by >= 0) & (by < ny)
        & jnp.all((th >= -num_angle_bins) & (th < num_angle_bins), axis=1)
    )
    th = th % num_angle_bins
    votes = jnp.zeros(vote_shape, jnp.float32)
    votes = votes.at[
        jnp.where(ok, bx, 0),
        jnp.where(ok, by, 0),
        th[:, 0],
        th[:, 1],
        th[:, 2],
    ].add(jnp.where(ok, weights, 0.0))
    return votes


def leaf_mode_map(model, bandwidth: float = 1.0):
    """Mean-shift mode clustering of every leaf's pose labels.

    The reference makes this reduction available at forest.cpp:200-228
    (lchf_helper::cluster over interleaved 6-D (rpy, t) leaf vectors) but
    its Python driver votes with raw samples; here both are first-class.
    Returns [tree] -> {leaf_id: (rpy_modes (C,3), t_modes (C,3),
    weights (C,))} with weights = cluster size / leaf size, so each leaf
    still contributes total weight 1 per tree.
    """
    from sixdpose_tpu.lchf.meanshift import cluster_leaf_infos

    out = []
    for tree_leaves in model.leaf_feats_map():
        modes = {}
        for leaf, ids in tree_leaves.items():
            ids = np.asarray(ids)
            if len(ids) == 0:
                continue
            rpy_m, t_m, labels = cluster_leaf_infos(
                model.rpy[ids], model.t[ids], bandwidth
            )
            counts = np.bincount(labels, minlength=len(rpy_m)).astype(np.float64)
            modes[int(leaf)] = (rpy_m, t_m, counts / len(ids))
        out.append(modes)
    return out


def assemble_votes(
    leaf_per_tree_per_roi: Sequence[Sequence[int]],
    leaf_map,
    rois: np.ndarray,
    infos_rpy: np.ndarray,
    infos_t: np.ndarray,
    leaf_modes=None,
):
    """Expand (roi, tree) leaf predictions into flat vote arrays
    (roi_xy (V, 2), roi_depth (V,), offsets (V, 3), rpys (V, 3),
    weights (V,)) — the shared front half of voting and pose decoding."""
    roi_xy, roi_d, off, rpy, wgt = [], [], [], [], []
    num_trees = len(leaf_map)
    for ri, leaves in enumerate(leaf_per_tree_per_roi):
        for ti, leaf in enumerate(leaves):
            if leaf_modes is not None:
                entry = leaf_modes[ti].get(int(leaf))
                if entry is None:
                    continue
                rpy_m, t_m, wm = entry
                for ci in range(len(wm)):
                    roi_xy.append(rois[ri, :2])
                    roi_d.append(rois[ri, 4])
                    off.append(t_m[ci])
                    rpy.append(rpy_m[ci])
                    wgt.append(wm[ci] / num_trees)
                continue
            ids = leaf_map[ti].get(int(leaf))
            if ids is None or len(ids) == 0:
                continue
            wv = 1.0 / len(ids) / num_trees
            for sid in np.asarray(ids):
                roi_xy.append(rois[ri, :2])
                roi_d.append(rois[ri, 4])
                off.append(infos_t[sid])
                rpy.append(infos_rpy[sid])
                wgt.append(wv)
    if not roi_xy:
        z = np.zeros
        return (z((0, 2)), z((0,)), z((0, 3), np.float32),
                z((0, 3), np.float32), z((0,), np.float32))
    return (
        np.array(roi_xy),
        np.array(roi_d),
        np.array(off, np.float32),
        np.array(rpy, np.float32),
        np.array(wgt, np.float32),
    )


def hough_vote(
    leaf_per_tree_per_roi: Sequence[Sequence[int]],
    leaf_map,
    rois: np.ndarray,
    infos_rpy: np.ndarray,
    infos_t: np.ndarray,
    im_size: Tuple[int, int],
    train_radius: float,
    steps: int = 10,
    num_angle_bins: int = 10,
    top_k: int = 10,
    leaf_modes=None,
):
    """Full voting pass: expand leaves to votes, accumulate, rank bins.

    Args:
      leaf_per_tree_per_roi: [roi][tree] -> leaf id.
      leaf_map: Forest.leaf_feats_map() output.
      infos_rpy / infos_t: (N_train, 3) labels.
      im_size: (W, H).
      leaf_modes: optional ``leaf_mode_map`` output — votes are then cast
        from each leaf's mean-shift modes (weight = cluster fraction)
        instead of every raw training sample.

    Returns (top bins (top_k, 5) int, top scores (top_k,), votes tensor).
    """
    w, h = im_size
    vote_shape = (w // steps, h // steps, num_angle_bins, num_angle_bins, num_angle_bins)

    roi_xy, roi_d, off, rpy, wgt = assemble_votes(
        leaf_per_tree_per_roi, leaf_map, rois, infos_rpy, infos_t, leaf_modes
    )
    if len(roi_xy) == 0:
        empty = np.zeros(vote_shape, np.float32)
        return np.zeros((0, 5), np.int64), np.zeros(0, np.float32), empty

    votes = accumulate_votes(
        jnp.asarray(roi_xy),
        jnp.asarray(roi_d),
        jnp.asarray(off),
        jnp.asarray(rpy),
        jnp.asarray(wgt),
        float(train_radius),
        vote_shape,
        steps,
        num_angle_bins,
    )
    votes = np.asarray(votes)
    flat = votes.reshape(-1)
    k = min(top_k, flat.size)
    top = np.argsort(-flat)[:k]
    bins = np.stack(np.unravel_index(top, votes.shape), axis=1)
    return bins, flat[top], votes
