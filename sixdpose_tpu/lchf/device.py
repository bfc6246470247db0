"""Device-side (jit) LCHF similarity for scene prediction.

``predict_scene`` walks each tree level-synchronously; every node needs
similarity(pivot patch -> cohort of ROIs).  The numpy path gathers on
host; this module keeps the ROI set resident on device and evaluates each
cohort with one jit call (cohort sizes are bucketed to powers of two so
the jit cache stays small).

Semantics identical to feature.similarity_one_to_many (lchf.cpp:716-792).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.lchf.feature import PatchFeature, PatchSet


class DeviceRoiSet:
    """PatchSet staged on device + padded pivot-feature table."""

    def __init__(self, roi_set: PatchSet, patches, z_check: float = 200.0):
        self.responses = jnp.asarray(roi_set.responses)
        self.z_avg = jnp.asarray(roi_set.z_avg)
        self.center = jnp.asarray(roi_set.center)
        self.z_check = float(z_check)

        fmax = max(len(p.features) for p in patches)
        n = len(patches)
        feats = np.zeros((n, fmax, 3), np.int32)
        valid = np.zeros((n, fmax), bool)
        zrel = np.zeros((n, fmax), np.float32)
        centers = np.zeros((n,), np.float32)
        shapes = np.zeros((n, 2), np.int32)
        for i, p in enumerate(patches):
            f = len(p.features)
            feats[i, :f] = p.features
            valid[i, :f] = True
            zrel[i, :f] = p.z_rel
            centers[i] = p.center_dep
            shapes[i] = p.shape
        self.p_feats = jnp.asarray(feats)
        self.p_valid = jnp.asarray(valid)
        self.p_zrel = jnp.asarray(zrel)
        self.p_center = jnp.asarray(centers)
        self.p_shape = jnp.asarray(shapes)

    def sim_rows(self, pivot: int, idx: np.ndarray) -> np.ndarray:
        """similarity(patches[pivot] -> rois[idx]); host in, host out."""
        j = len(idx)
        bucket = 1 << max(int(np.ceil(np.log2(max(j, 1)))), 0)
        idx_p = np.zeros(bucket, np.int64)
        idx_p[:j] = idx
        mask = np.zeros(bucket, bool)
        mask[:j] = True
        sims = _sim_rows_jit(
            self.p_feats[pivot],
            self.p_valid[pivot],
            self.p_zrel[pivot],
            self.p_center[pivot],
            self.p_shape[pivot],
            self.responses,
            self.z_avg,
            self.center,
            jnp.asarray(idx_p),
            jnp.asarray(mask),
            self.z_check,
        )
        return np.asarray(sims)[:j]


class DeviceForest:
    """Whole-forest scene prediction as one jit dispatch per tree.

    ``DeviceRoiSet.sim_rows`` still round-trips host<->device once per
    tree NODE (and the readbacks degrade tunneled devices to synchronous
    dispatch).  Here the level-synchronous walk itself is compiled: each
    ROI carries its current node id; one fori_loop step gathers every
    ROI's pivot-patch feature table, evaluates the similarity, and
    advances to the chosen child — leaves self-loop.  max_depth steps
    retire the whole tree with zero intermediate readbacks.

    Semantics identical to forest.Tree.predict over
    feature.similarity_one_to_many (forest.h:497-512, lchf.cpp:716-792).
    """

    def __init__(self, model, z_check: float = 200.0):
        self.z_check = float(z_check)
        self.max_depth = max(t.max_depth for t in model.forest.trees)
        # Padded pivot-patch tables (shared across trees).
        patches = model.patches
        fmax = max(len(p.features) for p in patches)
        n = len(patches)
        feats = np.zeros((n, fmax, 3), np.int32)
        valid = np.zeros((n, fmax), bool)
        zrel = np.zeros((n, fmax), np.float32)
        centers = np.zeros((n,), np.float32)
        shapes = np.zeros((n, 2), np.int32)
        for i, p in enumerate(patches):
            f = len(p.features)
            feats[i, :f] = p.features
            valid[i, :f] = True
            zrel[i, :f] = p.z_rel
            centers[i] = p.center_dep
            shapes[i] = p.shape
        self.p_feats = jnp.asarray(feats)
        self.p_valid = jnp.asarray(valid)
        self.p_zrel = jnp.asarray(zrel)
        self.p_center = jnp.asarray(centers)
        self.p_shape = jnp.asarray(shapes)
        # Per-tree node tables.
        self.trees = []
        for tree in model.forest.trees:
            nn = len(tree.nodes)
            split = np.zeros((nn,), np.int32)
            thresh = np.zeros((nn,), np.float32)
            leaf = np.zeros((nn,), bool)
            child = np.zeros((nn, 2), np.int32)
            for i, nd in enumerate(tree.nodes):
                split[i] = nd.split_feat_idx
                thresh[i] = nd.simi_thresh
                leaf[i] = nd.isleafnode
                child[i] = nd.cnodes
            self.trees.append(
                (jnp.asarray(split), jnp.asarray(thresh), jnp.asarray(leaf),
                 jnp.asarray(child))
            )

    def predict(self, roi_set: PatchSet) -> np.ndarray:
        """Leaf id per (roi, tree): (M, T) int64, one dispatch per tree."""
        responses = jnp.asarray(roi_set.responses)
        z_avg = jnp.asarray(roi_set.z_avg)
        center = jnp.asarray(roi_set.center)
        outs = [
            _walk_tree_jit(
                split, thresh, leaf, child,
                self.p_feats, self.p_valid, self.p_zrel, self.p_center,
                self.p_shape, responses, z_avg, center,
                self.z_check, self.max_depth,
            )
            for (split, thresh, leaf, child) in self.trees
        ]
        return np.stack([np.asarray(o) for o in outs], axis=1).astype(np.int64)


@functools.partial(jax.jit, static_argnames=("z_check", "max_depth"))
def _walk_tree_jit(
    split, thresh, leaf, child,
    p_feats, p_valid, p_zrel, p_center, p_shape,
    responses, z_avg, centers, z_check: float, max_depth: int,
):
    m = responses.shape[0]
    jh, jw = z_avg.shape[1:]
    roi = jnp.arange(m)
    cj = centers  # (M,)

    def sim_to_own_pivot(pivot):
        """similarity(patches[pivot[i]] -> roi i) for all i at once."""
        f3 = p_feats[pivot]                       # (M, F, 3)
        val = p_valid[pivot]
        zr = p_zrel[pivot]
        ca = p_center[pivot]                      # (M,)
        sh = p_shape[pivot]                       # (M, 2)
        x = f3[..., 0].astype(jnp.float32)
        y = f3[..., 1].astype(jnp.float32)
        c = f3[..., 2]
        ratio = (ca / jnp.maximum(cj, 1e-6))[:, None]
        nx = (x * ratio).astype(jnp.int32)
        ny = (y * ratio).astype(jnp.int32)
        inb = (
            val
            & (y < sh[:, 0:1]) & (x < sh[:, 1:2])
            & (ny < jh) & (nx < jw) & (ny >= 0) & (nx >= 0)
        )
        nxc = jnp.clip(nx, 0, jw - 1)
        nyc = jnp.clip(ny, 0, jh - 1)
        rr = roi[:, None]
        z2 = cj[:, None] - z_avg[rr, nyc, nxc]
        z_ok = jnp.abs(zr - z2) < z_check
        resp = responses[rr, c, nyc, nxc].astype(jnp.float32)
        score = jnp.sum(jnp.where(inb & z_ok, resp, 0.0), axis=1)
        count = jnp.sum(inb, axis=1)
        sim = jnp.where(count > 0, score / jnp.maximum(count, 1) / 4.0 * 100.0, 0.0)
        return jnp.where((cj > 0) & (ca > 0), sim, 0.0)

    def step(i, node):
        sims = sim_to_own_pivot(split[node])
        go_left = sims <= thresh[node]
        nxt = jnp.where(go_left, child[node, 0], child[node, 1])
        return jnp.where(leaf[node], node, nxt)

    return jax.lax.fori_loop(0, max_depth, step, jnp.zeros((m,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("z_check",))
def _sim_rows_jit(
    feats, valid, zrel, center_a, shape_a,
    responses, z_avg, centers, idx, mask, z_check: float,
):
    j = idx.shape[0]
    cj = centers[idx]                       # (J,)
    ok_j = (cj > 0) & (center_a > 0) & mask
    x = feats[:, 0][None, :].astype(jnp.float32)
    y = feats[:, 1][None, :].astype(jnp.float32)
    c = feats[:, 2][None, :]
    ratio = center_a / jnp.maximum(cj[:, None], 1e-6)
    nx = (x * ratio).astype(jnp.int32)
    ny = (y * ratio).astype(jnp.int32)
    jh = z_avg.shape[1]
    jw = z_avg.shape[2]
    inb = (
        valid[None, :]
        & (y < shape_a[0]) & (x < shape_a[1])
        & (ny < jh) & (nx < jw) & (ny >= 0) & (nx >= 0)
    )
    nxc = jnp.clip(nx, 0, jw - 1)
    nyc = jnp.clip(ny, 0, jh - 1)
    jj = jnp.broadcast_to(idx[:, None], nxc.shape)
    z2 = cj[:, None] - z_avg[jj, nyc, nxc]
    z_ok = jnp.abs(zrel[None, :] - z2) < z_check
    resp = responses[jj, jnp.broadcast_to(c, nxc.shape), nyc, nxc].astype(jnp.float32)
    score = jnp.sum(jnp.where(inb & z_ok, resp, 0.0), axis=1)
    count = jnp.sum(inb, axis=1)
    sim = jnp.where(count > 0, score / jnp.maximum(count, 1) / 4.0 * 100.0, 0.0)
    return jnp.where(ok_j, sim, 0.0)


@functools.partial(jax.jit, static_argnames=("z_check",))
def _sim_matrix_jit(
    p_feats, p_valid, p_zrel, p_center, p_shape,
    responses, z_avg, centers, z_check: float,
):
    """(N_pivots, M_targets) similarity matrix in one dispatch.

    SURVEY.md §7: forest training's hot loop is similarity(pivot ->
    cohort) per split attempt (O(trees * nodes * samples * nfeat),
    forest.h:303-416); computing the full matrix once turns every split
    into an array lookup.  Rows evaluate sequentially under lax.map
    (each row is an (M, F) vectorized gather), so peak memory stays
    O(M * F) instead of O(N * M * F).
    """
    m = responses.shape[0]
    jh, jw = z_avg.shape[1:]
    cj = centers

    def one_row(pivot):
        f3 = p_feats[pivot]
        val = p_valid[pivot]
        zr = p_zrel[pivot]
        ca = p_center[pivot]
        sh = p_shape[pivot]
        x = f3[:, 0][None, :].astype(jnp.float32)
        y = f3[:, 1][None, :].astype(jnp.float32)
        c = f3[:, 2][None, :]
        ratio = (ca / jnp.maximum(cj, 1e-6))[:, None]
        nx = (x * ratio).astype(jnp.int32)
        ny = (y * ratio).astype(jnp.int32)
        inb = (
            val[None, :]
            & (y < sh[0]) & (x < sh[1])
            & (ny < jh) & (nx < jw) & (ny >= 0) & (nx >= 0)
        )
        nxc = jnp.clip(nx, 0, jw - 1)
        nyc = jnp.clip(ny, 0, jh - 1)
        jj = jnp.broadcast_to(jnp.arange(m)[:, None], nxc.shape)
        z2 = cj[:, None] - z_avg[jj, nyc, nxc]
        z_ok = jnp.abs(zr[None, :] - z2) < z_check
        resp = responses[jj, jnp.broadcast_to(c, nxc.shape), nyc, nxc].astype(jnp.float32)
        score = jnp.sum(jnp.where(inb & z_ok, resp, 0.0), axis=1)
        count = jnp.sum(inb, axis=1)
        sim = jnp.where(count > 0, score / jnp.maximum(count, 1) / 4.0 * 100.0, 0.0)
        return jnp.where((cj > 0) & (ca > 0), sim, 0.0)

    return jax.lax.map(one_row, jnp.arange(p_feats.shape[0]))


def similarity_matrix_device(patches, roi_set, z_check: float = 200.0):
    """Full patches x roi_set similarity matrix on device (one dispatch,
    one readback).  Semantics identical to feature.similarity_one_to_many
    per row."""
    dset = DeviceRoiSet(roi_set, patches, z_check)
    s = _sim_matrix_jit(
        dset.p_feats, dset.p_valid, dset.p_zrel, dset.p_center, dset.p_shape,
        dset.responses, dset.z_avg, dset.center, z_check,
    )
    return np.asarray(s)
