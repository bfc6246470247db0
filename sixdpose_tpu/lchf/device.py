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
