"""Pose-error metrics: VSD, ADD, ADI, COU, re, te.

Reference: pysixd/pose_error.py (Hodan et al., "On Evaluation of 6D Object
Pose Estimation", ECCVW 2016).  Differences by design:

- Depth renders come from the JAX rasterizer (geometry/render.py) instead
  of OpenGL.
- ADI's nearest-neighbor search is a chunked pairwise-min on device
  (no KD-tree; O(n*m) but MXU/VPU-batched), with optional subsampling.
- The inner loops (distance images, visibility masks, cost sums) are jit.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.eval.misc import depth_im_to_dist_im, transform_pts_Rt
from sixdpose_tpu.geometry.render import render_depth


# ---------------------------------------------------------------------------
# Visibility masks (reference: pysixd/visibility.py:6-31)
# ---------------------------------------------------------------------------


def estimate_visib_mask(d_test: jnp.ndarray, d_model: jnp.ndarray, delta: float):
    valid = (d_test > 0) & (d_model > 0)
    return valid & ((d_model - d_test) <= delta)


def estimate_visib_mask_gt(d_test, d_gt, delta):
    return estimate_visib_mask(d_test, d_gt, delta)


def estimate_visib_mask_est(d_test, d_est, visib_gt, delta):
    v = estimate_visib_mask(d_test, d_est, delta)
    return v | (visib_gt & (d_est > 0))


# ---------------------------------------------------------------------------
# Point metrics
# ---------------------------------------------------------------------------


@jax.jit
def _add_jax(pts, R_est, t_est, R_gt, t_gt):
    pe = pts @ R_est.T + t_est.reshape(1, 3)
    pg = pts @ R_gt.T + t_gt.reshape(1, 3)
    return jnp.linalg.norm(pe - pg, axis=1).mean()


def add(R_est, t_est, R_gt, t_gt, model) -> float:
    """Average distance of model points (pose_error.py:117-131)."""
    pts = jnp.asarray(np.asarray(model["pts"], np.float32))
    return float(
        _add_jax(
            pts,
            jnp.asarray(np.asarray(R_est, np.float32)),
            jnp.asarray(np.asarray(t_est, np.float32)),
            jnp.asarray(np.asarray(R_gt, np.float32)),
            jnp.asarray(np.asarray(t_gt, np.float32)),
        )
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def _adi_jax(pts, R_est, t_est, R_gt, t_gt, chunk: int = 1024):
    pe = pts @ R_est.T + t_est.reshape(1, 3)
    pg = pts @ R_gt.T + t_gt.reshape(1, 3)
    n = pg.shape[0]
    pad = (-n) % chunk
    pg_p = jnp.pad(pg, ((0, pad), (0, 0)))

    def one_chunk(g):
        d2 = jnp.sum((g[:, None, :] - pe[None, :, :]) ** 2, -1)
        return jnp.sqrt(jnp.min(d2, axis=1))

    dists = jax.lax.map(one_chunk, pg_p.reshape(-1, chunk, 3)).reshape(-1)
    mask = jnp.arange(dists.shape[0]) < n
    return jnp.sum(jnp.where(mask, dists, 0.0)) / n


def adi(R_est, t_est, R_gt, t_gt, model, max_pts: Optional[int] = None) -> float:
    """Average distance to the nearest model point (pose_error.py:133-152).

    ``max_pts`` subsamples the cloud deterministically for speed (None =
    exact, same as the reference's cKDTree query over all points)."""
    pts = np.asarray(model["pts"], np.float32)
    if max_pts is not None and len(pts) > max_pts:
        sel = np.linspace(0, len(pts) - 1, max_pts).astype(np.int64)
        pts = pts[sel]
    return float(
        _adi_jax(
            jnp.asarray(pts),
            jnp.asarray(np.asarray(R_est, np.float32)),
            jnp.asarray(np.asarray(t_est, np.float32)),
            jnp.asarray(np.asarray(R_gt, np.float32)),
            jnp.asarray(np.asarray(t_gt, np.float32)),
        )
    )


def re(R_est, R_gt) -> float:
    """Rotational error in degrees (pose_error.py:154-167)."""
    c = 0.5 * (np.trace(np.asarray(R_est) @ np.linalg.inv(np.asarray(R_gt))) - 1.0)
    return float(180.0 / np.pi * math.acos(min(1.0, max(-1.0, c))))


def te(t_est, t_gt) -> float:
    """Translational error (pose_error.py:169-178)."""
    return float(np.linalg.norm(np.asarray(t_gt).flatten() - np.asarray(t_est).flatten()))


# ---------------------------------------------------------------------------
# Render-based metrics
# ---------------------------------------------------------------------------


def _render(model, im_size, K, R, t, clip_near, clip_far):
    # The host wrapper handles adaptive mesh subdivision (+ caching) so
    # large triangles are never silently dropped by the fixed raster tile.
    from sixdpose_tpu.geometry.render import render as _host_render

    return _host_render(
        model, tuple(im_size), K, R, t, clip_near, clip_far, mode="depth"
    )


@functools.partial(jax.jit, static_argnames=("cost_type",))
def _vsd_jax(d_test, d_est, d_gt, K, delta, tau, cost_type):
    dist_test = depth_im_to_dist_im(d_test, K)
    dist_est = depth_im_to_dist_im(d_est, K)
    dist_gt = depth_im_to_dist_im(d_gt, K)
    visib_gt = estimate_visib_mask_gt(dist_test, dist_gt, delta)
    visib_est = estimate_visib_mask_est(dist_test, dist_est, visib_gt, delta)
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    diff = jnp.abs(dist_gt - dist_est)
    if cost_type == "step":
        costs = (diff >= tau).astype(jnp.float32)
    elif cost_type == "tlinear":
        costs = jnp.minimum(diff / tau, 1.0)
    else:
        raise ValueError(f"unknown cost type {cost_type!r}")
    union_count = jnp.sum(union)
    inter_count = jnp.sum(inter)
    cost_sum = jnp.sum(jnp.where(inter, costs, 0.0))
    e = (cost_sum + (union_count - inter_count)) / jnp.maximum(union_count, 1)
    return jnp.where(union_count > 0, e, 1.0)


def vsd(
    R_est,
    t_est,
    R_gt,
    t_gt,
    model,
    depth_test,
    K,
    delta: float,
    tau: float,
    cost_type: str = "tlinear",
) -> float:
    """Visible Surface Discrepancy (pose_error.py:12-81).

    SIXD-2017 protocol uses delta=15, tau=20, cost_type='step'
    (tools/eval_calc_errors.py:34-42)."""
    im_size = (depth_test.shape[1], depth_test.shape[0])
    d_est = _render(model, im_size, K, R_est, t_est, 100.0, 10000.0)
    d_gt = _render(model, im_size, K, R_gt, t_gt, 100.0, 10000.0)
    return float(
        _vsd_jax(
            jnp.asarray(np.asarray(depth_test, np.float32)),
            d_est,
            d_gt,
            jnp.asarray(np.asarray(K, np.float32)),
            float(delta),
            float(tau),
            cost_type,
        )
    )


def cou(R_est, t_est, R_gt, t_gt, model, im_size, K) -> float:
    """Complement over union of rendered masks (pose_error.py:83-115)."""
    d_est = _render(model, im_size, K, R_est, t_est, 100.0, 10000.0)
    d_gt = _render(model, im_size, K, R_gt, t_gt, 100.0, 10000.0)
    me = np.asarray(d_est) > 0
    mg = np.asarray(d_gt) > 0
    union = float(np.logical_or(me, mg).sum())
    if union == 0:
        return 1.0
    return 1.0 - float(np.logical_and(me, mg).sum()) / union
