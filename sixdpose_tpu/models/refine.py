"""Batched point-to-plane ICP pose refinement.

Reference: ``poseRefine::process`` (linemodLevelup.cpp:27-170) — backprojects
the rendered model depth and a scene-depth crop to point clouds, seeds the
pose with a centroid shift, voxel-downsamples, and runs Open3D point-to-plane
``RegistrationICP`` (threshold 0.01 m), returning the refined R, t (mm) and
the ICP fitness as ``residual``.

TPU re-design (no KD-trees, fixed shapes, batched over candidates):

- Model cloud: fixed-size sample of backprojected render pixels (masked,
  padded) instead of voxel downsampling.
- Correspondences by *projective data association*: transformed model
  points are projected with the scene intrinsics and matched to the scene
  point at that pixel — the image-space analog of the reference's cropped
  clouds, and O(N) with no tree.
- Scene normals from depth-image derivatives (replaces Open3D
  ``EstimateNormals``).
- Gauss-Newton on se(3): rows a = [p x n, n], b = -n.(p - q); the 6x6
  normal equations are built with einsum and solved in one
  ``jnp.linalg.solve``; vmap over K candidates solves all systems at once.
- Fixed iteration count under ``lax.fori_loop`` (static shapes under jit).

Conventions match the reference: depths in mm, poses R (3,3) + t (3,1) mm,
``fitness`` = inlier fraction of valid model points.  Note: the reference
accidentally downsamples the *model* cloud for both sides
(scene_pcd_down = model_pcd->VoxelDownSample, cpp:108-109); per SURVEY.md §2
item 13 this implementation uses the actual scene points.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.config import IcpConfig


def backproject(depth_mm: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(H, W) uint16 depth in mm -> (H, W, 3) float32 points in meters."""
    h, w = depth_mm.shape
    z = depth_mm.astype(jnp.float32) / 1000.0
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = (u - K[0, 2]) / K[0, 0] * z
    y = (v - K[1, 2]) / K[1, 1] * z
    return jnp.stack([x, y, z], axis=-1)


def _shift2d(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift the leading two (H, W) axes by (dy, dx) with ZERO fill.

    result[y, x] = a[y - dy, x - dx], zeros outside the frame.  Unlike
    ``jnp.roll`` this never wraps opposite image borders into each other,
    so border pixels see missing neighbors as invalid (zero) samples.
    """
    h, w = a.shape[0], a.shape[1]
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))) + (
        ((0, 0),) * (a.ndim - 2)
    )
    ap = jnp.pad(a, pad)
    return ap[max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w]


def scene_normals(points: jnp.ndarray, edge_thresh: float = 0.02) -> jnp.ndarray:
    """Per-pixel normals from the smoothed point map.

    Replaces Open3D EstimateNormals (cpp:127).  Two measures against
    millimeter depth quantization and silhouettes (both of which otherwise
    produce unit-length garbage normals that bias the ICP solve):

    - a validity-masked 3x3 box smoothing of the point map followed by a
      +-2 px central difference (widens the derivative baseline well past
      the 1 mm uint16 quantization step);
    - zero normals at depth discontinuities (any +-2 px neighbor jumping
      more than ``edge_thresh`` meters in z).

    Normals are unit length, oriented toward the camera (n_z < 0), and
    zero where invalid.
    """
    z = points[..., 2:3]
    valid0 = (z > 0).astype(points.dtype)

    # Masked 3x3 box filter.
    pv = points * valid0
    num = jnp.zeros_like(points)
    den = jnp.zeros_like(valid0)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            num = num + _shift2d(pv, dy, dx)
            den = den + _shift2d(valid0, dy, dx)
    sm = num / jnp.maximum(den, 1.0)
    sm = jnp.where(valid0 > 0, sm, 0.0)

    r = 2
    xp = _shift2d(sm, 0, -r)
    xm = _shift2d(sm, 0, r)
    yp = _shift2d(sm, -r, 0)
    ym = _shift2d(sm, r, 0)
    n = jnp.cross(xp - xm, yp - ym)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    flip = jnp.sign(-n[..., 2:3] + 1e-12)
    n = n * flip

    neigh_ok = (
        (jnp.abs(xp[..., 2:3] - z) < edge_thresh)
        & (jnp.abs(xm[..., 2:3] - z) < edge_thresh)
        & (jnp.abs(yp[..., 2:3] - z) < edge_thresh)
        & (jnp.abs(ym[..., 2:3] - z) < edge_thresh)
        & (xp[..., 2:3] > 0)
        & (xm[..., 2:3] > 0)
        & (yp[..., 2:3] > 0)
        & (ym[..., 2:3] > 0)
    )
    valid = (z > 0) & (norm > 1e-9) & neigh_ok
    return jnp.where(valid, n, 0.0)


def scene_chroma(rgb: jnp.ndarray, blur: int = 2):
    """(H, W, 3) uint8 -> lighting-normalized chroma (H, W, 2) float32
    (r and g shares) plus its pixel-space central-difference gradients
    (each (H, W, 2)).  Used by the colored-ICP term.

    The chroma is box-blurred (+-``blur`` px) before differentiation:
    raw +-1 px gradients have no basin when the initial pose projects a
    few pixels off, and the color term then acts as noise on the solve.
    """
    f = rgb.astype(jnp.float32)
    bright = jnp.sum(f, axis=-1, keepdims=True)
    valid = (bright > 40.0).astype(jnp.float32)
    c = f[..., :2] / jnp.maximum(bright, 1e-6)
    if blur > 0:
        # Validity-masked blur: dark pixels (background, shadow) carry no
        # chroma and must not bleed (0, 0) into object borders.
        num = jnp.zeros_like(c)
        den = jnp.zeros_like(valid)
        for dy in range(-blur, blur + 1):
            for dx in range(-blur, blur + 1):
                num = num + _shift2d(c * valid, dy, dx)
                den = den + _shift2d(valid, dy, dx)
        c = num / jnp.maximum(den, 1.0)
    c = jnp.where(valid > 0, c, 0.0)
    du = (_shift2d(c, 0, -1) - _shift2d(c, 0, 1)) * 0.5
    dv = (_shift2d(c, -1, 0) - _shift2d(c, 1, 0)) * 0.5
    # Zero gradients where any sample in the stencil was invalid: a
    # difference against a hole is not a real chroma gradient.  Zero-fill
    # shifts also make the 1-px image border invalid (no wrap-around).
    ok = (
        valid
        * _shift2d(valid, 0, 1) * _shift2d(valid, 0, -1)
        * _shift2d(valid, 1, 0) * _shift2d(valid, -1, 0)
    )
    return c, du * ok, dv * ok


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (3,) axis-angle -> (3, 3) rotation."""
    theta = jnp.linalg.norm(w) + 1e-12
    k = w / theta
    kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    return (
        jnp.eye(3)
        + jnp.sin(theta) * kx
        + (1.0 - jnp.cos(theta)) * (kx @ kx)
    )


def sample_model_points(
    model_depth_mm: np.ndarray,
    model_K: np.ndarray,
    num_points: int,
    return_pixels: bool = False,
):
    """Host-side fixed-size sample of the rendered model cloud (meters).

    Returns (num_points, 3) points and (num_points,) validity mask (padded
    slots invalid).  Deterministic stride sampling over valid pixels.
    With ``return_pixels`` also returns the (ys, xs) pixel coordinates of
    the valid samples (e.g. to pick up their rendered colors).
    """
    ys, xs = np.nonzero(model_depth_mm > 0)
    n = len(ys)
    if n == 0:
        empty = (np.zeros((num_points, 3), np.float32), np.zeros(num_points, bool))
        return empty + ((ys, xs),) if return_pixels else empty
    if n > num_points:
        sel = np.linspace(0, n - 1, num_points).astype(np.int64)
        ys, xs = ys[sel], xs[sel]
    z = model_depth_mm[ys, xs].astype(np.float64) / 1000.0
    x = (xs - model_K[0, 2]) / model_K[0, 0] * z
    y = (ys - model_K[1, 2]) / model_K[1, 1] * z
    pts = np.stack([x, y, z], 1).astype(np.float32)
    valid = np.ones(len(pts), bool)
    if len(pts) < num_points:
        pad = num_points - len(pts)
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    if return_pixels:
        return pts, valid, (ys, xs)
    return pts, valid


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "bilinear_iters", "coarse_points"),
)
def icp_point_to_plane(
    model_pts: jnp.ndarray,
    model_valid: jnp.ndarray,
    scene_pts: jnp.ndarray,
    scene_nrm: jnp.ndarray,
    scene_K: jnp.ndarray,
    init_T: jnp.ndarray,
    corr_dist: float = 0.01,
    max_iters: int = 20,
    coarse_gate_mult: float = 3.0,
    model_chroma: Optional[jnp.ndarray] = None,   # (N, 2)
    chroma_maps: Optional[tuple] = None,          # (c, du, dv) from scene_chroma
    color_weight: float = 0.3,
    chroma_scale: float = 0.05,
    point_weight: float = 0.2,
    lm_damping: float = 1e-3,
    bilinear_iters: int = 8,
    coarse_points: int = 256,
):
    """Projective point-to-plane ICP for one candidate.

    Args:
      model_pts: (N, 3) model points (meters, render-camera frame).
      model_valid: (N,) bool.
      scene_pts: (H, W, 3) scene point map (meters).
      scene_nrm: (H, W, 3) scene normal map.
      scene_K: (3, 3) scene intrinsics.
      init_T: (4, 4) initial model->scene transform.
      corr_dist: final correspondence gate in meters (reference threshold,
        cpp:31).
      max_iters: Gauss-Newton iterations.
      coarse_gate_mult: the gate starts at ``coarse_gate_mult * corr_dist``
        and decays geometrically to ``corr_dist`` by the last iteration —
        a coarse->fine re-gating schedule (wide basin early, tight
        association late; the reference's fixed 0.01 m gate relies on
        Open3D's NN search having a wide basin already).
      model_chroma / chroma_maps: enable the COLORED-ICP term (Park-style):
        residual = chroma_scale * (scene chroma at the projection − model
        point chroma), with the Jacobian through the projection's pixel
        gradients.  Geometry-only ICP has a rotational null space on
        near-symmetric shapes (a prism sliding between facet alignments);
        the texture term pins it.  The reference's Open3D point-to-plane
        has no color.

    Returns (T, fitness, inlier_rmse).
    """
    h, w = scene_pts.shape[:2]
    valid_w = (scene_pts[..., 2] > 0).astype(jnp.float32)
    # ONE packed (H, W, 7) map (points | normals | valid): each
    # association tap is a single row gather instead of three.  The
    # scene-map gathers are the ICP hot loop on TPU — measured 3.7 s of
    # a 3.8 s SYNTH-scale dispatch (2304 cands x 512 pts x 20 iters x
    # 8 gathers) before packing + the nearest/bilinear split below.
    packed = jnp.concatenate(
        [scene_pts, scene_nrm, valid_w[..., None]], axis=-1
    )
    use_color = model_chroma is not None and chroma_maps is not None
    if use_color:
        chr_c, chr_du, chr_dv = chroma_maps
        chr_packed = jnp.concatenate([chr_c, chr_du, chr_dv], axis=-1)

    def _project(p):
        u = p[:, 0] / p[:, 2] * scene_K[0, 0] + scene_K[0, 2]
        v = p[:, 1] / p[:, 2] * scene_K[1, 1] + scene_K[1, 2]
        inb = (
            (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
            & (p[:, 2] > 1e-6)
        )
        return u, v, inb

    def lookup_bilinear(p):
        """Validity-weighted bilinear scene point/normal at the projection.

        Bilinear interpolation of the point map (weights zeroed at invalid
        pixels) removes the half-pixel bias of nearest-pixel association —
        sub-millimeter at typical working distances but a visible floor on
        converged rmse.  Normals re-normalize after blending.
        """
        u, v, inb = _project(p)
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
        u1 = jnp.minimum(u0 + 1, w - 1)
        v1 = jnp.minimum(v0 + 1, h - 1)
        fu = jnp.clip(u - u0, 0.0, 1.0)[:, None]
        fv = jnp.clip(v - v0, 0.0, 1.0)[:, None]
        qs, ns, ws = 0.0, 0.0, 0.0
        for vi, ui, wgt in (
            (v0, u0, (1 - fu) * (1 - fv)),
            (v0, u1, fu * (1 - fv)),
            (v1, u0, (1 - fu) * fv),
            (v1, u1, fu * fv),
        ):
            tap = packed[vi, ui]
            wv = wgt * tap[:, 6:7]
            qs = qs + wv * tap[:, :3]
            ns = ns + wv * tap[:, 3:6]
            ws = ws + wv
        q = qs / jnp.maximum(ws, 1e-9)
        nn = jnp.linalg.norm(ns, axis=-1, keepdims=True)
        n = ns / jnp.maximum(nn, 1e-9)
        # Keep the normal gate's semantics: zero normal when the blended
        # neighbors carried no/conflicting normals.
        n = jnp.where(nn > 1e-6, n, 0.0)
        ok = inb & (ws[:, 0] > 0.5)
        q = jnp.where(ok[:, None], q, 0.0)
        return q, n, ok

    def lookup_nearest(p):
        """Nearest-pixel association: one gather per point.  Used for the
        early, wide-gate iterations where the half-pixel bilinear
        refinement is far below the association error anyway; the final
        ``bilinear_iters`` iterations polish with lookup_bilinear."""
        u, v, inb = _project(p)
        ur = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        vr = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        tap = packed[vr, ur]
        ok = inb & (tap[:, 6] > 0.5)
        q = jnp.where(ok[:, None], tap[:, :3], 0.0)
        n = jnp.where(ok[:, None], tap[:, 3:6], 0.0)
        return q, n, ok

    def make_step(lookup, pts, pvalid, pchroma):
      def step(i, T):
        # Geometric gate decay: mult^(1 - i/(iters-1)) * corr_dist.
        frac = i.astype(jnp.float32) / jnp.maximum(max_iters - 1, 1)
        gate = corr_dist * coarse_gate_mult ** (1.0 - frac)
        p = pts @ T[:3, :3].T + T[:3, 3]
        q, n, inb = lookup(p)
        d = p - q
        r = jnp.sum(d * n, axis=-1)
        good = (
            pvalid
            & inb
            & (q[:, 2] > 0)
            & (jnp.linalg.norm(d, axis=-1) < gate)
            & (jnp.linalg.norm(n, axis=-1) > 0.5)
        )
        wgt = good.astype(jnp.float32)
        nw = jnp.maximum(jnp.sum(wgt), 1.0)
        # Rotate about the inlier centroid, not the camera origin: for a
        # compact object far from the camera, camera-frame (omega, nu) are
        # near-degenerate (nu ~ -omega x center) and the unregularized
        # Gauss-Newton step explodes along that null space.  The centroid
        # frame decouples rotation from translation.
        c = jnp.einsum("ni,n->i", p, wgt) / nw
        pc = p - c
        a = jnp.concatenate([jnp.cross(pc, n), n], axis=-1)  # (N, 6)
        H = jnp.einsum("ni,nj,n->ij", a, a, wgt)
        g = jnp.einsum("ni,n,n->i", a, -r, wgt)
        # Blend a point-to-point term: projective point-to-plane alone has
        # an in-plane null space per surface patch, and quantization-biased
        # normals make the solution SLIDE along a dominant plane until the
        # footprint leaves the object (observed: fitness 0.998 -> 0.04 on a
        # box scene).  The point-to-point Jacobian J = [-[pc]x | I] pins
        # in-plane translation with a restoring force toward the associated
        # points.  Open3D's NN correspondences create the same restoring
        # force implicitly; projective association needs it explicitly.
        # Sensitivity (tests/test_geometry.py::test_icp_hyperparameter
        # _sensitivity): convergence is flat over point_weight in
        # [0.05, 0.5] and lm_damping in [1e-4, 1e-2] on the standard
        # perturbed-box scenario — the defaults sit on a plateau, not a
        # cliff.
        w_pt = point_weight
        px_ = jnp.zeros((pc.shape[0], 3, 3))
        px_ = px_.at[:, 0, 1].set(-pc[:, 2]).at[:, 0, 2].set(pc[:, 1])
        px_ = px_.at[:, 1, 0].set(pc[:, 2]).at[:, 1, 2].set(-pc[:, 0])
        px_ = px_.at[:, 2, 0].set(-pc[:, 1]).at[:, 2, 1].set(pc[:, 0])
        Jpt = jnp.concatenate([-px_, jnp.broadcast_to(jnp.eye(3), px_.shape)], axis=2)
        H = H + w_pt * jnp.einsum("nij,nik,n->jk", Jpt, Jpt, wgt)
        g = g + w_pt * jnp.einsum("nij,ni,n->j", Jpt, -d, wgt)
        if use_color:
            # Colored-ICP term: chroma residual at the projection, chained
            # through the pinhole Jacobian.  All quantities scaled by
            # chroma_scale so the term competes with meter-scale geometry.
            # Annealed robustness (deterministic-annealing style): the
            # Geman-McClure sigma starts wide (large mismatches may be the
            # signal, e.g. a facet-misaligned start) and tightens to the
            # polish regime by the last iteration, mirroring the geometric
            # gate schedule.
            w_col = color_weight * frac  # geometry owns the early phase
            sigma = 0.5 * (0.2 ** frac)  # 0.5 -> 0.1 chroma units
            u = p[:, 0] / jnp.maximum(p[:, 2], 1e-6) * scene_K[0, 0] + scene_K[0, 2]
            v = p[:, 1] / jnp.maximum(p[:, 2], 1e-6) * scene_K[1, 1] + scene_K[1, 2]
            ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
            vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
            ct = chr_packed[vi, ui]                # one gather: c|du|dv
            rc = (ct[:, 0:2] - pchroma) * chroma_scale              # (N, 2)
            gu = ct[:, 2:4] * chroma_scale                          # (N, 2)
            gv = ct[:, 4:6] * chroma_scale
            pz = jnp.maximum(p[:, 2], 1e-6)
            dudp = jnp.stack(
                [scene_K[0, 0] / pz, jnp.zeros_like(pz),
                 -scene_K[0, 0] * p[:, 0] / (pz * pz)], axis=1)     # (N, 3)
            dvdp = jnp.stack(
                [jnp.zeros_like(pz), scene_K[1, 1] / pz,
                 -scene_K[1, 1] * p[:, 1] / (pz * pz)], axis=1)
            # dC/dp (N, 2, 3), then through dp/dxi = Jpt (N, 3, 6).
            dcdp = gu[:, :, None] * dudp[:, None, :] + gv[:, :, None] * dvdp[:, None, :]
            Jc = jnp.einsum("ncp,npj->ncj", dcdp, Jpt)              # (N, 2, 6)
            # Only points with a valid, bright association contribute
            # (zero-chroma pixels are background/shadow holes), with a
            # Geman-McClure robust weight on the chroma mismatch: a large
            # residual usually means the association landed on a different
            # face/object, and its linearized pull degrades converged
            # fitness (measured 0.78 -> 0.53 unweighted); the smooth
            # falloff keeps the useful pull of the blur-band gradients.
            cbright = jnp.sum(ct[:, 0:2], axis=-1) > 1e-6
            rmag = jnp.sum(jnp.abs(rc), axis=-1) / (sigma * chroma_scale)
            cw = wgt * cbright.astype(jnp.float32) / (1.0 + rmag * rmag)
            H = H + w_col * jnp.einsum("ncj,nck,n->jk", Jc, Jc, cw)
            g = g + w_col * jnp.einsum("ncj,nc,n->j", Jc, -rc, cw)
        # Levenberg-Marquardt damping keeps steps bounded along any
        # remaining symmetry null space (e.g. a sphere's rotations).
        H = H + lm_damping * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        xi = jnp.linalg.solve(H, g)
        dR = _so3_exp(xi[:3])
        # x -> dR (x - c) + c + nu
        dt = c - dR @ c + xi[3:]
        dT = jnp.eye(4).at[:3, :3].set(dR).at[:3, 3].set(dt)
        return jnp.where(jnp.sum(wgt) >= 6, dT @ T, T)

      return step

    n_bi = max(0, min(int(bilinear_iters), max_iters))
    n_near = max_iters - n_bi
    # Coarse phase: nearest-tap association on a strided ~``coarse_points``
    # subset of the cloud (uniform: sample_model_points orders points
    # row-major over the render, so a stride keeps full coverage), then
    # polish with the full cloud + bilinear taps.  Association gathers
    # are the hot loop; the coarse phase exists to pull the pose into the
    # tight-gate basin, for which a quarter of the points is plenty
    # (validated by the geometry convergence tests + SYNTH recall).
    stride = max(1, model_pts.shape[0] // max(coarse_points, 8))
    T = jax.lax.fori_loop(
        0, n_near,
        make_step(
            lookup_nearest,
            model_pts[::stride],
            model_valid[::stride],
            model_chroma[::stride] if use_color else None,
        ),
        init_T,
    )
    T = jax.lax.fori_loop(
        n_near, max_iters,
        make_step(lookup_bilinear, model_pts, model_valid, model_chroma),
        T,
    )

    # Final fitness / rmse (reference residual = fitness, cpp:148).
    p = model_pts @ T[:3, :3].T + T[:3, 3]
    q, n, inb = lookup_bilinear(p)
    d = p - q
    dist = jnp.linalg.norm(d, axis=-1)
    good = model_valid & inb & (q[:, 2] > 0) & (dist < corr_dist)
    denom = jnp.maximum(jnp.sum(model_valid), 1)
    fitness = jnp.sum(good) / denom
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(good, dist**2, 0.0)) / jnp.maximum(jnp.sum(good), 1)
    )
    return T, fitness, rmse


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "bilinear_iters", "coarse_points"),
)
def icp_batch(
    model_pts: jnp.ndarray,      # (K, N, 3)
    model_valid: jnp.ndarray,    # (K, N)
    scene_pts: jnp.ndarray,      # (H, W, 3) shared scene
    scene_nrm: jnp.ndarray,
    scene_K: jnp.ndarray,
    init_T: jnp.ndarray,         # (K, 4, 4)
    corr_dist: float = 0.01,
    max_iters: int = 20,
    coarse_gate_mult: float = 3.0,
    model_chroma=None,           # (K, N, 2) optional
    chroma_maps=None,            # shared scene (c, du, dv)
    color_weight: float = 0.3,
    chroma_scale: float = 0.05,
    point_weight: float = 0.2,
    lm_damping: float = 1e-3,
    bilinear_iters: int = 8,
    coarse_points: int = 256,
):
    """All K candidates refined in parallel (reference refines top-K matches
    serially, linemod_and_levelup_test.py:354-376)."""
    if model_chroma is None:
        fn = lambda mp, mv, t0: icp_point_to_plane(
            mp, mv, scene_pts, scene_nrm, scene_K, t0, corr_dist, max_iters,
            coarse_gate_mult,
            point_weight=point_weight, lm_damping=lm_damping,
            bilinear_iters=bilinear_iters, coarse_points=coarse_points,
        )
        return jax.vmap(fn)(model_pts, model_valid, init_T)
    fn = lambda mp, mv, t0, mc: icp_point_to_plane(
        mp, mv, scene_pts, scene_nrm, scene_K, t0, corr_dist, max_iters,
        coarse_gate_mult, mc, chroma_maps, color_weight, chroma_scale,
        point_weight=point_weight, lm_damping=lm_damping,
        bilinear_iters=bilinear_iters, coarse_points=coarse_points,
    )
    return jax.vmap(fn, in_axes=(0, 0, 0, 0))(
        model_pts, model_valid, init_T, model_chroma
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tau_mm", "cell", "color_tau", "color_weight", "color_zscore"
    ),
)
def verify_poses(
    model_pts_mm: jnp.ndarray,   # (N, 3) surface points, model frame, mm
    Rs: jnp.ndarray,             # (K, 3, 3)
    ts_mm: jnp.ndarray,          # (K, 3) mm
    depth_mm: jnp.ndarray,       # (H, W) uint16 scene depth
    K: jnp.ndarray,              # (3, 3)
    tau_mm: float = 15.0,
    cell: int = 4,
    model_colors: Optional[jnp.ndarray] = None,  # (N, 3) uint8/float
    rgb: Optional[jnp.ndarray] = None,           # (H, W, 3) uint8
    color_tau: float = 0.22,
    color_weight: float = 0.5,
    color_zscore: bool = False,
):
    """Depth(+color)-consistency verification of K poses in one dispatch.

    Approximates render-and-compare: project a dense sample of model
    surface points at each pose, resolve self-occlusion with a coarse
    per-cell z-buffer (scatter-min over ``cell``-px bins), and score the
    fraction of front points whose scene depth agrees within ``tau_mm``.
    ~100x cheaper than rasterizing the mesh per candidate and jit/vmap
    friendly, so all candidates verify together.

    When ``model_colors`` and ``rgb`` are given, the score is multiplied
    by (1 - w + w * color_frac) where color_frac is the fraction of
    depth-agreeing points whose scene chromaticity (lighting-normalized
    r/g/b shares, L1) matches the model point's within ``color_tau``.
    Depth alone cannot separate near-symmetric orientation locks (a
    prism rotated by a facet has an almost identical depth image); the
    texture does.

    Returns (K,) float32 scores in [0, 1].
    """
    n = model_pts_mm.shape[0]
    k_n = Rs.shape[0]
    pts_b = jnp.broadcast_to(model_pts_mm, (k_n, n, 3))
    valid_b = jnp.ones((k_n, n), bool)
    colors_b = (
        jnp.broadcast_to(model_colors, (k_n, n, 3))
        if model_colors is not None
        else None
    )
    return verify_poses_multi(
        pts_b, valid_b, Rs, ts_mm, depth_mm, K, tau_mm, cell,
        colors_b, rgb, color_tau, color_weight,
        color_zscore=color_zscore,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tau_mm", "cell", "color_tau", "color_weight", "color_zscore"
    ),
)
def verify_poses_multi(
    model_pts_mm: jnp.ndarray,   # (K, N, 3) PER-CANDIDATE surface points, mm
    model_valid: jnp.ndarray,    # (K, N) bool — False marks pad rows
    Rs: jnp.ndarray,             # (K, 3, 3)
    ts_mm: jnp.ndarray,          # (K, 3) mm
    depth_mm: jnp.ndarray,       # (H, W) uint16 scene depth
    K: jnp.ndarray,              # (3, 3)
    tau_mm: float = 15.0,
    cell: int = 4,
    model_colors: Optional[jnp.ndarray] = None,  # (K, N, 3) uint8/float
    rgb: Optional[jnp.ndarray] = None,           # (H, W, 3) uint8
    color_tau: float = 0.22,
    color_weight: float = 0.5,
    color_zscore: bool = False,
):
    """verify_poses generalized to a DIFFERENT point set per candidate
    (padded + masked), so candidates of different classes verify together
    in one dispatch (the fused multi-class pipeline, models/pipeline.py).

    ``color_zscore``: per-pixel chroma informativeness weighting.  Each
    point's color vote is weighted by the z-score of the MODEL's chroma
    at that point against the model's own chroma distribution
    (w = 0.25 + clip(|mcn - mean| / std, 0, 4)).  Texture pixels — the
    only evidence separating geometric twins (box vs texbox, or a
    textured box vs its own 180-deg z-flip) — dominate the fraction,
    while uniform-color pixels, which match ANY uniform hypothesis, stop
    diluting the margin.  For a textureless model every deviation is ~0,
    the weights collapse to the constant floor, and the fraction reduces
    to the unweighted one, so the flag is safe to enable globally.

    Returns (K,) float32 scores in [0, 1].
    """
    h, w = depth_mm.shape
    gh, gw = h // cell, w // cell
    scene = depth_mm.astype(jnp.float32)
    use_color = model_colors is not None and rgb is not None
    if use_color:
        mc_all = model_colors.astype(jnp.float32)
        mcn_all = mc_all / jnp.maximum(
            jnp.sum(mc_all, axis=-1, keepdims=True), 1e-6
        )
        rgb_f = rgb.astype(jnp.float32)
    else:
        mcn_all = jnp.zeros_like(model_pts_mm)

    def one(pts, pvalid, R, t, mcn):
        p = pts @ R.T + t
        z = p[:, 2]
        u = p[:, 0] / jnp.maximum(z, 1e-6) * K[0, 0] + K[0, 2]
        v = p[:, 1] / jnp.maximum(z, 1e-6) * K[1, 1] + K[1, 2]
        inb = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 10.0) & pvalid
        # Integer coords are pixel CENTERS in this projection convention
        # (backproject uses (x - cx)/f at integer x), so the nearest
        # pixel is round, not floor — the floor's half-pixel bias pushed
        # ~12% of silhouette-adjacent samples outside the footprint on a
        # ~78 px object.
        vr = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        ur = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        gi = jnp.where(inb, (vr // cell) * gw + (ur // cell), gh * gw)
        zbuf = jnp.full((gh * gw + 1,), jnp.inf, jnp.float32)
        zbuf = zbuf.at[gi].min(jnp.where(inb, z, jnp.inf))
        front = inb & (z <= zbuf[gi] + 2.0 * tau_mm)
        vi = vr
        ui = ur
        ds = scene[vi, ui]
        # SIXD-style visibility masking (pysixd/visibility.py semantics):
        # a model point whose MEASURED scene depth is clearly CLOSER
        # (ds < z - tau) is occluded by something in front — consistent
        # with a correct pose under occlusion, so it leaves the
        # denominator instead of counting against.  Depth holes (ds == 0)
        # STAY in the denominator: excluding them rewards hallucinating
        # the object over evidence-free background (measured: the mini-
        # SIXD tool-chain recall drops 1.0 -> 0.5 when holes are
        # excluded, because partially-overlapping wrong poses inflate).
        # Defense against "hide the pose behind the scene": an estimate
        # only keeps a nonzero score while at least min_visib of its
        # front points are not occluded (the SIXD protocol's own
        # visib_fract >= 0.1 target gate), so a pose pushed fully behind
        # the surface scores 0, not 1.
        min_visib = 0.1
        measured = front & (ds > 0)
        occluded = measured & (ds - z <= -tau_mm)
        denom_pts = front & ~occluded
        agree = measured & (jnp.abs(ds - z) < tau_mm)
        nfront = jnp.maximum(jnp.sum(front), 1)
        nvis = jnp.sum(denom_pts)
        vis_frac = nvis / nfront
        score = jnp.where(
            vis_frac >= min_visib,
            jnp.sum(agree) / jnp.maximum(nvis, 1),
            0.0,
        )
        if use_color:
            sc = rgb_f[vi, ui]
            bright = jnp.sum(sc, axis=-1)
            scn = sc / jnp.maximum(bright[:, None], 1e-6)
            cdist = jnp.sum(jnp.abs(scn - mcn), axis=-1)
            considered = agree & (bright > 40.0)
            c_ok = considered & (cdist < color_tau)
            if color_zscore:
                nm = jnp.maximum(jnp.sum(pvalid), 1)
                mu = jnp.sum(
                    jnp.where(pvalid[:, None], mcn, 0.0), axis=0
                ) / nm
                dev = jnp.sum(jnp.abs(mcn - mu), axis=-1)
                sd = jnp.sqrt(
                    jnp.sum(jnp.where(pvalid, dev * dev, 0.0)) / nm
                )
                wgt = 0.25 + jnp.clip(dev / (sd + 1e-6), 0.0, 4.0)
                cfrac = jnp.sum(wgt * c_ok) / jnp.maximum(
                    jnp.sum(wgt * considered), 1e-6
                )
            else:
                cfrac = jnp.sum(c_ok) / jnp.maximum(jnp.sum(considered), 1)
            score = score * (1.0 - color_weight + color_weight * cfrac)
        return score

    return jax.vmap(one)(model_pts_mm, model_valid, Rs, ts_mm, mcn_all)


class PoseRefiner:
    """Drop-in equivalent of the reference ``poseRefine`` pybind class
    (linemodLevelup/pybind11.cpp:29-34): process(...), getR, getT,
    getResidual."""

    def __init__(self, cfg: Optional[IcpConfig] = None):
        self.cfg = cfg or IcpConfig()
        self.R_refined: Optional[np.ndarray] = None
        self.t_refined: Optional[np.ndarray] = None
        self.residual: float = -1.0

    def process(
        self,
        scene_depth: np.ndarray,
        model_depth: np.ndarray,
        scene_K: np.ndarray,
        model_K: np.ndarray,
        model_R: np.ndarray,
        model_t: np.ndarray,
        detect_x: int,
        detect_y: int,
    ) -> None:
        """Refine one detection.  Mirrors poseRefine::process (cpp:27-160):
        the model cloud comes from the render at the *render* position; the
        initial guess shifts it to the detected (x, y) via the centroid
        offset between the model cloud and the scene crop."""
        cfg = self.cfg
        h, w = scene_depth.shape
        ys, xs = np.nonzero(model_depth > 0)
        if len(ys) == 0:
            self.residual = -1.0
            return
        bx0, bx1 = xs.min() - cfg.dilate_px, xs.max() + cfg.dilate_px + 1
        by0, by1 = ys.min() - cfg.dilate_px, ys.max() + cfg.dilate_px + 1
        bw, bh = bx1 - bx0, by1 - by0
        if detect_x + bw >= w or detect_y + bh >= h:  # cpp:52-55
            self.residual = -1.0
            return

        model_pts, model_valid = sample_model_points(
            model_depth, model_K, cfg.num_model_points
        )

        # Initial guess: centroid(scene crop near anchor depth) - centroid(model)
        # (cpp:60-104).  The scene crop is the model bbox translated to the
        # detected position.
        anchor = model_depth[model_depth.shape[0] // 2, model_depth.shape[1] // 2] / 1000.0
        crop = np.zeros((bh, bw), np.float64)
        sy0 = max(detect_y - cfg.dilate_px, 0)
        sx0 = max(detect_x - cfg.dilate_px, 0)
        sy1 = min(sy0 + bh, h)
        sx1 = min(sx0 + bw, w)
        crop[: sy1 - sy0, : sx1 - sx0] = scene_depth[sy0:sy1, sx0:sx1] / 1000.0
        mmask = np.zeros((bh, bw), bool)
        myx = (ys - by0, xs - bx0)
        mmask[myx] = True
        sel = mmask & (np.abs(crop - anchor) < cfg.anchor_window) & (crop > 0)
        if sel.sum() < 10:
            self.residual = -1.0
            return
        cy, cx = np.nonzero(sel)
        z = crop[cy, cx]
        px = ((cx + sx0) - scene_K[0, 2]) / scene_K[0, 0] * z
        py = ((cy + sy0) - scene_K[1, 2]) / scene_K[1, 1] * z
        center_scene = np.stack([px, py, z], 1).mean(0)
        center_model = model_pts[model_valid].mean(0)

        init_T = np.eye(4, dtype=np.float32)
        init_T[:3, 3] = center_scene - center_model

        sp = backproject(jnp.asarray(scene_depth), jnp.asarray(scene_K.astype(np.float32)))
        sn = scene_normals(sp)
        T, fitness, rmse = icp_point_to_plane(
            jnp.asarray(model_pts),
            jnp.asarray(model_valid),
            sp,
            sn,
            jnp.asarray(scene_K.astype(np.float32)),
            jnp.asarray(init_T),
            cfg.corr_dist,
            cfg.max_iters,
            cfg.coarse_gate_mult,
        )
        T = np.asarray(T, np.float64)

        # Compose with the template pose (cpp:34-41, 146-154): template t_z is
        # in mm -> meters; output t back in mm.
        init_base = np.eye(4)
        init_base[:3, :3] = model_R
        init_base[:3, 3] = np.asarray(model_t).flatten()
        init_base[2, 3] /= 1000.0
        result = T @ init_base
        self.R_refined = result[:3, :3]
        self.t_refined = result[:3, 3:4] * 1000.0
        self.residual = float(fitness)

    def getR(self) -> np.ndarray:
        return self.R_refined

    def getT(self) -> np.ndarray:
        return self.t_refined

    def getResidual(self) -> float:
        return self.residual


def refine_poses(
    scene_depth: np.ndarray,
    scene_K: np.ndarray,
    model_depths: np.ndarray,
    model_K: np.ndarray,
    init_Ts: np.ndarray,
    cfg: Optional[IcpConfig] = None,
):
    """Batched refinement of K candidates against one scene.

    Args:
      scene_depth: (H, W) uint16 mm.
      model_depths: (K, Hm, Wm) rendered depths, one per candidate.
      init_Ts: (K, 4, 4) initial model->scene transforms (meters).

    Returns (K, 4, 4) refined transforms, (K,) fitness, (K,) rmse.
    """
    cfg = cfg or IcpConfig()
    k = model_depths.shape[0]
    pts = np.zeros((k, cfg.num_model_points, 3), np.float32)
    val = np.zeros((k, cfg.num_model_points), bool)
    for i in range(k):
        pts[i], val[i] = sample_model_points(
            model_depths[i], model_K, cfg.num_model_points
        )
    sp = backproject(jnp.asarray(scene_depth), jnp.asarray(scene_K.astype(np.float32)))
    sn = scene_normals(sp)
    return icp_batch(
        jnp.asarray(pts),
        jnp.asarray(val),
        sp,
        sn,
        jnp.asarray(scene_K.astype(np.float32)),
        jnp.asarray(init_Ts.astype(np.float32)),
        cfg.corr_dist,
        cfg.max_iters,
        cfg.coarse_gate_mult,
    )
