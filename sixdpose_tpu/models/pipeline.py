"""Fused detect -> refine -> verify: ONE compiled program per frame.

SURVEY.md §6 names detect->refine->score as one compiled path; round 1
fused only the match.  The reference's serving loop (linemod_ros/
detect.py:94-150, linemod_and_levelup_test.py:324-376) interleaves host
work between match and every per-candidate poseRefine: render model
depth, crop, build clouds, run Open3D ICP serially.  Here everything the
refine stage needs is precomputed per template at TRAIN time (the
``icp_points`` cloud stored in the template info, models/train.py) and
uploaded once per class as device arrays, so a frame is:

    quantize -> spread -> response -> dense similarity -> top-K
    -> pyramid refine -> NMS -> candidate seeding (window median depth)
    -> batched projective point-to-plane ICP -> pose verification
    -> pose composition

in a single XLA dispatch with a single host readback of fixed-size
result arrays.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.config import DetectorConfig, IcpConfig
from sixdpose_tpu.models.detector import Detector, detect_frame_core
from sixdpose_tpu.models.refine import (
    backproject,
    icp_batch,
    scene_chroma,
    scene_normals,
    verify_poses,
    verify_poses_multi,
)


@dataclasses.dataclass(frozen=True)
class RefineBank:
    """Per-class device arrays for the fused refine stage.

    clouds: (N, P, 3) float32 template clouds (meters, render frame).
    valids: (N, P) bool.
    chroma: (N, P, 2) float32 lighting-normalized chroma or None.
    src_c:  (N, 3) cloud centroids.
    bbox_wh:(N, 2) int32 render bbox (w, h) at level 0.
    base_T: (N, 4, 4) float32 template pose (cam_R_w2c | cam_t_w2c with
      the reference's z mm->m quirk, linemodLevelup.cpp:37).
    win:    static (win_h, win_w) median window covering the largest bbox.
    """

    clouds: jnp.ndarray
    valids: jnp.ndarray
    chroma: Optional[jnp.ndarray]
    src_c: jnp.ndarray
    bbox_wh: jnp.ndarray
    base_T: jnp.ndarray
    win: Tuple[int, int]


def build_refine_bank(
    detector: Detector, class_id: str, num_points: int = 512
) -> Optional[RefineBank]:
    """Stack the train-time ``icp_points`` clouds of a class into device
    arrays.  Returns None when any template lacks them (banks imported
    from the reference store features only)."""
    infos = detector.bank.infos.get(class_id, [])
    n = detector.bank.num_templates(class_id)
    if n == 0 or len(infos) < n:
        return None
    clouds = np.zeros((n, num_points, 3), np.float32)
    valids = np.zeros((n, num_points), bool)
    chroma = np.zeros((n, num_points, 2), np.float32)
    has_color = True
    src_c = np.zeros((n, 3), np.float32)
    bbox_wh = np.zeros((n, 2), np.int32)
    base_T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        info = infos[i]
        if "icp_points" not in info or "cam_R_w2c" not in info:
            return None
        pts = np.asarray(info["icp_points"], np.float32)
        if len(pts) > num_points:
            sel = np.linspace(0, len(pts) - 1, num_points).astype(np.int64)
            pts_s = pts[sel]
        else:
            sel = None
            pts_s = pts
        clouds[i, : len(pts_s)] = pts_s
        valids[i, : len(pts_s)] = True
        src_c[i] = pts.mean(0)
        if "icp_colors" in info:
            col = np.asarray(info["icp_colors"], np.float32)
            col = col[sel] if sel is not None else col
            chroma[i, : len(pts_s)] = col[:, :2] / np.maximum(
                col.sum(-1, keepdims=True), 1e-6
            )
        else:
            has_color = False
        bx0, by0, bx1, by1 = np.asarray(info["render_bbox"])
        bbox_wh[i] = (int(bx1 - bx0), int(by1 - by0))
        base_T[i, :3, :3] = np.asarray(info["cam_R_w2c"], np.float32)
        base_T[i, :3, 3] = np.asarray(info["cam_t_w2c"], np.float32).ravel()
        base_T[i, 2, 3] /= 1000.0  # reference quirk: z mm -> m (cpp:37)
    win_w = int(min(-(-(bbox_wh[:, 0].max() + 1) // 16) * 16, 192))
    win_h = int(min(-(-(bbox_wh[:, 1].max() + 1) // 16) * 16, 192))
    return RefineBank(
        clouds=jnp.asarray(clouds),
        valids=jnp.asarray(valids),
        chroma=jnp.asarray(chroma) if has_color else None,
        src_c=jnp.asarray(src_c),
        bbox_wh=jnp.asarray(bbox_wh),
        base_T=jnp.asarray(base_T),
        win=(win_h, win_w),
    )


def _masked_median(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``vals`` where ``mask`` (flat arrays); 0 when empty."""
    big = jnp.float32(1e9)
    v = jnp.where(mask, vals, big)
    v = jnp.sort(v)
    cnt = jnp.sum(mask)
    k = jnp.maximum(cnt - 1, 0) // 2
    med = v[k]
    return jnp.where(cnt > 0, med, 0.0)


def _seed_candidates(
    depth: jnp.ndarray,
    x: jnp.ndarray,            # (K,) level-0 pixel coords
    y: jnp.ndarray,
    wh: jnp.ndarray,           # (K, 2) render bbox (w, h)
    src_c: jnp.ndarray,        # (K, 3) cloud centroids (m)
    K: jnp.ndarray,
    win: Tuple[int, int],
) -> jnp.ndarray:
    """Initial ICP transforms from the window-median scene depth at each
    candidate (centroid shift, same idea as poseRefine's init guess,
    linemodLevelup.cpp:60-104).  Returns (K, 4, 4) float32."""
    h, w = depth.shape
    win_h, win_w = win
    depth_pad = jnp.pad(depth.astype(jnp.float32), ((0, win_h), (0, win_w)))

    def seed_one(xi, yi, whi, src_ci):
        window = jax.lax.dynamic_slice(
            depth_pad,
            (jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)),
            (win_h, win_w),
        )
        ii = jnp.arange(win_h)[:, None]
        jj = jnp.arange(win_w)[None, :]
        mask = (ii <= whi[1]) & (jj <= whi[0]) & (window > 0)
        z_med = _masked_median(window.reshape(-1), mask.reshape(-1)) / 1000.0
        z_med = jnp.where(z_med > 0, z_med, 0.5)
        u = xi.astype(jnp.float32) + whi[0].astype(jnp.float32) / 2.0
        v = yi.astype(jnp.float32) + whi[1].astype(jnp.float32) / 2.0
        target = jnp.stack(
            [
                (u - K[0, 2]) / K[0, 0] * z_med,
                (v - K[1, 2]) / K[1, 1] * z_med,
                z_med,
            ]
        )
        T0 = jnp.eye(4, dtype=jnp.float32)
        return T0.at[:3, 3].set(target - src_ci)

    return jax.vmap(seed_one)(x, y, wh, src_c)


def detect_refine_core(
    rgb: Optional[jnp.ndarray],
    depth: jnp.ndarray,
    kernels,
    nfeats,
    whs,
    cfg: DetectorConfig,
    threshold: float,
    feats,
    valids,
    rb: RefineBank,
    icp: IcpConfig,
    K: jnp.ndarray,
    max_refine: int,
    verify_pts: Optional[jnp.ndarray] = None,
    verify_colors: Optional[jnp.ndarray] = None,
    verify_tau: float = 15.0,
    verify_color_weight: float = 0.5,
    icp_seeds: int = 1,
    seed_step_deg: float = 18.0,
    seed_flip: bool = False,
    verify_color_zscore: bool = False,
):
    """Traceable fused frame: match + batched ICP + verify, no host trips.

    Each candidate optionally refines from ``icp_seeds`` in-plane seed
    rotations (the same fan as the multi-class core) and keeps its
    best-verified seed, so single-class and multi-class fused paths stay
    apples-to-apples under the serving ``icp_seeds`` knob.

    Returns per-candidate arrays of length ``max_refine``:
      (tid, x, y, score, R (R,3,3), t_mm (R,3), fitness, verify, active).
    Inactive slots have active=False.
    """
    h, w = depth.shape
    tid, x, y, score, keep = detect_frame_core(
        rgb, depth, kernels, nfeats, whs, cfg, threshold, True, feats, valids
    )
    # Top max_refine candidates by raw score, deduped on (template,
    # location) — NOT the box-NMS survivors; see
    # detect_refine_multiclass_core for the rationale: rival views at the
    # same peak must survive to verification, which is what separates a
    # near-symmetric object from its flip, while same-view peaks FAR
    # apart are distinct instances and both stay.
    rank = jnp.where(score >= 0, score, -jnp.inf)
    order0 = jnp.argsort(-rank)
    tid_s = tid[order0]
    rank_s = rank[order0]
    x_s = x[order0]
    y_s = y[order0]
    wh_s = rb.bbox_wh[tid_s]                    # (K, 2) template bbox px
    k_n = tid_s.shape[0]
    same = tid_s[:, None] == tid_s[None, :]
    near = (
        (jnp.abs(x_s[:, None] - x_s[None, :]) * 2 <= wh_s[None, :, 0])
        & (jnp.abs(y_s[:, None] - y_s[None, :]) * 2 <= wh_s[None, :, 1])
    )
    earlier = jnp.arange(k_n)[None, :] < jnp.arange(k_n)[:, None]
    dup = jnp.any(same & near & earlier, axis=1)
    # Tiered budget (see detect_refine_multiclass_core): distinct views
    # first, same-template repeat instances fill the remainder.
    rep = jnp.any(same & earlier, axis=1)
    rank2 = jnp.where(dup, -jnp.inf, rank_s + jnp.where(rep, 0.0, 1e4))
    order1 = jnp.argsort(-rank2)[:max_refine]
    order = order0[order1]
    tid_r = tid[order]
    x_r = x[order]
    y_r = y[order]
    score_r = score[order]
    active = jnp.isfinite(rank2[order1]) & (score_r >= 0)

    # --- candidate seeding: window median depth -> centroid shift -------
    init_T = _seed_candidates(
        depth, x_r, y_r, rb.bbox_wh[tid_r], rb.src_c[tid_r], K, rb.win
    )

    # --- in-plane seed fan (R -> R*S candidates) -------------------------
    s_n = icp_seeds
    init_T = _inplane_seed_transforms(
        init_T, rb.src_c[tid_r], s_n, seed_step_deg, seed_flip
    )
    rep = lambda a: jnp.repeat(a, s_n, axis=0) if s_n > 1 else a
    tid_e = rep(tid_r)
    act_e = rep(active)

    # --- batched ICP -----------------------------------------------------
    sp = backproject(depth, K)
    sn = scene_normals(sp)
    clouds_r = rb.clouds[tid_e]
    valid_r = rb.valids[tid_e] & act_e[:, None]
    use_color = rb.chroma is not None and rgb is not None and icp.color_weight > 0
    chroma_r = rb.chroma[tid_e] if use_color else None
    chroma_maps = scene_chroma(rgb) if use_color else None
    Ts, fits, _ = icp_batch(
        clouds_r,
        valid_r,
        sp,
        sn,
        K,
        init_T,
        icp.corr_dist,
        icp.max_iters,
        icp.coarse_gate_mult,
        model_chroma=chroma_r,
        chroma_maps=chroma_maps,
        color_weight=icp.color_weight,
        chroma_scale=icp.chroma_scale,
        point_weight=icp.point_weight,
        lm_damping=icp.lm_damping,
        bilinear_iters=icp.bilinear_iters,
        coarse_points=icp.coarse_points,
    )

    # --- compose with the template pose ----------------------------------
    result = jnp.einsum("kij,kjl->kil", Ts, rb.base_T[tid_e])
    R_out = result[:, :3, :3]
    t_out = result[:, :3, 3] * 1000.0  # mm

    # --- verification -----------------------------------------------------
    if verify_pts is not None:
        vscore = verify_poses(
            verify_pts,
            R_out,
            t_out,
            depth,
            K,
            tau_mm=verify_tau,
            model_colors=verify_colors,
            rgb=rgb if verify_colors is not None else None,
            color_weight=verify_color_weight,
            color_zscore=verify_color_zscore,
        )
    else:
        vscore = jnp.full((max_refine * s_n,), -1.0, jnp.float32)

    fits = jnp.where(act_e, fits, -1.0)
    vscore = jnp.where(act_e, vscore, -1.0)

    if s_n > 1:
        # Reduce each candidate to its best seed (verify-ranked, fitness
        # as tiebreaker / fallback when verify is disabled).
        seed_rank = jnp.where(
            vscore >= 0, vscore * 100.0 + jnp.maximum(fits, 0.0), fits
        ).reshape(max_refine, s_n)
        best = jnp.argmax(seed_rank, axis=1)
        pick = lambda a: jnp.take_along_axis(
            a.reshape(max_refine, s_n, *a.shape[1:]),
            best.reshape(-1, 1, *([1] * (a.ndim - 1))),
            axis=1,
        )[:, 0]
        R_out = pick(R_out)
        t_out = pick(t_out)
        fits = pick(fits)
        vscore = pick(vscore)

    return tid_r, x_r, y_r, score_r, R_out, t_out, fits, vscore, active


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "icp", "max_refine", "rb_win", "verify_tau",
        "verify_color_weight", "icp_seeds", "seed_step_deg", "seed_flip",
        "verify_color_zscore",
    ),
)
def _detect_refine_jit(
    rgb,
    depth,
    kernels,
    nfeats,
    whs,
    cfg,
    threshold,
    feats,
    valids,
    rb_arrays,
    rb_win,
    icp,
    K,
    max_refine,
    verify_pts,
    verify_colors,
    verify_tau,
    verify_color_weight,
    icp_seeds=1,
    seed_step_deg=18.0,
    seed_flip=False,
    verify_color_zscore=False,
):
    rb = RefineBank(*rb_arrays, win=rb_win)
    return detect_refine_core(
        rgb, depth, kernels, nfeats, whs, cfg, threshold, feats, valids,
        rb, icp, K, max_refine, verify_pts, verify_colors, verify_tau,
        verify_color_weight, icp_seeds, seed_step_deg, seed_flip,
        verify_color_zscore,
    )


def _inplane_seed_transforms(
    init_T: jnp.ndarray,      # (K, 4, 4)
    src_c: jnp.ndarray,       # (K, 3) model-cloud centroids (m)
    seeds: int,
    step_deg: float = 18.0,
    flip: bool = False,
) -> jnp.ndarray:
    """Expand each ICP seed into ``seeds`` in-plane rotations about the
    camera ray through the candidate's seeded centroid -> (K*seeds, 4, 4).

    Template banks discretize in-plane orientation at the tilt step
    (models/train.py); the residual (up to ~18 deg) is the main reason
    batched ICP converges NEAR a pose but snaps to a facet local minimum.
    Refining from a symmetric fan of in-plane perturbations and keeping
    the best-verified result recovers those targets for ~seeds x the ICP
    cost of one dispatch (ICP is a small slice of the frame budget).

    ``flip=True`` replaces the last fan slot with a 180-deg in-plane seed:
    near-180-symmetric silhouettes (a wedge and its flip, a T-bar, a box)
    make template matching lock the WRONG half of the view sphere, and no
    small fan recovers that — but the flipped-by-180 init of the wrong
    view sits next to the true pose, ICP polishes it, and verification
    (which sees the color/depth evidence the silhouette hides) picks it.
    """
    if seeds == 1:
        return init_T
    if flip and seeds >= 2:
        offs = (
            jnp.arange(seeds - 1, dtype=jnp.float32) - (seeds - 2) / 2.0
        )
        offs_deg = jnp.concatenate(
            [offs * step_deg, jnp.array([180.0], jnp.float32)]
        )
    else:
        offs = jnp.arange(seeds, dtype=jnp.float32) - (seeds - 1) / 2.0
        offs_deg = offs * step_deg
    angs = jnp.deg2rad(offs_deg)                           # (S,)
    c, s = jnp.cos(angs), jnp.sin(angs)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rz = jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )                                                      # (S, 3, 3)

    def expand(T0, ci):
        target = T0[:3, 3] + ci                            # rotation center
        def one_seed(R):
            T = jnp.eye(4, dtype=jnp.float32)
            T = T.at[:3, :3].set(R)
            T = T.at[:3, 3].set(target - R @ target)
            return T @ T0
        return jax.vmap(one_seed)(rz)                      # (S, 4, 4)

    out = jax.vmap(expand)(init_T, src_c)                  # (K, S, 4, 4)
    return out.reshape(-1, 4, 4)


def detect_refine_multiclass_core(
    rgb: Optional[jnp.ndarray],
    depth: jnp.ndarray,
    kernels,
    nfeats,
    whs,
    feats,
    valids,
    pad_map,                 # (C, Nmax) int32 global template ids, -1 = pad
    cfg: DetectorConfig,
    threshold,
    nmax: int,
    rb: RefineBank,          # GLOBAL refine bank (all classes concatenated)
    icp: IcpConfig,
    K: jnp.ndarray,
    max_refine: int,         # hypotheses kept PER CLASS through ICP+verify
    verify_pts: jnp.ndarray,        # (C, P, 3) padded per-class surface pts
    verify_valid: jnp.ndarray,      # (C, P) bool
    verify_colors: Optional[jnp.ndarray],  # (C, P, 3) or None
    verify_tau: float = 15.0,
    verify_color_weight: float = 0.5,
    icp_seeds: int = 1,
    seed_step_deg: float = 18.0,
    seed_flip: bool = False,
    verify_color_zscore: bool = False,
):
    """Traceable fused multi-class frame: ONE program scores every class,
    refines the top ``max_refine`` hypotheses of EVERY class with batched
    ICP (optionally from ``icp_seeds`` in-plane perturbations each), and
    verifies all C*R*S poses together (verify_poses_multi), reducing each
    hypothesis to its best-verified seed.

    The reference scores all classes inside one match() call
    (linemodLevelup.cpp:1753-1769) but refines candidates serially on the
    host; here the whole detect -> refine -> verify chain for C classes is
    one dispatch and one fixed-size readback.

    Returns (C, R) arrays: (tid_local, x, y, score, R (C,R,3,3), t_mm
    (C,R,3), fitness, verify, active).
    """
    from sixdpose_tpu.models.detector import _build_response_pyramid_jax
    from sixdpose_tpu.models.multiclass import match_multiclass_core

    pyramid = _build_response_pyramid_jax(rgb, depth, cfg)
    tid_l, x, y, score, keep = match_multiclass_core(
        pyramid, kernels, nfeats, whs, feats, valids, pad_map,
        tuple(cfg.t_at_level), threshold, cfg.top_k, nmax, cfg.nms_iou,
    )
    # Per-class hypothesis selection: top max_refine candidates by raw
    # score, deduped on (template, LOCATION) — deliberately NOT the
    # box-NMS survivors.  Box NMS keeps one template per location, but
    # near-symmetric objects (e.g. a wedge vs its 180-deg flip) score
    # several VIEWS at the same peak within a few similarity points;
    # suppressing them leaves only the loudest (possibly flipped) view in
    # the pool and ICP then polishes the wrong basin.  Keeping rival
    # views alive through ICP lets VERIFICATION pick the pose (measured
    # on wedge scenes: the correct view verifies ~0.93 vs ~0.66 for the
    # flip — whenever it is allowed into the pool).  The dedupe is
    # same-template AND same-place (within half the template bbox):
    # template-only dedupe silently dropped the second instance of a
    # repeated object whenever both peaked on the same view.  Final
    # spatial dedupe happens after verify (serving translation-space
    # dedupe), preserving the one-result-per-object contract.
    rank = jnp.where(score >= 0, score, -jnp.inf)            # (C, K)
    order0 = jnp.argsort(-rank, axis=1)                      # (C, K)
    take0 = lambda a: jnp.take_along_axis(a, order0, axis=1)
    tid_s = take0(tid_l)
    rank_s = take0(rank)
    x_s = take0(x)
    y_s = take0(y)
    gid_s = jnp.take_along_axis(jnp.maximum(pad_map, 0), tid_s, axis=1)
    wh_s = whs[0][gid_s]                                     # (C, K, 2)
    same = tid_s[:, :, None] == tid_s[:, None, :]            # (C, K, K)
    near = (
        (jnp.abs(x_s[:, :, None] - x_s[:, None, :]) * 2
         <= wh_s[:, None, :, 0])
        & (jnp.abs(y_s[:, :, None] - y_s[:, None, :]) * 2
           <= wh_s[:, None, :, 1])
    )
    k_n = same.shape[1]
    earlier = jnp.arange(k_n)[None, :] < jnp.arange(k_n)[:, None]
    dup = jnp.any(same & near & earlier[None], axis=2)       # (C, K)
    # Tiered budget: every template's FIRST occurrence outranks any
    # repeat — same-template far-away peaks (candidate second instances)
    # fill only the budget left after all distinct views are in.
    # Without the tier, scene-wide repeats of a loud view crowd rival
    # views out of the pool and the near-symmetry rescue regresses
    # (measured: wedge 0.67 -> 0.50 at max_hyps=64).
    rep = jnp.any(same & earlier[None], axis=2)              # (C, K)
    rank2 = jnp.where(
        dup, -jnp.inf, rank_s + jnp.where(rep, 0.0, 1e4)
    )
    order1 = jnp.argsort(-rank2, axis=1)[:, :max_refine]     # (C, R)
    order = jnp.take_along_axis(order0, order1, axis=1)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    tid_r = take(tid_l)
    x_r = take(x)
    y_r = take(y)
    score_r = take(score)
    active = (
        jnp.isfinite(jnp.take_along_axis(rank2, order1, axis=1))
        & (score_r >= 0)
    )                                                        # (C, R)
    gid = jnp.take_along_axis(
        jnp.maximum(pad_map, 0), tid_r, axis=1
    )                                                         # (C, R)

    c_n, r_n = gid.shape
    flat = lambda a: a.reshape(c_n * r_n, *a.shape[2:])
    gid_f = flat(gid)
    act_f = flat(active)

    init_T = _seed_candidates(
        depth, flat(x_r), flat(y_r), rb.bbox_wh[gid_f], rb.src_c[gid_f],
        K, rb.win,
    )

    # Seed fan: each candidate refines from icp_seeds in-plane rotations.
    s_n = icp_seeds
    init_T = _inplane_seed_transforms(
        init_T, rb.src_c[gid_f], s_n, seed_step_deg, seed_flip
    )                                           # (C*R*S, 4, 4)
    rep = lambda a: jnp.repeat(a, s_n, axis=0) if s_n > 1 else a
    gid_e = rep(gid_f)
    act_e = rep(act_f)

    sp = backproject(depth, K)
    sn = scene_normals(sp)
    clouds_r = rb.clouds[gid_e]
    valid_r = rb.valids[gid_e] & act_e[:, None]
    use_color = rb.chroma is not None and rgb is not None and icp.color_weight > 0
    chroma_r = rb.chroma[gid_e] if use_color else None
    chroma_maps = scene_chroma(rgb) if use_color else None
    Ts, fits, _ = icp_batch(
        clouds_r,
        valid_r,
        sp,
        sn,
        K,
        init_T,
        icp.corr_dist,
        icp.max_iters,
        icp.coarse_gate_mult,
        model_chroma=chroma_r,
        chroma_maps=chroma_maps,
        color_weight=icp.color_weight,
        chroma_scale=icp.chroma_scale,
        point_weight=icp.point_weight,
        lm_damping=icp.lm_damping,
        bilinear_iters=icp.bilinear_iters,
        coarse_points=icp.coarse_points,
    )

    result = jnp.einsum("kij,kjl->kil", Ts, rb.base_T[gid_e])
    R_out = result[:, :3, :3]
    t_out = result[:, :3, 3] * 1000.0  # mm

    # All C*R*S candidates verify together with their own class's points.
    cls_idx = jnp.repeat(jnp.arange(c_n), r_n * s_n)
    vscore = verify_poses_multi(
        verify_pts[cls_idx],
        verify_valid[cls_idx],
        R_out,
        t_out,
        depth,
        K,
        tau_mm=verify_tau,
        model_colors=(
            verify_colors[cls_idx] if verify_colors is not None else None
        ),
        rgb=rgb if verify_colors is not None else None,
        color_weight=verify_color_weight,
        color_zscore=verify_color_zscore,
    )

    # Mask BOTH rankable outputs for inactive (padded/below-threshold)
    # hypotheses: a consumer ranking on ``verify`` alone must never pick a
    # garbage pose, independent of whether it also checks ``active``.
    fits = jnp.where(act_e, fits, -1.0)
    vscore = jnp.where(act_e, vscore, -1.0)
    if s_n > 1:
        # Reduce each hypothesis to its best seed: verify-ranked with the
        # fitness as tiebreaker (and as the rank when verify is disabled).
        rank = jnp.where(
            vscore >= 0, vscore * 100.0 + jnp.maximum(fits, 0.0), fits
        ).reshape(c_n * r_n, s_n)
        best = jnp.argmax(rank, axis=1)
        pick = lambda a: jnp.take_along_axis(
            a.reshape(c_n * r_n, s_n, *a.shape[1:]),
            best.reshape(-1, 1, *([1] * (a.ndim - 1))),
            axis=1,
        )[:, 0]
        R_out = pick(R_out)
        t_out = pick(t_out)
        fits = pick(fits)
        vscore = pick(vscore)

    unflat = lambda a: a.reshape(c_n, r_n, *a.shape[1:])
    return (
        tid_r, x_r, y_r, score_r,
        unflat(R_out), unflat(t_out), unflat(fits), unflat(vscore), active,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "icp", "max_refine", "nmax", "rb_win", "verify_tau",
        "verify_color_weight", "icp_seeds", "seed_step_deg", "seed_flip",
        "verify_color_zscore",
    ),
)
def _detect_refine_multiclass_jit(
    rgb,
    depth,
    kernels,
    nfeats,
    whs,
    feats,
    valids,
    pad_map,
    cfg,
    threshold,
    nmax,
    rb_arrays,
    rb_win,
    icp,
    K,
    max_refine,
    verify_pts,
    verify_valid,
    verify_colors,
    verify_tau,
    verify_color_weight,
    icp_seeds,
    seed_step_deg,
    seed_flip=False,
    verify_color_zscore=False,
):
    rb = RefineBank(*rb_arrays, win=rb_win)
    return detect_refine_multiclass_core(
        rgb, depth, kernels, nfeats, whs, feats, valids, pad_map, cfg,
        threshold, nmax, rb, icp, K, max_refine, verify_pts, verify_valid,
        verify_colors, verify_tau, verify_color_weight, icp_seeds,
        seed_step_deg, seed_flip, verify_color_zscore,
    )


class FusedMultiClassPipeline:
    """detect+refine+verify for ALL classes as a single-dispatch callable.

    ``max_refine`` hypotheses are kept PER CLASS all the way through ICP
    and verification so the caller ranks poses by verify score instead of
    pre-committing to the best match similarity (wrong-surface locks under
    clutter beat the right pose on similarity but lose on verification).
    """

    def __init__(
        self,
        detector: Detector,
        K: np.ndarray,
        class_ids=None,
        icp: Optional[IcpConfig] = None,
        max_refine: int = 4,
        num_points: int = 512,
        verify_pts: Optional[Dict[str, np.ndarray]] = None,
        verify_colors: Optional[Dict[str, np.ndarray]] = None,
        verify_tau: float = 15.0,
        verify_color_weight: float = 0.5,
        icp_seeds: int = 1,
        seed_step_deg: float = 18.0,
        seed_flip: bool = False,
        verify_color_zscore: bool = False,
    ):
        from sixdpose_tpu.models.multiclass import MultiClassMatcher

        self.det = detector
        self.class_ids = list(class_ids or detector.class_ids())
        self.icp = icp or IcpConfig()
        self.max_refine = max_refine
        self.icp_seeds = int(icp_seeds)
        self.seed_step_deg = float(seed_step_deg)
        self.seed_flip = bool(seed_flip)
        self.K = jnp.asarray(np.asarray(K, np.float32))
        self.mc = MultiClassMatcher(detector, self.class_ids)

        # Global refine bank: per-class banks concatenated in pad_map's
        # class-major global-template order.
        rbs = []
        for cid in self.class_ids:
            rb = build_refine_bank(detector, cid, num_points)
            if rb is None:
                raise ValueError(
                    f"class {cid!r} lacks icp_points/pose infos; train with "
                    "render_train_templates or use the unfused serving path"
                )
            rbs.append(rb)
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        has_chroma = all(rb.chroma is not None for rb in rbs)
        win_h = max(rb.win[0] for rb in rbs)
        win_w = max(rb.win[1] for rb in rbs)
        self.rb = RefineBank(
            clouds=cat([rb.clouds for rb in rbs]),
            valids=cat([rb.valids for rb in rbs]),
            chroma=cat([rb.chroma for rb in rbs]) if has_chroma else None,
            src_c=cat([rb.src_c for rb in rbs]),
            bbox_wh=cat([rb.bbox_wh for rb in rbs]),
            base_T=cat([rb.base_T for rb in rbs]),
            win=(win_h, win_w),
        )

        # Per-class verification point sets, padded to a common P.
        if verify_pts is None:
            raise ValueError("verify_pts (class_id -> (P, 3) array) required")
        p_max = max(len(np.asarray(verify_pts[c])) for c in self.class_ids)
        vp = np.zeros((len(self.class_ids), p_max, 3), np.float32)
        vv = np.zeros((len(self.class_ids), p_max), bool)
        has_colors = verify_colors is not None and all(
            verify_colors.get(c) is not None for c in self.class_ids
        )
        vc = np.zeros((len(self.class_ids), p_max, 3), np.float32)
        for ci, cid in enumerate(self.class_ids):
            pts = np.asarray(verify_pts[cid], np.float32)
            vp[ci, : len(pts)] = pts
            vv[ci, : len(pts)] = True
            if has_colors:
                vc[ci, : len(pts)] = np.asarray(
                    verify_colors[cid], np.float32
                )
        self.verify_pts = jnp.asarray(vp)
        self.verify_valid = jnp.asarray(vv)
        self.verify_colors = jnp.asarray(vc) if has_colors else None
        self.verify_tau = float(verify_tau)
        self.verify_color_weight = float(verify_color_weight)
        self.verify_color_zscore = bool(verify_color_zscore)

    def __call__(self, rgb, depth, threshold: float):
        """Returns (C, R) device arrays (tid_local, x, y, score, R, t_mm,
        fitness, verify, active) ordered like ``class_ids`` — ONE dispatch,
        no readback."""
        rb = self.rb
        rb_arrays = (
            rb.clouds, rb.valids, rb.chroma, rb.src_c, rb.bbox_wh, rb.base_T
        )
        return _detect_refine_multiclass_jit(
            jnp.asarray(rgb) if rgb is not None else None,
            jnp.asarray(depth),
            self.mc.kernels,
            self.mc.nfeats,
            self.mc.whs,
            self.mc.feats,
            self.mc.valids,
            self.mc.pad_map,
            self.det.cfg,
            jnp.float32(threshold),
            self.mc.nmax,
            rb_arrays,
            rb.win,
            self.icp,
            self.K,
            self.max_refine,
            self.verify_pts,
            self.verify_valid,
            self.verify_colors,
            self.verify_tau,
            self.verify_color_weight,
            self.icp_seeds,
            self.seed_step_deg,
            self.seed_flip,
            self.verify_color_zscore,
        )


class FusedPipeline:
    """detect+refine+verify for one class as a single-dispatch callable."""

    def __init__(
        self,
        detector: Detector,
        class_id: str,
        K: np.ndarray,
        icp: Optional[IcpConfig] = None,
        max_refine: int = 8,
        num_points: int = 512,
        verify_pts: Optional[np.ndarray] = None,
        verify_colors: Optional[np.ndarray] = None,
        verify_tau: float = 15.0,
        verify_color_weight: float = 0.5,
        icp_seeds: int = 1,
        seed_step_deg: float = 18.0,
        seed_flip: bool = False,
        verify_color_zscore: bool = False,
    ):
        self.det = detector
        self.class_id = class_id
        self.icp = icp or IcpConfig()
        self.max_refine = max_refine
        self.icp_seeds = int(icp_seeds)
        self.seed_step_deg = float(seed_step_deg)
        self.seed_flip = bool(seed_flip)
        self.K = jnp.asarray(np.asarray(K, np.float32))
        self.rb = build_refine_bank(detector, class_id, num_points)
        if self.rb is None:
            raise ValueError(
                f"class {class_id!r} lacks icp_points/pose infos; train with "
                "render_train_templates or use the unfused serving path"
            )
        self.verify_pts = (
            jnp.asarray(np.asarray(verify_pts, np.float32))
            if verify_pts is not None
            else None
        )
        self.verify_colors = (
            jnp.asarray(np.asarray(verify_colors, np.float32))
            if verify_colors is not None
            else None
        )
        self.verify_tau = float(verify_tau)
        self.verify_color_weight = float(verify_color_weight)
        self.verify_color_zscore = bool(verify_color_zscore)

    def __call__(self, rgb, depth, threshold: float):
        """Returns device arrays (tid, x, y, score, R, t_mm, fitness,
        verify, active) — ONE dispatch, no readback."""
        kernels, nfeats, whs = self.det.device_bank(self.class_id)
        feats, valids = self.det._device_feats[self.class_id]
        rb = self.rb
        rb_arrays = (
            rb.clouds, rb.valids, rb.chroma, rb.src_c, rb.bbox_wh, rb.base_T
        )
        return _detect_refine_jit(
            jnp.asarray(rgb) if rgb is not None else None,
            jnp.asarray(depth),
            kernels,
            nfeats,
            whs,
            self.det.cfg,
            jnp.float32(threshold),
            feats,
            valids,
            rb_arrays,
            rb.win,
            self.icp,
            self.K,
            self.max_refine,
            self.verify_pts,
            self.verify_colors,
            self.verify_tau,
            self.verify_color_weight,
            self.icp_seeds,
            self.seed_step_deg,
            self.seed_flip,
            self.verify_color_zscore,
        )
