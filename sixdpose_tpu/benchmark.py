"""Synthetic end-to-end accuracy benchmark.

Real SIXD datasets are not downloadable in every environment, so this
module generates a controlled stand-in: distinct parametric meshes,
render-trained banks, and cluttered multi-object scenes (z-buffer
composited, so objects occlude each other), then runs the full
detect -> refine -> evaluate pipeline and reports ADD/ADI recall at the
SIXD 0.1-diameter threshold plus timing.

Used by tools/benchmark_synthetic.py and the slow test suite.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from sixdpose_tpu.config import (
    ColorGradientConfig,
    DepthNormalConfig,
    DetectorConfig,
    IcpConfig,
)
from sixdpose_tpu.eval import pose_error
from sixdpose_tpu.eval.misc import model_diameter
from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.geometry.transform import random_rotation
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.models.train import render_train_templates
from sixdpose_tpu.serving import PoseEstimationService


def _quads_to_tris(quads):
    out = []
    for a, b, c, d in quads:
        out += [[a, b, c], [a, c, d]]
    return out


def _prism(profile_xy: np.ndarray, half_h: float) -> Tuple[np.ndarray, np.ndarray]:
    """Extrude a CCW 2-D polygon along z into a closed prism.

    Returns (pts (2n+2, 3), faces): top/bottom rings plus center fan
    vertices (same construction as the hex prism below).
    """
    n = len(profile_xy)
    top = np.concatenate([profile_xy, np.full((n, 1), half_h)], 1)
    bot = top.copy()
    bot[:, 2] = -half_h
    pts = np.concatenate([top, bot, [[0, 0, half_h], [0, 0, -half_h]]])
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [
            [i, j, n + i], [j, n + j, n + i],        # side
            [2 * n, j, i], [2 * n + 1, n + i, n + j]  # caps
        ]
    return pts, np.array(faces)


def _lathe(profile_rz: np.ndarray, segs: int = 20) -> Tuple[np.ndarray, np.ndarray]:
    """Revolve an (r, z) profile polyline around the z axis.

    Profile points with r=0 become single axis vertices; consecutive
    profile rows are stitched with quads (fans where one end is an axis
    point).  Returns (pts, faces).
    """
    th = np.linspace(0, 2 * np.pi, segs, endpoint=False)
    ring_start = []
    pts = []
    for r, z in profile_rz:
        if r < 1e-9:
            ring_start.append((len(pts), True))
            pts.append([0.0, 0.0, z])
        else:
            ring_start.append((len(pts), False))
            for a in th:
                pts.append([r * np.cos(a), r * np.sin(a), z])
    faces = []
    for k in range(len(profile_rz) - 1):
        s0, ax0 = ring_start[k]
        s1, ax1 = ring_start[k + 1]
        for i in range(segs):
            j = (i + 1) % segs
            if ax0 and not ax1:
                faces.append([s0, s1 + i, s1 + j])
            elif ax1 and not ax0:
                faces.append([s1, s0 + j, s0 + i])
            elif not ax0 and not ax1:
                faces += [[s0 + i, s1 + i, s1 + j], [s0 + i, s1 + j, s0 + j]]
    return np.array(pts, np.float64), np.array(faces)


def make_models() -> Dict[str, dict]:
    """Eight diverse meshes (mm) spanning the failure modes that matter
    for template matching + depth-only ICP: an unequal box, a concave
    L-bracket, a near-symmetric hexagonal prism, a concave cup (interior
    cavity), a T-bar, an asymmetric wedge, a 5-point star prism, and a
    TEXTURE-mapped box (exercises the textured render path end to end)."""
    models = {}

    half = np.array([30.0, 20.0, 12.0])
    pts = np.array(
        [[sx * half[0], sy * half[1], sz * half[2]]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    quads = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5)]
    colors = np.stack(
        [100 + 155 * (pts[:, 0] > 0), 100 + 155 * (pts[:, 1] > 0),
         100 + 155 * (pts[:, 2] > 0)], 1,
    ).astype(np.uint8)
    models["box"] = {
        "pts": pts, "faces": np.array(_quads_to_tris(quads)), "colors": colors
    }

    # L-bracket: two slabs.
    def slab(x0, x1, y0, y1, z0, z1):
        return np.array(
            [[x, y, z] for x in (x0, x1) for y in (y0, y1) for z in (z0, z1)]
        )
    p1 = slab(-30, 30, -25, -5, -10, 10)
    p2 = slab(-30, -10, -5, 35, -10, 10)
    pts = np.concatenate([p1, p2])
    faces = np.array(_quads_to_tris(quads) + (np.array(_quads_to_tris(quads)) + 8).tolist())
    colors = np.stack(
        [np.full(len(pts), 220), 80 + 120 * (pts[:, 1] > 0),
         np.full(len(pts), 60)], 1,
    ).astype(np.uint8)
    models["lbracket"] = {"pts": pts, "faces": faces, "colors": colors}

    # Hexagonal prism.
    th = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    top = np.stack([25 * np.cos(th), 25 * np.sin(th), np.full(6, 15.0)], 1)
    bot = top.copy(); bot[:, 2] = -15
    pts = np.concatenate([top, bot, [[0, 0, 15], [0, 0, -15]]])
    faces = []
    for i in range(6):
        j = (i + 1) % 6
        faces += [[i, j, 6 + i], [j, 6 + j, 6 + i], [12, j, i], [13, 6 + i, 6 + j]]
    colors = np.stack(
        [120 + 100 * np.cos(np.arctan2(pts[:, 1], pts[:, 0] + 1e-9)),
         np.full(len(pts), 90),
         120 + 100 * np.sin(np.arctan2(pts[:, 1], pts[:, 0] + 1e-9))], 1,
    ).clip(0, 255).astype(np.uint8)
    models["hex"] = {"pts": pts, "faces": np.array(faces), "colors": colors}

    def angle_colors(pts, base=(120, 90, 120), amp=100):
        a = np.arctan2(pts[:, 1], pts[:, 0] + 1e-9)
        return np.stack(
            [base[0] + amp * np.cos(a),
             base[1] + 60 * (pts[:, 2] > 0),
             base[2] + amp * np.sin(a)], 1,
        ).clip(0, 255).astype(np.uint8)

    # Cup: concave solid of revolution — outer wall r=26, interior cavity
    # r=20 down to 6 mm above the base (ICP sees both walls + rim).
    profile = np.array([
        [0.0, -20.0], [26.0, -20.0], [26.0, 20.0],
        [20.0, 20.0], [20.0, -14.0], [0.0, -14.0],
    ])
    pts, faces = _lathe(profile, segs=20)
    colors = angle_colors(pts, base=(180, 80, 60), amp=60)
    models["cup"] = {"pts": pts, "faces": faces, "colors": colors}

    # T-bar: concave T-profile extrusion.
    tprof = np.array([
        [-30, 25], [30, 25], [30, 10], [8, 10],
        [8, -30], [-8, -30], [-8, 10], [-30, 10],
    ], np.float64)[::-1]  # CCW
    pts, faces = _prism(tprof, 10.0)
    colors = np.stack(
        [np.full(len(pts), 70), 120 + 100 * (pts[:, 1] > 10),
         150 + 80 * (pts[:, 0] > 0)], 1,
    ).clip(0, 255).astype(np.uint8)
    models["tbar"] = {"pts": pts, "faces": faces, "colors": colors}

    # Wedge: asymmetric right-angled ramp (no symmetries at all).
    wprof = np.array([[-30, -18], [30, -18], [30, 2], [-30, 22]], np.float64)
    pts, faces = _prism(wprof, 12.0)
    colors = np.stack(
        [200 - 3 * (pts[:, 1] + 18), np.full(len(pts), 140),
         60 + 3 * (pts[:, 1] + 18)], 1,
    ).clip(0, 255).astype(np.uint8)
    models["wedge"] = {"pts": pts, "faces": faces, "colors": colors}

    # Star prism: 5-point star (spiky silhouette, strong gradients).
    a = np.linspace(0, 2 * np.pi, 10, endpoint=False) - np.pi / 2
    r = np.where(np.arange(10) % 2 == 0, 32.0, 14.0)
    sprof = np.stack([r * np.cos(a), r * np.sin(a)], 1)
    pts, faces = _prism(sprof, 9.0)
    models["star"] = {"pts": pts, "faces": faces,
                      "colors": angle_colors(pts, base=(90, 150, 90))}

    # Near-symmetric cylinder: 24-gon, color breaks the symmetry the
    # geometry can't (tests the color-verification path).
    a = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    cprof = np.stack([24 * np.cos(a), 24 * np.sin(a)], 1)
    pts, faces = _prism(cprof, 22.0)
    models["cyl"] = {"pts": pts, "faces": faces,
                     "colors": angle_colors(pts, base=(60, 60, 160), amp=90)}

    # Textured box: planar-UV checker+gradient texture exercises the
    # texture-mapped render path (reference renderer.py:316-321) through
    # training, scene composition, and verification.
    half = np.array([32.0, 22.0, 10.0])
    pts = np.array(
        [[sx * half[0], sy * half[1], sz * half[2]]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    quads = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5)]
    uv = np.stack(
        [(pts[:, 0] + half[0]) / (2 * half[0]),
         (pts[:, 1] + half[1]) / (2 * half[1])], 1,
    )
    ty, tx = np.mgrid[0:64, 0:64]
    checker = ((tx // 8 + ty // 8) % 2).astype(np.float32)
    tex = np.stack(
        [60 + 180 * checker, 40 + 3 * tx.astype(np.float32),
         220 - 180 * checker], -1,
    ).clip(0, 255).astype(np.uint8)
    models["texbox"] = {
        "pts": pts, "faces": np.array(_quads_to_tris(quads)),
        "texture_uv": uv, "texture": tex,
        # fallback colors for paths that ignore textures
        "colors": np.full((len(pts), 3), 150, np.uint8),
    }
    return models


def make_scene(
    models: Dict[str, dict],
    K: np.ndarray,
    im_size: Tuple[int, int],
    rng: np.random.Generator,
    depth_range=(380.0, 520.0),
    spread_mm: float = 90.0,
    max_objects: Optional[int] = None,
):
    """Compose a cluttered scene: objects at random poses, merged by
    nearest depth (mutual occlusion).  Returns (rgb, depth, gt list).

    ``max_objects``: sample that many classes per scene from the pool
    (None = all).  With a 9-model pool in a QVGA frame, all-at-once
    stacks 9 objects into a +-90 mm volume — far denser than any SIXD
    scene; 3-5 per scene matches hinterstoisser-style clutter while per-
    object recall still covers every mesh over enough scenes."""
    w, h = im_size
    rgb = np.zeros((h, w, 3), np.uint8)
    depth = np.zeros((h, w), np.float32)
    gts = []
    cids = list(models.keys())
    if max_objects is not None and max_objects < len(cids):
        cids = list(rng.choice(cids, size=max_objects, replace=False))
    for cid in cids:
        model = models[cid]
        R = random_rotation(rng)
        t = np.array(
            [rng.uniform(-spread_mm, spread_mm),
             rng.uniform(-spread_mm * 0.7, spread_mm * 0.7),
             rng.uniform(*depth_range)]
        )
        r_i, d_i = render(
            model, im_size, K, R, t, mode="rgb+depth",
            texture=model.get("texture"),
        )
        r_i = np.asarray(r_i)
        d_i = np.asarray(d_i)
        closer = (d_i > 0) & ((depth == 0) | (d_i < depth))
        depth[closer] = d_i[closer]
        rgb[closer] = r_i[closer]
        gts.append({"obj_id": cid, "R": R, "t": t.reshape(3, 1)})
    return rgb, depth.astype(np.uint16), gts


def train_benchmark_bank(
    models: Dict[str, dict],
    K: np.ndarray,
    im_size: Tuple[int, int],
    min_n_views: int,
    cfg: DetectorConfig,
    bank_cache: Optional[str] = None,
    verbose: bool = True,
) -> Tuple[Detector, float]:
    """One shared detector bank for all benchmark classes, loaded from
    ``bank_cache`` when present (training dominates benchmark wall time;
    the bank is deterministic given the knobs, which are checked via the
    cache sidecar)."""
    import json
    import os

    import re

    from sixdpose_tpu.ops.quantize import QUANTIZER_VERSION

    def _norm_cfg(cfg_repr: str) -> str:
        """Drop INFERENCE-ONLY fields from the cache key: top_k and
        nms_iou never affect what training writes into the bank, and a
        candidate-budget sweep must not cost a full retrain."""
        cfg_repr = re.sub(r"top_k=\d+", "top_k=*", cfg_repr)
        return re.sub(r"nms_iou=[\d.]+", "nms_iou=*", cfg_repr)

    knobs = {
        "classes": sorted(models.keys()),
        "min_n_views": min_n_views,
        "im_size": list(im_size),
        "cfg": repr(cfg),
        "quantizer": QUANTIZER_VERSION,
    }

    def _match(cached: dict) -> bool:
        a, b = dict(cached), dict(knobs)
        a["cfg"] = _norm_cfg(a.get("cfg", ""))
        b["cfg"] = _norm_cfg(b["cfg"])
        return a == b

    if bank_cache and os.path.exists(bank_cache) and os.path.exists(
        bank_cache + ".meta.json"
    ):
        with open(bank_cache + ".meta.json") as f:
            cached = json.load(f)
        if _match(cached):
            det = Detector.read_classes(bank_cache, cfg)
            if verbose:
                print(f"bank cache hit: {bank_cache} "
                      f"({det.num_templates()} templates)")
            return det, 0.0
        if verbose:
            print("bank cache stale (knobs changed); retraining")

    det = Detector(cfg)
    t0 = time.time()
    for cid, model in models.items():
        stats = render_train_templates(
            det, cid, model, K,
            radii=[450.0], min_n_views=min_n_views, im_size=im_size,
            elev_range=(-0.5 * np.pi, 0.5 * np.pi),   # full sphere: scene
            tilt_range=(-0.5 * np.pi, 0.5 * np.pi),   # poses are unrestricted
            tilt_step=0.2 * np.pi,
        )
        if verbose:
            print(f"trained {cid}: {stats} ({det.num_templates(cid)} templates)")
    train_time = time.time() - t0
    if bank_cache:
        # Atomic publish: write both files to temp paths and os.replace()
        # them, sidecar LAST — an interrupt can never leave a truncated
        # bank next to a matching sidecar (which would "cache hit" into a
        # crash, or worse load a partial bank).
        # np.savez appends ".npz" unless the path already ends with it:
        # normalize the cache path up front, otherwise write_classes
        # produces bank.tmp.npz while os.replace looks for bank.tmp and
        # the (expensive) training run dies at publish time.
        if not bank_cache.endswith(".npz"):
            bank_cache = bank_cache + ".npz"
        root, ext = os.path.splitext(bank_cache)
        tmp_bank = root + ".tmp" + ext
        tmp_meta = bank_cache + ".meta.json.tmp"
        det.write_classes(tmp_bank)
        with open(tmp_meta, "w") as f:
            json.dump(knobs, f)
        os.replace(tmp_bank, bank_cache)
        os.replace(tmp_meta, bank_cache + ".meta.json")
    return det, train_time


def run_benchmark(
    num_scenes: int = 20,
    min_n_views: int = 80,
    im_size: Tuple[int, int] = (320, 240),
    threshold: float = 55.0,
    seed: int = 0,
    verbose: bool = True,
    max_objects_per_scene: Optional[int] = 4,
    prefer_fused: bool = True,
    object_ids: Optional[List[str]] = None,
    bank_cache: Optional[str] = None,
    max_hyps: int = 12,
    rank_key: str = "verify",
    scene_hook=None,
    icp_seeds: int = 4,
    verify_tau: float = 6.0,
    seed_flip: bool = True,
    top_k: int = 32,
    verify_color_weight: float = 0.5,
    verify_color_zscore: bool = False,
    icp: Optional[IcpConfig] = None,
) -> dict:
    """Train banks for all models, evaluate recall over cluttered scenes.

    Correctness = ADI < 0.1 * diameter (SIXD ADD/ADI protocol; ADI since
    the synthetic shapes have geometric symmetries the depth-only ICP
    cannot disambiguate).

    All classes share ONE detector bank and every scene is processed by
    ONE fused multi-class dispatch (models/pipeline.py) that carries
    ``max_hyps`` hypotheses per class through batched ICP + verification;
    the published estimate per class is the verification-ranked winner —
    never the raw best-similarity match (wrong-surface locks under
    clutter beat the right pose on similarity but lose on verify).

    ``scene_hook``: optional callable(si, rgb, depth, gts) invoked per
    generated scene (used by the reference-baseline exporter to dump the
    exact evaluation scenes as PNGs).
    """
    K = np.array(
        [[280.0, 0, im_size[0] / 2], [0, 280.0, im_size[1] / 2], [0, 0, 1]]
    )
    rng = np.random.default_rng(seed)
    models = make_models()
    if object_ids is not None:
        models = {cid: models[cid] for cid in object_ids}
    diameters = {cid: model_diameter(m["pts"]) for cid, m in models.items()}

    cfg = DetectorConfig(
        t_at_level=(4, 8),
        top_k=top_k,
        color=ColorGradientConfig(num_features=40, strong_threshold=30.0),
        depth=DepthNormalConfig(num_features=24, extract_threshold=1, focal=280.0),
    )
    det, train_time = train_benchmark_bank(
        models, K, im_size, min_n_views, cfg, bank_cache, verbose
    )

    service = PoseEstimationService(
        det, models, K,
        threshold=threshold, max_refine=max_hyps,
        icp=icp or IcpConfig(max_iters=20), min_fitness=0.3,
        prefer_fused=prefer_fused, rank_key=rank_key,
        icp_seeds=icp_seeds, verify_tau=verify_tau, seed_flip=seed_flip,
        verify_color_weight=verify_color_weight,
        verify_color_zscore=verify_color_zscore,
    )

    targets = 0
    hits = 0
    hits_vsd = 0
    per_obj = {cid: [0, 0] for cid in models}
    detect_time = 0.0
    frames = 0
    last_scene = None
    for si in range(num_scenes):
        rgb, depth, gts = make_scene(
            models, K, im_size, rng, max_objects=max_objects_per_scene
        )
        if scene_hook is not None:
            scene_hook(si, rgb, depth, gts)
        # ONE dispatch per scene covers every class; per-class estimate
        # lists come out ranked by the service's rank_key.
        t0 = time.time()
        ests = service.process_frame(rgb, depth)
        detect_time += time.time() - t0
        frames += 1
        last_scene = (rgb, depth)
        by_class: Dict[str, List] = {}
        for e in ests:
            by_class.setdefault(e.class_id, []).append(e)
        for gt in gts:
            cid = gt["obj_id"]
            # target only if sufficiently visible (analog of visib>=0.1)
            d_solo = np.asarray(
                render(models[cid], im_size, K, gt["R"], gt["t"], mode="depth")
            )
            vis_frac = (
                ((np.abs(depth.astype(np.float32) - d_solo) < 5) & (d_solo > 0)).sum()
                / max((d_solo > 0).sum(), 1)
            )
            if vis_frac < 0.3:
                continue
            targets += 1
            per_obj[cid][1] += 1
            ok = False
            ok_vsd = False
            for e in by_class.get(cid, [])[:1]:
                err = pose_error.adi(e.R, e.t, gt["R"], gt["t"], models[cid],
                                     max_pts=1024)
                if err < 0.1 * diameters[cid]:
                    ok = True
                # SIXD-2017 VSD protocol column (delta=15, tau=20,
                # cost=step, e < 0.3 — /root/reference/tools/
                # eval_loc.py:7-14,205-216): the protocol the blueprint
                # leads with, next to ADI.
                e_vsd = pose_error.vsd(
                    e.R, e.t, gt["R"], gt["t"], models[cid], depth, K,
                    delta=15.0, tau=20.0, cost_type="step",
                )
                if e_vsd < 0.3:
                    ok_vsd = True
            if ok:
                hits += 1
                per_obj[cid][0] += 1
            if ok_vsd:
                hits_vsd += 1
        if verbose and (si + 1) % 5 == 0:
            print(f"scene {si+1}/{num_scenes}: recall so far {hits}/{targets}")

    result = {
        "recall": hits / max(targets, 1),
        "recall_vsd": hits_vsd / max(targets, 1),
        "targets": targets,
        "hits": hits,
        "hits_vsd": hits_vsd,
        "per_object": {
            cid: (v[0] / max(v[1], 1)) for cid, v in per_obj.items()
        },
        "train_time_s": train_time,
        "detect_refine_s_per_frame": detect_time / max(frames, 1),
        "detect_refine_s_per_target": detect_time / max(targets, 1),
    }
    # Pure device throughput of the fused dispatch at THIS configuration
    # (chained-slope: the host s/frame above includes the sync-tunnel
    # wall, which is not what a co-located deployment pays).
    if prefer_fused and last_scene is not None:
        dev_ms = fused_device_ms_per_frame(service, *last_scene)
        if dev_ms is not None:
            result["device_ms_per_frame"] = round(dev_ms, 2)
    if verbose:
        print(result)
    return result


def fused_device_ms_per_frame(service, rgb, depth) -> Optional[float]:
    """Chained-slope device time of the fused multi-class dispatch at the
    service's exact configuration (None when the fused pipeline is
    unavailable).  Methodology: K data-dependent iterations inside ONE
    jit, slope over two K values — async host loops through the device
    tunnel fabricate numbers (see bench.py)."""
    import jax
    import jax.numpy as jnp

    pipe = service._fused_multiclass(tuple(service.det.class_ids()))
    if pipe is None:
        return None
    from sixdpose_tpu.models.pipeline import detect_refine_multiclass_core

    rb = pipe.rb
    thr = jnp.float32(service.threshold)
    rgb_j = jnp.asarray(rgb)
    dep_j = jnp.asarray(depth)

    @jax.jit
    def chain(k, r, d):
        def body(i, carry):
            r_, acc = carry
            out = detect_refine_multiclass_core(
                r_, d, pipe.mc.kernels, pipe.mc.nfeats, pipe.mc.whs,
                pipe.mc.feats, pipe.mc.valids, pipe.mc.pad_map,
                pipe.det.cfg, thr, pipe.mc.nmax, rb, pipe.icp, pipe.K,
                pipe.max_refine, pipe.verify_pts, pipe.verify_valid,
                pipe.verify_colors, pipe.verify_tau,
                pipe.verify_color_weight, pipe.icp_seeds,
                pipe.seed_step_deg, pipe.seed_flip,
                pipe.verify_color_zscore,
            )
            a = out[3][0, 0] + out[7][0, 0]
            dd = (jnp.abs(a) % 2.0).astype(jnp.uint8)
            return (r_ ^ dd, acc + a)

        _, acc = jax.lax.fori_loop(0, k, body, (r, jnp.float32(0)))
        return acc

    k1, k2 = 1, 5
    for k in (k1, k2):
        _ = float(chain(jnp.int32(k), rgb_j, dep_j))
    for _ in range(5):
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(jnp.int32(k1), rgb_j, dep_j))
            t1s.append(time.time() - t0)
            t0 = time.time()
            _ = float(chain(jnp.int32(k2), rgb_j, dep_j))
            t2s.append(time.time() - t0)
        dt = (min(t2s) - min(t1s)) / (k2 - k1)
        if dt > 0:
            return dt * 1000.0
    return None
