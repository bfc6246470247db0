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


def make_models() -> Dict[str, dict]:
    """Three distinct colored meshes (mm): an unequal box, an L-bracket,
    and a hexagonal prism."""
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
    return models


def make_scene(
    models: Dict[str, dict],
    K: np.ndarray,
    im_size: Tuple[int, int],
    rng: np.random.Generator,
    depth_range=(380.0, 520.0),
    spread_mm: float = 90.0,
):
    """Compose a cluttered scene: every object at a random pose, merged by
    nearest depth (mutual occlusion).  Returns (rgb, depth, gt list)."""
    w, h = im_size
    rgb = np.zeros((h, w, 3), np.uint8)
    depth = np.zeros((h, w), np.float32)
    gts = []
    for cid, model in models.items():
        R = random_rotation(rng)
        t = np.array(
            [rng.uniform(-spread_mm, spread_mm),
             rng.uniform(-spread_mm * 0.7, spread_mm * 0.7),
             rng.uniform(*depth_range)]
        )
        r_i, d_i = render(model, im_size, K, R, t, mode="rgb+depth")
        r_i = np.asarray(r_i)
        d_i = np.asarray(d_i)
        closer = (d_i > 0) & ((depth == 0) | (d_i < depth))
        depth[closer] = d_i[closer]
        rgb[closer] = r_i[closer]
        gts.append({"obj_id": cid, "R": R, "t": t.reshape(3, 1)})
    return rgb, depth.astype(np.uint16), gts


def run_benchmark(
    num_scenes: int = 20,
    min_n_views: int = 80,
    im_size: Tuple[int, int] = (320, 240),
    threshold: float = 55.0,
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    """Train banks for all models, evaluate recall over cluttered scenes.

    Correctness = ADI < 0.1 * diameter (SIXD ADD/ADI protocol; ADI since
    the synthetic shapes have geometric symmetries the depth-only ICP
    cannot disambiguate).
    """
    K = np.array(
        [[280.0, 0, im_size[0] / 2], [0, 280.0, im_size[1] / 2], [0, 0, 1]]
    )
    rng = np.random.default_rng(seed)
    models = make_models()
    diameters = {cid: model_diameter(m["pts"]) for cid, m in models.items()}

    cfg = DetectorConfig(
        t_at_level=(4, 8),
        top_k=32,
        color=ColorGradientConfig(num_features=40, strong_threshold=30.0),
        depth=DepthNormalConfig(num_features=24, extract_threshold=1, focal=280.0),
    )
    detectors = {}
    t0 = time.time()
    for cid, model in models.items():
        det = Detector(cfg)
        stats = render_train_templates(
            det, cid, model, K,
            radii=[450.0], min_n_views=min_n_views, im_size=im_size,
            elev_range=(-0.5 * np.pi, 0.5 * np.pi),   # full sphere: scene
            tilt_range=(-0.5 * np.pi, 0.5 * np.pi),   # poses are unrestricted
            tilt_step=0.2 * np.pi,
        )
        detectors[cid] = det
        if verbose:
            print(f"trained {cid}: {stats} ({det.num_templates(cid)} templates)")
    train_time = time.time() - t0

    services = {
        cid: PoseEstimationService(
            detectors[cid], {cid: models[cid]}, K,
            threshold=threshold, max_refine=4,
            icp=IcpConfig(max_iters=15), min_fitness=0.3,
        )
        for cid in models
    }

    targets = 0
    hits = 0
    per_obj = {cid: [0, 0] for cid in models}
    detect_time = 0.0
    for si in range(num_scenes):
        rgb, depth, gts = make_scene(models, K, im_size, rng)
        for gt in gts:
            cid = gt["obj_id"]
            visible = False
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
            t0 = time.time()
            ests = services[cid].process_frame(rgb, depth)
            detect_time += time.time() - t0
            ok = False
            for e in ests[:1]:
                err = pose_error.adi(e.R, e.t, gt["R"], gt["t"], models[cid],
                                     max_pts=1024)
                if err < 0.1 * diameters[cid]:
                    ok = True
            if ok:
                hits += 1
                per_obj[cid][0] += 1
        if verbose and (si + 1) % 5 == 0:
            print(f"scene {si+1}/{num_scenes}: recall so far {hits}/{targets}")

    result = {
        "recall": hits / max(targets, 1),
        "targets": targets,
        "hits": hits,
        "per_object": {
            cid: (v[0] / max(v[1], 1)) for cid, v in per_obj.items()
        },
        "train_time_s": train_time,
        "detect_refine_s_per_target": detect_time / max(targets, 1),
    }
    if verbose:
        print(result)
    return result
