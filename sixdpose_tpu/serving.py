"""Live pose-estimation service: the linemod_ros node, re-designed.

Reference: linemod_ros/detect.py:28-170 — per frame: match (threshold 65)
-> box NMS -> per-match depth render + poseRefine -> translation-space
dedupe (``nms_norms``, detect.py:41-50) -> publish.  linemod_ros/train.py
renders templates at radii [800, 1000] and saves the bank.

Here the whole per-frame path is device-resident: fused match (one
dispatch), batched ICP over all surviving candidates (one dispatch), and
host-side dedupe on the handful of results.  No ROS dependency — frames
come from any iterable / callback; results go to a user callback.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from sixdpose_tpu.config import DetectorConfig, IcpConfig
from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.models.detector import Detector, Match
from sixdpose_tpu.models.refine import refine_poses


@dataclasses.dataclass
class PoseEstimate:
    class_id: str
    template_id: int
    x: int
    y: int
    similarity: float
    R: np.ndarray          # (3, 3)
    t: np.ndarray          # (3, 1) mm
    fitness: float
    verify: float = -1.0   # depth-consistency of the refined pose


def nms_norms(
    estimates: List[PoseEstimate],
    radius_mm: float = 40.0,
    key: str = "fitness",
) -> List[PoseEstimate]:
    """Greedy translation-space dedupe (linemod_ros/detect.py:41-50):
    keep the best estimate within each ``radius_mm`` ball.

    ``key``: 'fitness' ranks by ICP fitness (the stronger pose-quality
    signal after refinement, esp. under occlusion where match similarity
    is intentionally low with the levelup LUT) or 'similarity'."""
    keys = {
        "fitness": lambda e: (-e.fitness, -e.similarity),
        "similarity": lambda e: (-e.similarity, -e.fitness),
        "verify": lambda e: (-e.verify, -e.fitness, -e.similarity),
    }
    rank = keys[key]
    kept: List[PoseEstimate] = []
    for e in sorted(estimates, key=rank):
        if all(np.linalg.norm(e.t - k.t) > radius_mm for k in kept):
            kept.append(e)
    return kept


class PoseEstimationService:
    """Detection + refinement for a stream of RGB-D frames."""

    def __init__(
        self,
        detector: Detector,
        models: Dict[str, dict],
        K: np.ndarray,
        threshold: float = 65.0,
        max_refine: int = 8,
        icp: Optional[IcpConfig] = None,
        dedupe_radius_mm: float = 40.0,
        min_fitness: float = 0.5,
        min_verify: float = 0.0,
        verify_tau: float = 15.0,
        rank_key: str = "verify",
    ):
        """Args:
        detector: trained detector whose template infos carry the render
          pose (cam_K/cam_R_w2c/cam_t_w2c, models/train.py).
        models: class_id -> mesh dict (mm) for ICP depth renders.
        K: scene camera intrinsics.
        """
        self.det = detector
        self.models = models
        self.K = np.asarray(K, np.float64)
        self.threshold = threshold
        self.max_refine = max_refine
        self.icp = icp or IcpConfig()
        self.dedupe_radius_mm = dedupe_radius_mm
        self.min_fitness = min_fitness
        self.min_verify = min_verify
        self.verify_tau = verify_tau
        self.rank_key = rank_key
        self._render_cache: Dict[tuple, np.ndarray] = {}

    def _template_render(self, class_id: str, template_id: int, im_size) -> Optional[np.ndarray]:
        key = (class_id, template_id, im_size)
        if key not in self._render_cache:
            info = self.det.bank.infos[class_id][template_id]
            if "cam_R_w2c" not in info:
                return None
            d = render(
                self.models[class_id],
                im_size,
                info.get("cam_K", self.K),
                info["cam_R_w2c"],
                info["cam_t_w2c"],
                mode="depth",
            )
            self._render_cache[key] = np.asarray(d)
        return self._render_cache[key]

    def process_frame(self, rgb: np.ndarray, depth: np.ndarray) -> List[PoseEstimate]:
        """Detect -> batched refine -> dedupe for one frame."""
        h, w = depth.shape
        matches = self.det.match(rgb, depth, self.threshold)
        matches = matches[: self.max_refine]
        if not matches:
            return []

        renders, init_Ts, meta = [], [], []
        for m in matches:
            if m.class_id not in self.models:
                continue
            dimg = self._template_render(m.class_id, m.template_id, (w, h))
            if dimg is None:
                continue
            info = self.det.bank.infos[m.class_id][m.template_id]
            R0 = np.asarray(info["cam_R_w2c"], np.float64)
            t0 = np.asarray(info["cam_t_w2c"], np.float64).reshape(3)

            # Seed translation: move the render to the detected position
            # (centroid shift, same idea as poseRefine's init guess,
            # linemodLevelup.cpp:60-104).
            ys, xs = np.nonzero(dimg > 0)
            if len(ys) == 0:
                continue
            zs = depth[
                np.clip(m.y + (ys - ys.min()), 0, h - 1),
                np.clip(m.x + (xs - xs.min()), 0, w - 1),
            ]
            z_med = np.median(zs[zs > 0]) / 1000.0 if (zs > 0).any() else t0[2] / 1000.0
            cx_r = xs.mean()
            cy_r = ys.mean()
            u = m.x + (cx_r - xs.min())
            v = m.y + (cy_r - ys.min())
            target = np.array(
                [
                    (u - self.K[0, 2]) / self.K[0, 0] * z_med,
                    (v - self.K[1, 2]) / self.K[1, 1] * z_med,
                    z_med,
                ]
            )
            zr = dimg[dimg > 0].astype(np.float64) / 1000.0
            src_c = np.array(
                [
                    (cx_r - info.get("cam_K", self.K)[0, 2])
                    / info.get("cam_K", self.K)[0, 0]
                    * zr.mean(),
                    (cy_r - info.get("cam_K", self.K)[1, 2])
                    / info.get("cam_K", self.K)[1, 1]
                    * zr.mean(),
                    zr.mean(),
                ]
            )
            T0 = np.eye(4, dtype=np.float32)
            T0[:3, 3] = target - src_c
            renders.append(dimg.astype(np.uint16))
            init_Ts.append(T0)
            meta.append(m)

        if not renders:
            return []
        hm = max(r.shape[0] for r in renders)
        wm = max(r.shape[1] for r in renders)
        stack = np.zeros((len(renders), hm, wm), np.uint16)
        for i, r in enumerate(renders):
            stack[i, : r.shape[0], : r.shape[1]] = r

        Ts, fits, _rmse = refine_poses(
            depth, self.K, stack, self.K, np.stack(init_Ts), self.icp
        )
        Ts = np.asarray(Ts, np.float64)
        fits = np.asarray(fits)

        out = []
        for i, m in enumerate(meta):
            if fits[i] < self.min_fitness:
                continue
            info = self.det.bank.infos[m.class_id][m.template_id]
            base = np.eye(4)
            base[:3, :3] = info["cam_R_w2c"]
            base[:3, 3] = np.asarray(info["cam_t_w2c"]).flatten()
            base[2, 3] /= 1000.0  # reference quirk: z mm -> m (cpp:37)
            result = Ts[i] @ base
            est = PoseEstimate(
                class_id=m.class_id,
                template_id=m.template_id,
                x=m.x,
                y=m.y,
                similarity=m.similarity,
                R=result[:3, :3],
                t=result[:3, 3:4] * 1000.0,
                fitness=float(fits[i]),
            )
            est.verify = self._verify(est, depth)
            if est.verify < self.min_verify:
                continue
            out.append(est)
        return nms_norms(out, self.dedupe_radius_mm, key=self.rank_key)

    def _verify(self, est: PoseEstimate, depth: np.ndarray) -> float:
        """Depth-consistency of the refined pose: render the model at the
        estimate and measure the fraction of rendered pixels whose scene
        depth agrees within ``verify_tau`` mm.  Discriminates refinements
        that locked onto a different object's surface (no reference
        analog; the reference's only post-check is ICP fitness)."""
        h, w = depth.shape
        d_est = np.asarray(
            render(
                self.models[est.class_id], (w, h), self.K, est.R, est.t,
                mode="depth",
            )
        )
        m = d_est > 0
        if not m.any():
            return 0.0
        ds = depth[m].astype(np.float32)
        agree = (np.abs(d_est[m] - ds) < self.verify_tau) & (ds > 0)
        return float(agree.mean())

    def run(
        self,
        frames,
        callback: Callable[[List[PoseEstimate]], None],
    ) -> None:
        """Process an iterable of (rgb, depth) frames (the ROS
        subscribe/publish loop, detect.py:151-170)."""
        for rgb, depth in frames:
            callback(self.process_frame(rgb, depth))
