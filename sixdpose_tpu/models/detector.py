"""Template-matching detector: pyramid match orchestration.

TPU re-design of the reference ``Detector`` (linemodLevelup.cpp:1663-2010):

- ``match`` quantizes each modality once per pyramid level, spreads and
  builds response maps (ops/spread.py), then scores EVERY template of a
  class at every stride-T placement of the coarsest level with one dense
  MXU correlation (ops/similarity.py) — the reference's per-template
  serial loop (cpp:1797) becomes a batched conv.
- Candidates are fixed-K top-k + threshold (cpp:1836-1852), locally
  re-scored over a 16x16 placement window while marching down the pyramid
  (cpp:1854-1938) with one grouped conv per level for all candidates.
- Final dedupe is score-sorted box NMS (driver-side NMS in the reference,
  linemod_and_levelup_test.py:34-61).

Coordinates and scores follow the reference exactly: reported (x, y) is the
placement times T plus the T/2 centering offset (cpp:1845-1847), and
score = 100 * raw / (4 * nfeat) (cpp:1841).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.config import DetectorConfig
from sixdpose_tpu.models.templates import TemplateBank
from sixdpose_tpu.ops import quantize as Q
from sixdpose_tpu.ops.spread import spread_orientations, compute_response_maps
from sixdpose_tpu.ops.similarity import (
    score_normalize,
    similarity_dense,
    similarity_local,
    similarity_local_sparse_auto,
    similarity_multiscale_matmul,
)
from sixdpose_tpu.ops.topk_nms import topk_candidates, nms_boxes


@dataclasses.dataclass
class Match:
    """A detection (reference Match struct, linemodLevelup.h:225-253)."""

    x: int
    y: int
    similarity: float
    class_id: str
    template_id: int


def _offset(t: int) -> int:
    """Reported-coordinate centering: T/2 + (T%2 - 1)  (cpp:1845)."""
    return t // 2 + (t % 2 - 1)


@functools.partial(jax.jit, static_argnames=("t_at_level", "top_k"))
def _match_class(
    response_pyramid: Tuple[jnp.ndarray, ...],
    kernels: Tuple[jnp.ndarray, ...],
    nfeats: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    t_at_level: Tuple[int, ...],
    threshold: float,
    top_k: int,
    feats: Optional[Tuple[jnp.ndarray, ...]] = None,
    valids: Optional[Tuple[jnp.ndarray, ...]] = None,
):
    """Score one class against a response pyramid.

    Args:
      response_pyramid: per level, (C, H_l, W_l) uint8 response maps
        (level 0 = finest).
      kernels / nfeats / whs: per level dense bank arrays.
      t_at_level: stride per level.
      threshold: similarity threshold in [0, 100].
      top_k: candidate budget.

    Returns (tid, x, y, score) arrays of shape (top_k,), reference-style
    pixel coordinates at level 0; score < 0 marks invalid slots.
    """
    levels = len(t_at_level)
    coarse = levels - 1
    t_c = t_at_level[coarse]
    scores = coarse_scores(
        response_pyramid, kernels, nfeats, t_at_level, feats, valids
    )
    tid, yi, xi, score = topk_candidates(scores, threshold, top_k)
    x = xi * t_c + _offset(t_c)
    y = yi * t_c + _offset(t_c)
    return pyramid_refine(
        response_pyramid, kernels, nfeats, whs, t_at_level, threshold,
        tid, x, y, score, feats, valids,
    )


def coarse_scores(
    response_pyramid,
    kernels,
    nfeats,
    t_at_level: Tuple[int, ...],
    feats=None,
    valids=None,
):
    """Dense scoring at the coarsest level (cpp:1820-1852), shared by
    _match_class and the stage-breakdown profiler.

    Bank-size-adaptive scorer.  The one-hot conv wastes >99.9% of its
    MACs (~0.04% kernel density), but below ~2e10 MACs the MXU eats the
    waste for free while the sparse path pays a fixed im2col
    (~2 ms at VGA): measured 1.7 ms conv vs 4.2 ms sparse for the case1
    89-template bank, and ~8.5 ms conv vs ~4 ms sparse for the 1685
    kernels of the multiscale sweep.  Cross over on the MAC estimate.

    Returns (N, hb, wb) float32 normalized scores; -1 marks empty rows."""
    coarse = len(t_at_level) - 1
    t_c = t_at_level[coarse]
    n_k, c_k, kh_c, kw_c = kernels[coarse].shape
    hb = -(-response_pyramid[coarse].shape[1] // t_c)
    wb = -(-response_pyramid[coarse].shape[2] // t_c)
    conv_macs = n_k * hb * wb * c_k * kh_c * kw_c
    if feats is not None and conv_macs > 2e10:
        raw, nf_c = similarity_multiscale_matmul(
            response_pyramid[coarse],
            feats[coarse],
            valids[coarse],
            jnp.ones((1,), jnp.float32),
            t_c,
            kh_c,
            kw_c,
        )
        scores = score_normalize(raw, jnp.maximum(nf_c, 1))
        scores = jnp.where(nf_c[:, None, None] > 0, scores, -1.0)
    else:
        raw = similarity_dense(response_pyramid[coarse], kernels[coarse], t_c)
        scores = score_normalize(raw, nfeats[coarse])
    return scores


def pyramid_refine(
    response_pyramid,
    kernels,
    nfeats,
    whs,
    t_at_level: Tuple[int, ...],
    threshold,
    tid,
    x,
    y,
    score,
    feats=None,
    valids=None,
):
    """Candidate-local refinement marching down the pyramid
    (cpp:1854-1938), shared by the single-class and multi-class matchers.
    Candidate arrays are (K,) with global template ids into the bank
    arrays.  Returns updated (tid, x, y, score)."""
    levels = len(t_at_level)
    for l in range(levels - 2, -1, -1):
        t = t_at_level[l]
        border = 8 * t
        h_l, w_l = response_pyramid[l].shape[1:]
        wh_l = whs[l][tid]
        x = x * 2 + 1
        y = y * 2 + 1
        x = jnp.maximum(x, border)
        y = jnp.maximum(y, border)
        x = jnp.minimum(x, w_l - wh_l[:, 0] - border)
        y = jnp.minimum(y, h_l - wh_l[:, 1] - border)

        og_x = jnp.maximum(x // t - 8, 0)
        og_y = jnp.maximum(y // t - 8, 0)
        origins = jnp.stack([og_y * t, og_x * t], axis=1)

        # Feature-sparse refinement whenever feature lists are available:
        # work scales with the feature count (Pallas DMA kernel on TPU).
        # The grouped-conv alternative computes each candidate as a
        # matrix-vector group — honest chained-dispatch timing puts it at
        # ~38 ms for the case1 127 bank vs ~8 ms sparse (the previous
        # area heuristic favoring it came from untrustworthy async-mode
        # measurements).
        if feats is not None:
            raw_local, _ = similarity_local_sparse_auto(
                response_pyramid[l], feats[l][tid], valids[l][tid], origins, t,
                active=score >= 0,
            )
        else:
            kern_sel = kernels[l][tid]
            raw_local = similarity_local(response_pyramid[l], kern_sel, origins, t)
        local_scores = score_normalize(raw_local, nfeats[l][tid])
        flat = local_scores.reshape(local_scores.shape[0], -1)
        best = jnp.argmax(flat, axis=1)  # first max wins, like cpp:1913-1926
        best_r = best // 16
        best_c = best % 16
        new_score = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
        x = (og_x + best_c) * t + _offset(t)
        y = (og_y + best_r) * t + _offset(t)
        score = jnp.where(score >= 0, new_score, -1.0)
        score = jnp.where(score > threshold, score, -1.0)  # cpp:1934-1937

    return tid, x, y, score


def _build_response_pyramid_jax(
    rgb: Optional[jnp.ndarray], depth: Optional[jnp.ndarray], cfg: DetectorConfig
) -> Tuple[jnp.ndarray, ...]:
    """Quantize -> spread -> response maps per level (cpp:1726-1752).

    Pure-jax (traceable) version; returns per-level (C, H_l, W_l) uint8.
    """
    levels = cfg.pyramid_levels
    per_level_channels: List[List[jnp.ndarray]] = [[] for _ in range(levels)]
    if cfg.use_color:
        cur = rgb
        for l in range(levels):
            if l > 0:
                cur = Q.pyr_down_rgb(cur)
            q, _ = Q.quantize_color_gradient(cur, cfg.color.weak_threshold)
            per_level_channels[l].append(q)
    if cfg.use_depth:
        qs = Q.depth_normal_pyramid(
            depth,
            levels,
            cfg.depth.distance_threshold,
            cfg.depth.difference_threshold,
            cfg.depth.focal,
            cfg.depth.lut_parity,
        )
        for l in range(levels):
            per_level_channels[l].append(qs[l])
    pyramid = []
    for l in range(levels):
        t = cfg.t_at_level[l]
        maps = [
            compute_response_maps(spread_orientations(q, t), cfg.response_lut)
            for q in per_level_channels[l]
        ]
        pyramid.append(jnp.concatenate(maps, axis=0))
    return tuple(pyramid)


def detect_frame_core(
    rgb: Optional[jnp.ndarray],
    depth: Optional[jnp.ndarray],
    kernels: Tuple[jnp.ndarray, ...],
    nfeats: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    cfg: DetectorConfig,
    threshold: float,
    apply_nms: bool = True,
    feats: Optional[Tuple[jnp.ndarray, ...]] = None,
    valids: Optional[Tuple[jnp.ndarray, ...]] = None,
):
    """Traceable detection step (no jit wrapper): quantize -> spread ->
    response -> dense similarity -> pyramid refine -> NMS.  Call this from
    shard_map / vmap compositions; use ``detect_frame`` standalone.

    Returns (tid, x, y, score, keep): (K,) arrays; keep marks surviving
    matches, score sorted descending.
    """
    pyramid = _build_response_pyramid_jax(rgb, depth, cfg)
    tid, x, y, score = _match_class(
        pyramid, kernels, nfeats, whs, tuple(cfg.t_at_level), threshold,
        cfg.top_k, feats, valids,
    )
    order = jnp.argsort(-score)
    tid, x, y, score = tid[order], x[order], y[order], score[order]
    if apply_nms:
        wh0 = whs[0][tid]
        boxes = jnp.stack([x, y, wh0[:, 0], wh0[:, 1]], axis=1).astype(jnp.float32)
        keep = nms_boxes(boxes, score, cfg.nms_iou)
    else:
        keep = score >= 0
    return tid, x, y, score, keep


@functools.partial(jax.jit, static_argnames=("cfg", "apply_nms"))
def detect_frame(
    rgb: Optional[jnp.ndarray],
    depth: Optional[jnp.ndarray],
    kernels: Tuple[jnp.ndarray, ...],
    nfeats: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    cfg: DetectorConfig,
    threshold: float,
    apply_nms: bool = True,
    feats: Optional[Tuple[jnp.ndarray, ...]] = None,
    valids: Optional[Tuple[jnp.ndarray, ...]] = None,
):
    """One fused detection step as a SINGLE compiled program — one device
    dispatch per frame (north-star requirement that detect(+refine) be one
    compiled path, SURVEY.md §6; also what keeps host<->device round trips
    off the critical path).  Honest chained-dispatch timing (bench.py
    methodology) on one TPU v5e: ~8.5 ms/frame for case1 VGA, 89
    templates x 2 modalities."""
    return detect_frame_core(
        rgb, depth, kernels, nfeats, whs, cfg, threshold, apply_nms, feats, valids
    )


class Detector:
    """Multi-modality multi-level template matcher.

    Equivalent surface to the reference pybind ``Detector``
    (linemodLevelup/pybind11.cpp:7-35): add_template, match, read/write
    (npz-based), num_templates, class_ids.
    """

    def __init__(self, cfg: Optional[DetectorConfig] = None):
        self.cfg = cfg or DetectorConfig()
        self.bank = TemplateBank(self.cfg)
        self._device_bank: Dict[str, tuple] = {}
        self._device_feats: Dict[str, tuple] = {}
        self._batch_fns: Dict[tuple, object] = {}

    def device_bank(self, class_id: str) -> tuple:
        """Per-level (kernels, nfeat, wh) tuples as device arrays, cached."""
        if class_id not in self._device_bank:
            bl = self.bank.finalized(class_id)
            self._device_bank[class_id] = (
                tuple(jnp.asarray(b.kernels) for b in bl),
                tuple(jnp.asarray(b.nfeat) for b in bl),
                tuple(jnp.asarray(b.wh) for b in bl),
            )
            self._device_feats[class_id] = (
                tuple(jnp.asarray(b.feats) for b in bl),
                tuple(jnp.asarray(b.valid) for b in bl),
            )
        return self._device_bank[class_id]

    # -- training -----------------------------------------------------------

    def add_template(
        self,
        class_id: str,
        rgb: np.ndarray,
        depth: Optional[np.ndarray],
        mask: np.ndarray,
        info: Optional[dict] = None,
    ) -> int:
        self.invalidate(class_id)
        return self.bank.add_template(class_id, rgb, depth, mask, info)

    def invalidate(self, class_id: str) -> None:
        """Drop cached device arrays / compiled closures for a class (call
        after mutating its bank out-of-band)."""
        self._device_bank.pop(class_id, None)
        self._device_feats.pop(class_id, None)
        self._batch_fns = {
            k: v for k, v in self._batch_fns.items() if k[0] != class_id
        }

    # -- inference ----------------------------------------------------------

    def build_response_pyramid(
        self, rgb: Optional[np.ndarray], depth: Optional[np.ndarray]
    ) -> List[jnp.ndarray]:
        """Quantize -> spread -> response maps per level (cpp:1726-1752).

        Returns per-level (C, H_l, W_l) uint8 arrays, C = 8 * modalities.
        """
        return list(
            _build_response_pyramid_jax(
                jnp.asarray(rgb) if rgb is not None else None,
                jnp.asarray(depth) if depth is not None else None,
                self.cfg,
            )
        )

    def match_arrays(
        self,
        rgb: Optional[np.ndarray],
        depth: Optional[np.ndarray],
        threshold: float,
        class_id: str,
        apply_nms: bool = True,
    ):
        """One fused-dispatch detection for one class; returns device arrays
        (tid, x, y, score, keep).  Use this from jit-composed pipelines."""
        kernels, nfeats, whs = self.device_bank(class_id)
        feats, valids = self._device_feats[class_id]
        return detect_frame(
            jnp.asarray(rgb) if rgb is not None else None,
            jnp.asarray(depth) if depth is not None else None,
            kernels,
            nfeats,
            whs,
            self.cfg,
            float(threshold),
            apply_nms,
            feats,
            valids,
        )

    def match_batch_arrays(
        self,
        rgb_batch,
        depth_batch,
        threshold: float,
        class_id: str,
        apply_nms: bool = True,
    ):
        """Fused detection over a BATCH of frames in one dispatch (vmap of
        the single-frame program; no reference analog — the reference
        loops frames in Python, linemod_and_levelup_test.py:309).

        Returns (tid, x, y, score, keep): (B, K) device arrays.
        """
        key = (class_id, bool(apply_nms))
        if key not in self._batch_fns:
            kernels, nfeats, whs = self.device_bank(class_id)
            feats, valids = self._device_feats[class_id]

            def one(r, d, thr):
                return detect_frame_core(
                    r, d, kernels, nfeats, whs, self.cfg,
                    thr, apply_nms, feats, valids,
                )

            self._batch_fns[key] = jax.jit(
                jax.vmap(one, in_axes=(0, 0, None))
            )
        rgb_b = jnp.asarray(rgb_batch)
        dep_b = (
            jnp.asarray(depth_batch)
            if depth_batch is not None
            else jnp.zeros(rgb_b.shape[:3], jnp.uint16)
        )
        return self._batch_fns[key](rgb_b, dep_b, jnp.float32(threshold))

    def match(
        self,
        rgb: Optional[np.ndarray],
        depth: Optional[np.ndarray],
        threshold: float,
        class_ids: Optional[Sequence[str]] = None,
        apply_nms: bool = True,
    ) -> List[Match]:
        """Detect all templates above ``threshold`` similarity.

        Reference: Detector::match (cpp:1702-1777) + driver NMS.
        One device dispatch + one host readback per class.
        """
        cids = list(class_ids) if class_ids else self.bank.class_ids()
        out: List[Match] = []
        for cid in cids:
            if self.bank.num_templates(cid) == 0:
                continue
            tid, x, y, score, keep = self.match_arrays(
                rgb, depth, threshold, cid, apply_nms
            )
            # Single host readback.
            tid_np, x_np, y_np, s_np, k_np = jax.device_get(
                (tid, x, y, score, keep)
            )
            for i in range(len(s_np)):
                if k_np[i] and s_np[i] >= 0:
                    out.append(
                        Match(
                            x=int(x_np[i]),
                            y=int(y_np[i]),
                            similarity=float(s_np[i]),
                            class_id=cid,
                            template_id=int(tid_np[i]),
                        )
                    )
        out.sort(key=lambda m: -m.similarity)
        return out

    # -- persistence (reference read/writeClasses, cpp:2013-2146) ------------

    def write_classes(self, path: str) -> None:
        self.bank.save(path)

    @classmethod
    def read_classes(cls, path: str, cfg: Optional[DetectorConfig] = None) -> "Detector":
        det = cls(cfg)
        det.bank = TemplateBank.load(path, det.cfg)
        return det

    def num_templates(self, class_id: Optional[str] = None) -> int:
        return self.bank.num_templates(class_id)

    def class_ids(self) -> List[str]:
        return self.bank.class_ids()
