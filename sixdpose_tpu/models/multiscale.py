"""Multi-scale matching: depth-histogram proposals + scaled template banks.

The reference's final multi-scale design (linemodLevelup/notes.md:44-63):
find ~5 candidate depths with a histogram + 1-D NMS, scale template
features once per depth, match each scaled set.  Its drivers implement
this by loading separate per-radius template files (test.cpp:116, 178).

TPU-first realization, fully fused in one jit program:

  scale proposal (ops/scale_proposal.py)
    -> shift-bucketed int8 matmul scoring of ALL (scale, template) pairs
       at the coarse level (ops/similarity.py
       similarity_multiscale_matmul; per-frame scatter-built weights, no
       prebuilt kernel banks)
    -> top-K over (scale, template, y, x)
    -> per-candidate feature-sparse local refinement (Pallas on TPU)
    -> NMS

so the scale sweep costs khb*kwb MXU matmuls instead of S separate
matches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.config import DetectorConfig
from sixdpose_tpu.models.detector import (
    Detector,
    Match,
    _build_response_pyramid_jax,
    _offset,
)
from sixdpose_tpu.ops.scale_proposal import bin_centers, propose_depth_bins, propose_depths
from sixdpose_tpu.ops.similarity import (
    _matmul_shift_sum_s2d,
    _s2d_maps,
    matmul_shift_sum,
    multiscale_weights_host,
    multiscale_weights_host_bin,
    score_normalize,
    similarity_local_sparse_auto,
    similarity_multiscale_matmul,
)
from sixdpose_tpu.ops.topk_nms import nms_boxes, topk_candidates


@dataclasses.dataclass
class ScaleMatch(Match):
    """A detection with its proposed depth and applied template scale."""

    depth_mm: float = 0.0
    scale: float = 1.0


def _refine_scaled_candidates(
    pyramid, feats, valids, whs, cfg, threshold, tmpl_idx, x, y, score,
    cand_scale,
):
    """Coarse-to-fine local refinement of flat candidate arrays with
    per-candidate scaled features (shared by the single- and multi-class
    multiscale cores)."""
    levels = cfg.pyramid_levels
    for l in range(levels - 2, -1, -1):
        t = cfg.t_at_level[l]
        border = 8 * t
        h_l, w_l = pyramid[l].shape[1:]
        wh_l = jnp.round(
            whs[l][tmpl_idx].astype(jnp.float32) * cand_scale[:, None]
        ).astype(jnp.int32)
        x = x * 2 + 1
        y = y * 2 + 1
        x = jnp.maximum(x, border)
        y = jnp.maximum(y, border)
        x = jnp.minimum(x, w_l - wh_l[:, 0] - border)
        y = jnp.minimum(y, h_l - wh_l[:, 1] - border)
        og_x = jnp.maximum(x // t - 8, 0)
        og_y = jnp.maximum(y // t - 8, 0)
        origins = jnp.stack([og_y * t, og_x * t], axis=1)

        raw_local, nf_sel = similarity_local_sparse_auto(
            pyramid[l],
            feats[l][tmpl_idx],
            valids[l][tmpl_idx],
            origins,
            t,
            scale=cand_scale,
            active=score >= 0,
        )
        local_scores = score_normalize(raw_local, jnp.maximum(nf_sel, 1))
        flat = local_scores.reshape(local_scores.shape[0], -1)
        best = jnp.argmax(flat, axis=1)
        best_r = best // 16
        best_c = best % 16
        new_score = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
        x = (og_x + best_c) * t + _offset(t)
        y = (og_y + best_r) * t + _offset(t)
        score = jnp.where(score >= 0, new_score, -1.0)
        score = jnp.where(score > threshold, score, -1.0)
    return x, y, score


def multiscale_detect_core(
    rgb,
    depth,
    feats: Tuple[jnp.ndarray, ...],
    valids: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    bin_scales: jnp.ndarray,
    cfg: DetectorConfig,
    threshold: float,
    num_scales: int,
    kdims: Tuple[Tuple[int, int], ...],
    apply_nms: bool = True,
    w_bins: Optional[jnp.ndarray] = None,
    nf_bins: Optional[jnp.ndarray] = None,
):
    """Traceable multi-scale detection (no jit wrapper — compose under
    shard_map / vmap; use ``_multiscale_detect`` standalone).

    Args:
      feats/valids/whs: per-level padded feature arrays ((N, F, 3), (N, F),
        (N, 2)).
      bin_scales: (NB,) float32 feature scale per depth bin.
      kdims: per-level static (kh, kw) covering the largest allowed scale
        (bounds for the scaled-feature clip; also used for the
        per-candidate refinement builds).
      w_bins/nf_bins: optional prebuilt per-depth-bin weight tables
        ((NB, khb*kwb, N, C*t*t) int8 / (NB, N) int32,
        ops/similarity.py multiscale_weights_host) — runtime selection
        is a contiguous slice per proposal instead of the ~10 ms
        on-device scatter build.

    Returns (tid, x, y, score, keep, depths, scales).
    """
    levels = cfg.pyramid_levels
    coarse = levels - 1
    t_c = cfg.t_at_level[coarse]
    n = feats[0].shape[0]
    s = num_scales

    pyramid = _build_response_pyramid_jax(rgb, depth, cfg)
    bin_idx, depths, counts = propose_depth_bins(depth, num_scales=num_scales)
    valid_scale = counts > 0
    scales = jnp.where(valid_scale, bin_scales[bin_idx], 0.0)

    # --- coarse level: shift-bucketed int8 matmuls over all
    # (scale, template) pairs — the reference's "different scales as
    # different objects" design (notes.md:58-63) costs khb*kwb MXU
    # matmuls.  With prebuilt per-bin weight tables selection is a
    # contiguous slice per proposal; without them the weights scatter-
    # build on device (memory-lean but ~10 ms for a 5x337 sweep).
    kh_c, kw_c = kdims[coarse]
    if w_bins is not None:
        khb, kwb = -(-kh_c // t_c), -(-kw_c // t_c)
        w_sel = jnp.concatenate(
            [
                jax.lax.dynamic_index_in_dim(w_bins, bin_idx[i], 0, keepdims=False)
                for i in range(s)
            ],
            axis=1,
        )  # (khb*kwb, S*N, C*t*t)
        nfeat_c = jnp.where(
            jnp.repeat(valid_scale, n),
            nf_bins[bin_idx].reshape(s * n),
            0,
        ).astype(jnp.int32)
        raw = matmul_shift_sum(pyramid[coarse], w_sel, t_c, khb, kwb)
    else:
        raw, nfeat_c = similarity_multiscale_matmul(
            pyramid[coarse], feats[coarse], valids[coarse], scales, t_c,
            kh_c, kw_c,
        )
    scores = score_normalize(raw, jnp.maximum(nfeat_c, 1))
    # Mask empty kernels and invalid scale proposals.
    ok = (nfeat_c > 0) & jnp.repeat(valid_scale, n)
    scores = jnp.where(ok[:, None, None], scores, -1.0)
    tid, yi, xi, score = topk_candidates(scores, threshold, cfg.top_k)
    x = xi * t_c + _offset(t_c)
    y = yi * t_c + _offset(t_c)

    scale_idx = tid // n
    tmpl_idx = tid % n
    cand_scale = scales[scale_idx]

    x, y, score = _refine_scaled_candidates(
        pyramid, feats, valids, whs, cfg, threshold, tmpl_idx, x, y, score,
        cand_scale,
    )

    order = jnp.argsort(-score)
    tmpl_idx, scale_idx, x, y, score, cand_scale = (
        tmpl_idx[order],
        scale_idx[order],
        x[order],
        y[order],
        score[order],
        cand_scale[order],
    )
    wh0 = jnp.round(
        whs[0][tmpl_idx].astype(jnp.float32) * cand_scale[:, None]
    ).astype(jnp.float32)
    if apply_nms:
        boxes = jnp.concatenate(
            [x[:, None].astype(jnp.float32), y[:, None].astype(jnp.float32), wh0],
            axis=1,
        )
        keep = nms_boxes(boxes, score, cfg.nms_iou)
    else:
        keep = score >= 0
    return tmpl_idx, x, y, score, keep, depths[scale_idx], cand_scale


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_scales", "kdims", "apply_nms"),
)
def _multiscale_detect(
    rgb,
    depth,
    feats,
    valids,
    whs,
    bin_scales,
    cfg: DetectorConfig,
    threshold: float,
    num_scales: int,
    kdims: Tuple[Tuple[int, int], ...],
    w_bins=None,
    nf_bins=None,
    apply_nms: bool = True,
):
    """Fused multi-scale detection (jit wrapper of the core)."""
    return multiscale_detect_core(
        rgb, depth, feats, valids, whs, bin_scales, cfg, threshold,
        num_scales, kdims, apply_nms=apply_nms, w_bins=w_bins,
        nf_bins=nf_bins,
    )


class MultiScaleDetector:
    """Depth-histogram multi-scale matcher over a single-radius bank.

    Wraps a trained :class:`Detector` whose templates were extracted at
    ``train_depth`` mm and matches them at histogram-proposed depths.
    """

    def __init__(
        self,
        detector: Detector,
        train_depth: float,
        num_scales: int = 5,
        bin_mm: int = 100,
        lo_mm: int = 400,
        hi_mm: int = 2000,
        table_budget_bytes: int = 2 << 30,
    ):
        self.det = detector
        self.cfg = detector.cfg
        self.train_depth = float(train_depth)
        self.num_scales = num_scales
        centers = bin_centers(bin_mm, lo_mm, hi_mm)
        self.bin_scales = (train_depth / centers).astype(np.float32)
        self.max_scale = float(self.bin_scales.max())
        self._arrays = {}
        # HBM budget for the prebuilt per-bin weight tables, summed over
        # classes.  One 337-template VGA bank costs ~0.8 GB; with many
        # classes the tables would exhaust HBM, so classes beyond the
        # budget fall back to the on-device scatter build (w_bins=None,
        # memory-lean, ~10 ms/frame slower) and least-recently-used
        # tables are evicted first.
        self.table_budget_bytes = int(table_budget_bytes)
        self._table_bytes: dict = {}  # class_id -> bytes (insertion = LRU order)

    def _feature_arrays(self, class_id: str):
        if class_id not in self._arrays:
            tmpls = self.det.bank.templates[class_id]
            levels = self.cfg.pyramid_levels
            feats_np, valids_np, whs_np, kdims = [], [], [], []
            for l in range(levels):
                fmax = max(len(t[l].features) for t in tmpls)
                n = len(tmpls)
                fa = np.zeros((n, fmax, 3), np.int32)
                va = np.zeros((n, fmax), bool)
                wh = np.zeros((n, 2), np.int32)
                for i, t in enumerate(tmpls):
                    f = t[l].features
                    fa[i, : len(f)] = f
                    va[i, : len(f)] = True
                    wh[i] = (t[l].width, t[l].height)
                feats_np.append(fa)
                valids_np.append(va)
                whs_np.append(wh)
                kh = int(np.ceil((wh[:, 1].max() + 1) * self.max_scale))
                kw = int(np.ceil((wh[:, 0].max() + 1) * self.max_scale))
                kdims.append((kh, kw))
            # Prebuild per-depth-bin matmul weights on the host (the
            # on-device scatter costs ~10 ms/frame; bins are discrete so
            # the tables build once — NB * khb*kwb * N * C*t*t int8,
            # ~0.8 GB for a 337-template VGA bank) — but only while the
            # summed table size stays inside ``table_budget_bytes``;
            # beyond that, evict LRU tables, and if this class alone
            # exceeds the budget use the scatter-build path (w_bins=None).
            coarse = levels - 1
            t_c = self.cfg.t_at_level[coarse]
            kh_c, kw_c = kdims[coarse]
            c = 8 * self.cfg.num_modalities
            khb, kwb = -(-kh_c // t_c), -(-kw_c // t_c)
            nb = len(self.bin_scales)
            table_bytes = (
                nb * khb * kwb * len(tmpls) * c * t_c * t_c  # w int8
                + nb * len(tmpls) * 4  # nf int32
            )
            w_dev = nf_dev = None
            if table_bytes <= self.table_budget_bytes:
                while (
                    self._table_bytes
                    and sum(self._table_bytes.values()) + table_bytes
                    > self.table_budget_bytes
                ):
                    evict = next(iter(self._table_bytes))
                    self._table_bytes.pop(evict)
                    old = self._arrays.pop(evict, None)
                    if old is not None:
                        self._arrays[evict] = old[:5] + (None, None)
                w_np, nf_np = multiscale_weights_host(
                    feats_np[coarse], valids_np[coarse], self.bin_scales,
                    t_c, kh_c, kw_c, c,
                )
                w_dev = jnp.asarray(w_np)
                nf_dev = jnp.asarray(nf_np)
                self._table_bytes[class_id] = table_bytes
            # Upload once; never read device arrays back (a D2H round trip
            # permanently drops tunneled devices from async to synchronous
            # dispatch, ~22 ms/call).
            feats = [jnp.asarray(a) for a in feats_np]
            valids = [jnp.asarray(a) for a in valids_np]
            whs = [jnp.asarray(a) for a in whs_np]
            self._arrays[class_id] = (
                tuple(feats),
                tuple(valids),
                tuple(whs),
                jnp.asarray(self.bin_scales),
                tuple(kdims),
                w_dev,
                nf_dev,
            )
        else:
            # LRU touch.
            if class_id in self._table_bytes:
                self._table_bytes[class_id] = self._table_bytes.pop(class_id)
        return self._arrays[class_id]

    def match(
        self,
        rgb: Optional[np.ndarray],
        depth: np.ndarray,
        threshold: float,
        class_id: str,
        apply_nms: bool = True,
    ) -> List[ScaleMatch]:
        feats, valids, whs, bs, kdims, w_bins, nf_bins = self._feature_arrays(
            class_id
        )
        tid, x, y, score, keep, depths, scales = _multiscale_detect(
            jnp.asarray(rgb) if rgb is not None else None,
            jnp.asarray(depth),
            feats,
            valids,
            whs,
            bs,
            self.cfg,
            float(threshold),
            self.num_scales,
            kdims,
            w_bins=w_bins,
            nf_bins=nf_bins,
            apply_nms=apply_nms,
        )
        tid, x, y, score, keep, depths, scales = jax.device_get(
            (tid, x, y, score, keep, depths, scales)
        )
        out = []
        for i in range(len(score)):
            if keep[i] and score[i] >= 0:
                out.append(
                    ScaleMatch(
                        x=int(x[i]),
                        y=int(y[i]),
                        similarity=float(score[i]),
                        class_id=class_id,
                        template_id=int(tid[i]),
                        depth_mm=float(depths[i]),
                        scale=float(scales[i]),
                    )
                )
        out.sort(key=lambda m: -m.similarity)
        return out


# ---------------------------------------------------------------------------
# One-dispatch multiscale x multiclass
# ---------------------------------------------------------------------------


def multiscale_multiclass_core(
    rgb,
    depth,
    feats,           # per level (N_total, F, 3) int32 — all classes concat
    valids,          # per level (N_total, F) bool
    whs,             # per level (N_total, 2) int32
    pad_map,         # (C, Nmax) int32 global template ids, -1 = pad
    cls_kb,          # (C, 2) int32 per-class coarse (khb, kwb) block dims
    bin_scales,
    cfg: DetectorConfig,
    threshold,
    num_scales: int,
    kdims: Tuple[Tuple[int, int], ...],
    top_k: int,
    apply_nms: bool = True,
    w_bins: Optional[jnp.ndarray] = None,
    nf_bins: Optional[jnp.ndarray] = None,
    pad_kb: Optional[Tuple[int, int]] = None,
):
    """Traceable multiscale detection over EVERY class in one program.

    The reference scores all classes inside one ``match()`` call
    (linemodLevelup.cpp:1753-1769) and handles scale by loading separate
    per-radius template files (test.cpp:116,178).  Here the whole
    (class x scale x template) sweep is ONE coarse matmul stack over the
    concatenated superbank, candidates are selected per class inside the
    dispatch, all C*K candidates refine together, and per-class NMS runs
    vmapped — one dispatch, one readback for any number of classes at any
    number of proposed depths.

    Returns (tid_local, x, y, score, keep, depth_mm, scale): (C, K) arrays;
    tid_local is the within-class template index.
    """
    levels = cfg.pyramid_levels
    coarse = levels - 1
    t_c = cfg.t_at_level[coarse]
    n = feats[0].shape[0]
    s = num_scales
    c_n, nmax = pad_map.shape

    pyramid = _build_response_pyramid_jax(rgb, depth, cfg)
    bin_idx, depths, counts = propose_depth_bins(depth, num_scales=s)
    valid_scale = counts > 0
    scales = jnp.where(valid_scale, bin_scales[bin_idx], 0.0)

    kh_c, kw_c = kdims[coarse]
    khb, kwb = -(-kh_c // t_c), -(-kw_c // t_c)
    # The shift-sum grid only covers anchors where the GLOBAL (max over
    # classes) kernel window fits; a class with a smaller template would
    # lose its border anchors.  Zero-pad the coarse maps bottom/right so
    # every PER-CLASS anchor is covered (zero responses contribute
    # nothing), then mask each class back to its OWN anchor range below —
    # exact per-class-detector coverage from one global sweep.  Padding
    # by (khb - min_class_khb) is sufficient (class c's anchors run to
    # hb0 - khb_c; the padded global range hb0 + pad - khb covers them
    # for every c when pad >= khb - min_c khb_c); callers pass the
    # static ``pad_kb`` — the conservative (khb-1, kwb-1) default is the
    # all-blocks-are-anchors fallback, 1.4x more matmul positions for a
    # same-extent bank.
    pb, qb = pad_kb if pad_kb is not None else (khb - 1, kwb - 1)
    maps_c = jnp.pad(
        pyramid[coarse],
        ((0, 0), (0, pb * t_c), (0, qb * t_c)),
    )
    if w_bins is not None:
        nfeat_c = jnp.where(
            jnp.repeat(valid_scale, n),
            nf_bins[bin_idx].reshape(s * n),
            0,
        ).astype(jnp.int32)
        if isinstance(w_bins, (tuple, list)):
            # Per-bin table LIST (MultiScaleMultiClass): each scale slot
            # picks its bin's (khb*kwb, N, ct2) table with lax.switch and
            # runs its own shift-sum matmul — no (khb*kwb, S*N, ct2)
            # gather ever materializes (3.4 GB at a 15-class sweep), and
            # the resident table is 16 moderate buffers instead of one
            # ~12 GB array.
            maps_i = _s2d_maps(maps_c, t_c).astype(jnp.int8)
            hb_i, wb_i = maps_i.shape[1:]
            branches = [lambda a=a: a for a in w_bins]
            raws = [
                _matmul_shift_sum_s2d(
                    maps_i,
                    jax.lax.switch(
                        jnp.clip(bin_idx[i], 0, len(w_bins) - 1), branches
                    ),
                    khb, kwb,
                )
                for i in range(s)
            ]
            raw = (
                jnp.concatenate(raws, axis=0)
                .reshape(s * n, hb_i - khb + 1, wb_i - kwb + 1)
                .astype(jnp.float32)
            )
        else:
            w_sel = jnp.concatenate(
                [
                    jax.lax.dynamic_index_in_dim(
                        w_bins, bin_idx[i], 0, keepdims=False
                    )
                    for i in range(s)
                ],
                axis=1,
            )  # (khb*kwb, S*N, C*t*t)
            raw = matmul_shift_sum(maps_c, w_sel, t_c, khb, kwb)
    else:
        raw, nfeat_c = similarity_multiscale_matmul(
            maps_c, feats[coarse], valids[coarse], scales, t_c,
            kh_c, kw_c,
        )
    scores = score_normalize(raw, jnp.maximum(nfeat_c, 1))  # (S*N, Hb, Wb)
    ok = (nfeat_c > 0) & jnp.repeat(valid_scale, n)
    scores = jnp.where(ok[:, None, None], scores, -1.0)

    # --- per-class (scale x template) candidate selection ----------------
    # Gather each class's rows across every scale: (C, S*Nmax, Hb, Wb)
    # scratch — the same padded-index-map trick as the single-scale
    # multiclass core (models/multiclass.py).
    pm = jnp.maximum(pad_map, 0)                       # (C, Nmax)
    ids = (
        jnp.arange(s, dtype=jnp.int32)[None, :, None] * n + pm[:, None, :]
    ).reshape(c_n, s * nmax)
    cls_scores = scores[ids]                           # (C, S*Nmax, Hb, Wb)
    pad_ok = jnp.tile(pad_map >= 0, (1, s)).reshape(c_n, s * nmax)
    cls_scores = jnp.where(pad_ok[:, :, None, None], cls_scores, -1.0)
    # Per-class anchor-range mask (see the padding note above): class c
    # keeps anchors yi < Hb - khb_c + 1, xi < Wb - kwb_c + 1 where
    # Hb/Wb are the ORIGINAL (unpadded) block counts.
    hb0 = -(-pyramid[coarse].shape[1] // t_c)
    wb0 = -(-pyramid[coarse].shape[2] // t_c)
    yi_g = jnp.arange(cls_scores.shape[2])[None, None, :, None]
    xi_g = jnp.arange(cls_scores.shape[3])[None, None, None, :]
    in_range = (
        (yi_g <= hb0 - cls_kb[:, 0][:, None, None, None])
        & (xi_g <= wb0 - cls_kb[:, 1][:, None, None, None])
    )
    cls_scores = jnp.where(in_range, cls_scores, -1.0)

    tid_sc, yi, xi, score = jax.vmap(
        lambda sc: topk_candidates(sc, threshold, top_k)
    )(cls_scores)                                      # (C, K) each
    x = xi * t_c + _offset(t_c)
    y = yi * t_c + _offset(t_c)

    scale_idx = tid_sc // nmax                         # (C, K) depth bin slot
    tid_local = tid_sc % nmax                          # within-class template
    gid = jnp.take_along_axis(pm, tid_local, axis=1)   # global template id
    cand_scale = scales[scale_idx]

    # --- joint refinement of all C*K candidates --------------------------
    flat = lambda a: a.reshape(c_n * top_k, *a.shape[2:])
    xf, yf, scf = _refine_scaled_candidates(
        pyramid, feats, valids, whs, cfg, threshold,
        flat(gid), flat(x), flat(y), flat(score), flat(cand_scale),
    )
    unflat = lambda a: a.reshape(c_n, top_k, *a.shape[1:])
    x, y, score = unflat(xf), unflat(yf), unflat(scf)

    # --- per-class sort + NMS --------------------------------------------
    order = jnp.argsort(-score, axis=1)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    tid_local, scale_idx, x, y, score, cand_scale = (
        take(tid_local), take(scale_idx), take(x), take(y), take(score),
        take(cand_scale),
    )
    gid = jnp.take_along_axis(pm, tid_local, axis=1)
    wh0 = jnp.round(
        whs[0][gid].astype(jnp.float32) * cand_scale[..., None]
    ).astype(jnp.float32)
    if apply_nms:
        boxes = jnp.concatenate(
            [x[..., None].astype(jnp.float32),
             y[..., None].astype(jnp.float32), wh0], axis=-1,
        )
        keep = jax.vmap(nms_boxes, in_axes=(0, 0, None))(
            boxes, score, cfg.nms_iou
        )
    else:
        keep = score >= 0
    return tid_local, x, y, score, keep, depths[scale_idx], cand_scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "num_scales", "kdims", "top_k", "pad_kb", "apply_nms"
    ),
)
def _multiscale_multiclass(
    rgb, depth, feats, valids, whs, pad_map, cls_kb, bin_scales, cfg,
    threshold, num_scales, kdims, top_k, w_bins=None, nf_bins=None,
    pad_kb=None, apply_nms=True,
):
    return multiscale_multiclass_core(
        rgb, depth, feats, valids, whs, pad_map, cls_kb, bin_scales, cfg,
        threshold, num_scales, kdims, top_k, apply_nms=apply_nms,
        w_bins=w_bins, nf_bins=nf_bins, pad_kb=pad_kb,
    )


class MultiScaleMultiClass:
    """One-dispatch multiscale matching over every class of a bank.

    Concatenates per-class feature arrays into a padded superbank (like
    models/multiclass.py MultiClassMatcher) and prebuilds ONE global
    per-depth-bin weight table when it fits ``table_budget_bytes``
    (otherwise the coarse sweep scatter-builds weights on device,
    memory-lean but slower per frame).
    """

    def __init__(
        self,
        detector: Detector,
        train_depth: float,
        class_ids: Optional[List[str]] = None,
        num_scales: int = 5,
        bin_mm: int = 100,
        lo_mm: int = 400,
        hi_mm: int = 2000,
        table_budget_bytes: int = 2 << 30,
    ):
        self.det = detector
        self.cfg = detector.cfg
        self.class_ids = list(class_ids or detector.class_ids())
        self.train_depth = float(train_depth)
        self.num_scales = num_scales
        centers = bin_centers(bin_mm, lo_mm, hi_mm)
        self.bin_scales_np = (train_depth / centers).astype(np.float32)
        self.max_scale = float(self.bin_scales_np.max())
        self._build(table_budget_bytes)

    def _build(self, table_budget_bytes: int) -> None:
        levels = self.cfg.pyramid_levels
        per_class = [self.det.bank.templates[c] for c in self.class_ids]
        counts = [len(t) for t in per_class]
        nmax = max(counts)
        c_n = len(per_class)

        feats_np, valids_np, whs_np, kdims = [], [], [], []
        for l in range(levels):
            fmax = max(
                len(t[l].features) for tmpls in per_class for t in tmpls
            )
            fa, va, wh = [], [], []
            for tmpls in per_class:
                for t in tmpls:
                    f = np.asarray(t[l].features)
                    fa.append(np.pad(f, ((0, fmax - len(f)), (0, 0))))
                    va.append(
                        np.concatenate(
                            [np.ones(len(f), bool),
                             np.zeros(fmax - len(f), bool)]
                        )
                    )
                    wh.append((t[l].width, t[l].height))
            feats_np.append(np.asarray(fa, np.int32))
            valids_np.append(np.asarray(va))
            whs_np.append(np.asarray(wh, np.int32))
            kh = int(np.ceil((whs_np[l][:, 1].max() + 1) * self.max_scale))
            kw = int(np.ceil((whs_np[l][:, 0].max() + 1) * self.max_scale))
            kdims.append((kh, kw))

        pad_map = np.full((c_n, nmax), -1, np.int32)
        start = 0
        for ci, cnt in enumerate(counts):
            pad_map[ci, :cnt] = np.arange(start, start + cnt)
            start += cnt

        coarse = levels - 1
        t_c = self.cfg.t_at_level[coarse]
        # Per-class coarse anchor ranges: each class's own max template
        # extent at max scale, in t-blocks (the per-class detector's grid).
        cls_kb = np.zeros((c_n, 2), np.int32)
        start = 0
        for ci, cnt in enumerate(counts):
            wh_c = whs_np[coarse][start : start + cnt]
            kh_c_cls = int(np.ceil((wh_c[:, 1].max() + 1) * self.max_scale))
            kw_c_cls = int(np.ceil((wh_c[:, 0].max() + 1) * self.max_scale))
            cls_kb[ci] = (-(-kh_c_cls // t_c), -(-kw_c_cls // t_c))
            start += cnt
        self.cls_kb = jnp.asarray(cls_kb)
        # Static map padding: cover every class's own anchor range (see
        # multiscale_multiclass_core), no more.
        kh_glob, kw_glob = kdims[coarse]
        khb_g, kwb_g = -(-kh_glob // t_c), -(-kw_glob // t_c)
        self.pad_kb = (
            int(khb_g - cls_kb[:, 0].min()),
            int(kwb_g - cls_kb[:, 1].min()),
        )
        kh_c, kw_c = kdims[coarse]
        c = 8 * self.cfg.num_modalities
        khb, kwb = -(-kh_c // t_c), -(-kw_c // t_c)
        nb = len(self.bin_scales_np)
        n_total = feats_np[coarse].shape[0]
        table_bytes = nb * khb * kwb * n_total * c * t_c * t_c + nb * n_total * 4
        self.w_bins = self.nf_bins = None
        if table_bytes <= table_budget_bytes:
            # Build + upload PER BIN: the 15-class LINEMOD-scale table is
            # ~12 GB — as one array it cannot be staged (host copy +
            # device copy in flight), as 16 per-bin buffers it streams.
            w_list = []
            nf_np = np.zeros((nb, n_total), np.int32)
            for bi, sc in enumerate(self.bin_scales_np):
                w_b, nf_b = multiscale_weights_host_bin(
                    feats_np[coarse], valids_np[coarse], float(sc),
                    t_c, kh_c, kw_c, c,
                )
                w_list.append(jax.device_put(jnp.asarray(w_b)))
                nf_np[bi] = nf_b
            self.w_bins = tuple(w_list)
            self.nf_bins = jnp.asarray(nf_np)

        self.feats = tuple(jnp.asarray(a) for a in feats_np)
        self.valids = tuple(jnp.asarray(a) for a in valids_np)
        self.whs = tuple(jnp.asarray(a) for a in whs_np)
        self.pad_map = jnp.asarray(pad_map)
        self.bin_scales = jnp.asarray(self.bin_scales_np)
        self.kdims = tuple(kdims)
        self.table_bytes = int(table_bytes)

    def match_arrays(self, rgb, depth, threshold: float,
                     apply_nms: bool = True):
        """(C, K) device arrays (tid_local, x, y, score, keep, depth_mm,
        scale) ordered like ``class_ids`` — ONE dispatch, no readback."""
        return _multiscale_multiclass(
            jnp.asarray(rgb) if rgb is not None else None,
            jnp.asarray(depth),
            self.feats, self.valids, self.whs, self.pad_map, self.cls_kb,
            self.bin_scales, self.cfg, jnp.float32(threshold),
            self.num_scales, self.kdims, self.cfg.top_k,
            w_bins=self.w_bins, nf_bins=self.nf_bins, pad_kb=self.pad_kb,
            apply_nms=apply_nms,
        )

    def match(self, rgb, depth, threshold: float,
              apply_nms: bool = True) -> List[ScaleMatch]:
        out = jax.device_get(
            self.match_arrays(rgb, depth, threshold, apply_nms=apply_nms)
        )
        tid, x, y, score, keep, depths, scales = out
        res: List[ScaleMatch] = []
        for ci, cid in enumerate(self.class_ids):
            for i in range(tid.shape[1]):
                if keep[ci, i] and score[ci, i] >= 0:
                    res.append(
                        ScaleMatch(
                            x=int(x[ci, i]),
                            y=int(y[ci, i]),
                            similarity=float(score[ci, i]),
                            class_id=cid,
                            template_id=int(tid[ci, i]),
                            depth_mm=float(depths[ci, i]),
                            scale=float(scales[ci, i]),
                        )
                    )
        res.sort(key=lambda m: -m.similarity)
        return res
