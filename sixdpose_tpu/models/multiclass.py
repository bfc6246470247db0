"""Single-dispatch multi-class matching.

The reference scores all classes inside one ``match()`` call but loops
them serially on the CPU (linemodLevelup.cpp:1753-1769); round 1 of this
framework looped classes in Python — one device dispatch and one host
readback PER CLASS (models/detector.py match).  At 15 LINEMOD objects
that is 15 dispatches and 15 syncs per frame.

Here the per-class kernel stacks are concatenated into one padded
superbank (one conv / one matmul scores every template of every class),
candidates are selected PER CLASS inside the dispatch (vmapped top-k over
a (C, Nmax) padded index map), all C*K candidates refine together down
the pyramid, and per-class NMS runs vmapped — one dispatch, one readback
for any number of classes.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.config import DetectorConfig
from sixdpose_tpu.models.detector import (
    Detector,
    Match,
    _build_response_pyramid_jax,
    _offset,
    pyramid_refine,
)
from sixdpose_tpu.ops.similarity import (
    score_normalize,
    similarity_dense,
    similarity_multiscale_matmul,
)
from sixdpose_tpu.ops.topk_nms import nms_boxes, topk_candidates


def match_multiclass_core(
    response_pyramid,
    kernels,         # per level (N_total, C, KH, KW) int8
    nfeats,          # per level (N_total,)
    whs,             # per level (N_total, 2)
    feats,           # per level (N_total, F, 3) or None
    valids,
    pad_map,         # (C, Nmax) int32 global template ids, -1 = pad
    t_at_level: Tuple[int, ...],
    threshold,
    top_k: int,
    nmax: int,
    nms_iou: float,
):
    """Score all classes in one program; per-class top-k + refine + NMS.

    Returns (tid_local, x, y, score, keep): (C, K) arrays; tid_local is
    the within-class template index.
    """
    coarse = len(t_at_level) - 1
    t_c = t_at_level[coarse]

    n_k, c_k, kh_c, kw_c = kernels[coarse].shape
    hb = -(-response_pyramid[coarse].shape[1] // t_c)
    wb = -(-response_pyramid[coarse].shape[2] // t_c)
    conv_macs = n_k * hb * wb * c_k * kh_c * kw_c
    if feats is not None and conv_macs > 2e10:
        raw, nf_c = similarity_multiscale_matmul(
            response_pyramid[coarse], feats[coarse], valids[coarse],
            jnp.ones((1,), jnp.float32), t_c, kh_c, kw_c,
        )
        scores = score_normalize(raw, jnp.maximum(nf_c, 1))
        scores = jnp.where(nf_c[:, None, None] > 0, scores, -1.0)
    else:
        raw = similarity_dense(response_pyramid[coarse], kernels[coarse], t_c)
        scores = score_normalize(raw, nfeats[coarse])

    # Per-class candidate selection: pad classes to Nmax via the index
    # map (24 MB scratch at 15x337xVGA-coarse — cheap) and vmap top-k.
    safe = jnp.maximum(pad_map, 0)
    padded = scores[safe]                       # (C, Nmax, hb, wb)
    padded = jnp.where(
        (pad_map >= 0)[:, :, None, None], padded, -1.0
    )
    tid_l, yi, xi, score = jax.vmap(
        lambda s: topk_candidates(s, threshold, top_k)
    )(padded)                                    # each (C, K)
    c_n = pad_map.shape[0]
    x = xi * t_c + _offset(t_c)
    y = yi * t_c + _offset(t_c)

    # Global template ids; refine all C*K candidates together.
    gid = jnp.take_along_axis(safe, tid_l, axis=1)  # (C, K)
    flat = lambda a: a.reshape(c_n * top_k, *a.shape[2:])
    gid_f, x_f, y_f, score_f = flat(gid), flat(x), flat(y), flat(score)
    gid_f2, x_f, y_f, score_f = pyramid_refine(
        response_pyramid, kernels, nfeats, whs, t_at_level, threshold,
        gid_f, x_f, y_f, score_f, feats, valids,
    )
    x = x_f.reshape(c_n, top_k)
    y = y_f.reshape(c_n, top_k)
    score = score_f.reshape(c_n, top_k)

    # Per-class sort + NMS (driver NMS in the reference is per match
    # list; matches of different classes never suppress each other).
    order = jnp.argsort(-score, axis=1)
    tid_l = jnp.take_along_axis(tid_l, order, axis=1)
    gid = jnp.take_along_axis(gid, order, axis=1)
    x = jnp.take_along_axis(x, order, axis=1)
    y = jnp.take_along_axis(y, order, axis=1)
    score = jnp.take_along_axis(score, order, axis=1)
    wh0 = whs[0][gid]                            # (C, K, 2)
    boxes = jnp.concatenate(
        [x[..., None], y[..., None], wh0], axis=-1
    ).astype(jnp.float32)
    keep = jax.vmap(lambda b, s: nms_boxes(b, s, nms_iou))(boxes, score)
    return tid_l, x, y, score, keep


_match_multiclass = functools.partial(
    jax.jit, static_argnames=("t_at_level", "top_k", "nmax", "nms_iou")
)(match_multiclass_core)


class MultiClassMatcher:
    """One-dispatch matching over every class of a detector's bank."""

    def __init__(self, detector: Detector, class_ids: Optional[Sequence[str]] = None):
        self.det = detector
        self.cfg = detector.cfg
        self.class_ids = list(class_ids or detector.class_ids())
        if not self.class_ids:
            raise ValueError("no classes in bank")
        self._build()

    def _build(self) -> None:
        levels = self.cfg.pyramid_levels
        per_class = [self.det.bank.finalized(c) for c in self.class_ids]
        counts = [b[0].kernels.shape[0] for b in per_class]
        nmax = max(counts)
        c_n = len(per_class)

        kernels, nfeats, whs, feats, valids = [], [], [], [], []
        for l in range(levels):
            khm = max(b[l].kernels.shape[2] for b in per_class)
            kwm = max(b[l].kernels.shape[3] for b in per_class)
            fm = max(b[l].feats.shape[1] for b in per_class)
            ks, nf, wh, ft, vl = [], [], [], [], []
            for b in per_class:
                k = b[l].kernels
                k = np.pad(
                    k,
                    ((0, 0), (0, 0), (0, khm - k.shape[2]), (0, kwm - k.shape[3])),
                )
                ks.append(k)
                nf.append(b[l].nfeat)
                wh.append(b[l].wh)
                f = b[l].feats
                ft.append(np.pad(f, ((0, 0), (0, fm - f.shape[1]), (0, 0))))
                v = b[l].valid
                vl.append(np.pad(v, ((0, 0), (0, fm - v.shape[1]))))
            kernels.append(jnp.asarray(np.concatenate(ks)))
            nfeats.append(jnp.asarray(np.concatenate(nf)))
            whs.append(jnp.asarray(np.concatenate(wh)))
            feats.append(jnp.asarray(np.concatenate(ft)))
            valids.append(jnp.asarray(np.concatenate(vl)))

        pad_map = np.full((c_n, nmax), -1, np.int32)
        start = 0
        for ci, cnt in enumerate(counts):
            pad_map[ci, :cnt] = np.arange(start, start + cnt)
            start += cnt
        self.kernels = tuple(kernels)
        self.nfeats = tuple(nfeats)
        self.whs = tuple(whs)
        self.feats = tuple(feats)
        self.valids = tuple(valids)
        self.pad_map = jnp.asarray(pad_map)
        self.nmax = nmax

    def match_arrays(self, rgb, depth, threshold: float):
        """One dispatch for all classes.  Returns (tid_local, x, y,
        score, keep): (C, K) device arrays ordered like ``class_ids``."""
        pyramid = _build_response_pyramid_jax(
            jnp.asarray(rgb) if rgb is not None else None,
            jnp.asarray(depth) if depth is not None else None,
            self.cfg,
        )
        return _match_multiclass(
            pyramid, self.kernels, self.nfeats, self.whs, self.feats,
            self.valids, self.pad_map, tuple(self.cfg.t_at_level),
            jnp.float32(threshold), self.cfg.top_k, self.nmax,
            self.cfg.nms_iou,
        )

    def match(self, rgb, depth, threshold: float) -> List[Match]:
        """Reference ``Detector::match`` over every class — ONE dispatch,
        ONE readback (cpp:1753-1769 scores classes inside one call)."""
        out = self.match_arrays(rgb, depth, threshold)
        tid, x, y, score, keep = map(np.asarray, out)
        matches: List[Match] = []
        for ci, cid in enumerate(self.class_ids):
            for i in range(tid.shape[1]):
                if keep[ci, i] and score[ci, i] >= 0:
                    matches.append(
                        Match(
                            x=int(x[ci, i]),
                            y=int(y[ci, i]),
                            similarity=float(score[ci, i]),
                            class_id=cid,
                            template_id=int(tid[ci, i]),
                        )
                    )
        matches.sort(key=lambda m: -m.similarity)
        return matches
