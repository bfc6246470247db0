"""Sharded detection: data-parallel scenes x template-parallel bank.

Design (SURVEY.md §2.5 / §7 step 6):

- The scene batch shards over the ``data`` mesh axis (independent frames,
  no communication).
- The template bank (templates axis N of every per-level kernel stack)
  shards over the ``template`` axis.  Each shard scores its sub-bank
  against the (replicated-per-data-shard) response pyramid, refines its
  own top-K locally, then the K candidates per shard are merged with one
  ``all_gather`` over ``template`` + a local re-top-K — a distributed
  top-K whose payload is K tuples per shard, not the similarity map, so
  the merge is off the critical path.
- NMS runs on the merged candidate set per frame.

All collectives are XLA collectives inside ``shard_map`` — on hardware
they ride ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sixdpose_tpu.config import DetectorConfig
from sixdpose_tpu.models.detector import detect_frame_core
from sixdpose_tpu.ops.topk_nms import nms_boxes


def pad_templates(arrays: Tuple[np.ndarray, ...], shards: int):
    """Pad the template axis (axis 0) of bank arrays to a multiple of
    ``shards``.  Padded kernels are all-zero with nfeat forced to 1, so
    their scores are 0 and they never reach the threshold."""
    out = []
    for a in arrays:
        n = a.shape[0]
        pad = (-n) % shards
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        out.append(a)
    return tuple(out)


def _merge_topk(tid, x, y, score, k: int):
    """Merge (S, K) per-shard candidates into global top-k per frame."""
    flat_score = score.reshape(-1)
    top_score, idx = jax.lax.top_k(flat_score, k)
    take = lambda a: a.reshape(-1)[idx]
    return take(tid), take(x), take(y), top_score


def sharded_detect(
    mesh: Mesh,
    rgb_batch: jnp.ndarray,
    depth_batch,
    kernels: Tuple[jnp.ndarray, ...],
    nfeats: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    cfg: DetectorConfig,
    threshold: float,
    feats: Tuple[jnp.ndarray, ...] = None,
    valids: Tuple[jnp.ndarray, ...] = None,
):
    """Detect over a batch of frames on a (data, template[, tile]) mesh.

    Args:
      rgb_batch: (B, H, W, 3) uint8, B divisible by mesh 'data' size.
      depth_batch: (B, H, W) uint16 or None.
      kernels/nfeats/whs: per-level bank arrays; template axis divisible
        by mesh 'template' size (use ``pad_templates``).
      feats/valids: optional per-level padded feature lists ((N, F, 3),
        (N, F)) sharded like the kernels — enables the feature-sparse
        scoring/refinement paths (Pallas on TPU).

    Returns (tid, x, y, score, keep): (B, K) arrays.
    """
    n_template = mesh.shape["template"]
    top_k = cfg.top_k

    has_depth = depth_batch is not None
    has_sparse = feats is not None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("data"),
            P("data") if has_depth else None,
            P("template"),
            P("template"),
            P("template"),
            P("template") if has_sparse else None,
            P("template") if has_sparse else None,
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    def step(rgb_s, dep_s, kern_s, nf_s, wh_s, feat_s, val_s):
        n_local = kern_s[0].shape[0]
        t_idx = jax.lax.axis_index("template")

        def one(rgb, dep):
            tid, x, y, score, _ = detect_frame_core(
                rgb if cfg.use_color else None,
                dep,
                kern_s,
                nf_s,
                wh_s,
                cfg,
                threshold,
                apply_nms=False,
                feats=feat_s,
                valids=val_s,
            )
            return tid + t_idx * n_local, x, y, score

        deps = dep_s if has_depth else jnp.zeros(
            rgb_s.shape[:3], jnp.uint16
        )
        tid, x, y, score = jax.vmap(one)(rgb_s, deps)  # (B_l, K) each

        # Distributed top-K: gather each shard's K candidates, re-top-K.
        g = jax.lax.all_gather((tid, x, y, score), "template")  # (S, B_l, K)
        gt, gx, gy, gs = jax.tree.map(lambda a: a.swapaxes(0, 1), g)  # (B_l, S, K)
        mtid, mx, my, mscore = jax.vmap(
            lambda a, b, c, d: _merge_topk(a, b, c, d, top_k)
        )(gt, gx, gy, gs)

        # Box NMS per frame on merged candidates (wh needs the global
        # template table: gather it too).
        wh0_all = jax.lax.all_gather(wh_s[0], "template").reshape(-1, 2)
        wh_sel = wh0_all[mtid]
        boxes = jnp.concatenate(
            [mx[..., None], my[..., None], wh_sel], axis=-1
        ).astype(jnp.float32)
        keep = jax.vmap(lambda b, s: nms_boxes(b, s, cfg.nms_iou))(boxes, mscore)
        return mtid, mx, my, mscore, keep

    return step(
        rgb_batch,
        depth_batch if has_depth else None,
        kernels,
        nfeats,
        whs,
        feats if has_sparse else None,
        valids if has_sparse else None,
    )


def sharded_detect_jit(mesh, cfg, threshold):
    """Returns a jitted closure of sharded_detect for repeated use."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(rgb_batch, depth_batch, kernels, nfeats, whs, feats=None, valids=None):
        return sharded_detect(
            mesh, rgb_batch, depth_batch, kernels, nfeats, whs, cfg, threshold,
            feats, valids,
        )

    return fn


def sharded_multiscale_detect(
    mesh: Mesh,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    feats: Tuple[jnp.ndarray, ...],
    valids: Tuple[jnp.ndarray, ...],
    whs: Tuple[jnp.ndarray, ...],
    bin_scales: jnp.ndarray,
    cfg: DetectorConfig,
    threshold: float,
    num_scales: int,
    kdims,
):
    """Multi-scale detection with the bank sharded over ``template``.

    Each shard runs the full fused multiscale pipeline (proposal ->
    row-gather scoring -> refinement) on its sub-bank, then the per-shard
    top-K candidates merge with one all_gather + re-top-K and a global
    NMS — same structure as ``sharded_detect`` (the multiscale tables
    were previously replicated).

    feats/valids/whs: per-level arrays with the template axis divisible
    by the mesh 'template' size (``pad_templates``).

    Returns (tid, x, y, score, keep, depth_mm, scale): (K,) arrays with
    tid in GLOBAL template indices.
    """
    from sixdpose_tpu.models.multiscale import multiscale_detect_core

    top_k = cfg.top_k

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            P("template"),
            P("template"),
            P("template"),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )
    def step(rgb_s, dep_s, feat_s, val_s, wh_s, bs_s):
        n_local = feat_s[0].shape[0]
        t_idx = jax.lax.axis_index("template")
        tid, x, y, score, _keep, dep_mm, scale = multiscale_detect_core(
            rgb_s, dep_s, feat_s, val_s, wh_s, bs_s, cfg, threshold,
            num_scales, kdims, apply_nms=False,
        )
        tid = tid + t_idx * n_local
        g = jax.lax.all_gather((tid, x, y, score, dep_mm, scale), "template")
        gt, gx, gy, gs, gd, gsc = jax.tree.map(lambda a: a.reshape(-1), g)
        top_score, idx = jax.lax.top_k(gs, top_k)
        take = lambda a: a[idx]
        mtid, mx, my, md, msc = take(gt), take(gx), take(gy), take(gd), take(gsc)

        wh0_all = jax.lax.all_gather(wh_s[0], "template").reshape(-1, 2)
        wh_sel = jnp.round(
            wh0_all[mtid].astype(jnp.float32) * msc[:, None]
        ).astype(jnp.float32)
        boxes = jnp.concatenate(
            [mx[:, None].astype(jnp.float32), my[:, None].astype(jnp.float32),
             wh_sel], axis=1,
        )
        keep = nms_boxes(boxes, top_score, cfg.nms_iou)
        return mtid, mx, my, top_score, keep, md, msc

    return step(rgb, depth, feats, valids, whs, bin_scales)
