"""Fixed-K candidate selection and box NMS, jit-compatible.

The reference collects candidates with a dynamic std::vector scan over the
similarity map (linemodLevelup.cpp:1836-1852) and dedupes matches with
sort+unique (cpp:1771-1774) plus driver-side box NMS
(linemod_and_levelup_test.py:34-61, cv::dnn::NMSBoxes in test.cpp:144).
On TPU, dynamic shapes are replaced by fixed-K ``lax.top_k`` with score
masking, and NMS by a masked O(K^2) suppression sweep — K is small
(default 128) so the sweep is negligible.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "exact"))
def topk_candidates(
    scores: jnp.ndarray, threshold: float, k: int, exact: bool = False
):
    """Top-k (template, y, x) candidates above a score threshold.

    Args:
      scores: (N, H, W) float32 normalized scores.
      threshold: minimum score (reference ``score > threshold``, cpp:1843).
      k: fixed candidate budget.
      exact: force exact ``lax.top_k`` even on TPU at large sizes (for
        reproducible evaluation runs); also forced globally by setting
        ``SIXDPOSE_EXACT_TOPK=1`` in the environment.

    Returns:
      tid, y, x: (k,) int32 indices; score: (k,) float32 (-1 where invalid).
    """
    n, h, w = scores.shape
    flat = scores.reshape(-1)
    flat = jnp.where(flat > threshold, flat, -1.0)
    # TPU approx_max_k runs ~20x faster than exact top_k on large inputs
    # (1.4 -> 0.07 ms at 910K elements) at recall_target 0.99 per item —
    # the fixed-K budget is already an approximation of the reference's
    # unbounded above-threshold candidate list, and refinement + NMS pick
    # the winner from a pool of near-duplicates, so a ~1% tail miss is
    # immaterial.  Exact on CPU and on small inputs (golden tests).
    use_approx = (
        not exact
        and not os.environ.get("SIXDPOSE_EXACT_TOPK")
        and flat.shape[0] > 131072
        and jax.default_backend() in ("tpu", "axon")
    )
    if use_approx:
        top_scores, top_idx = jax.lax.approx_max_k(
            flat, k, recall_target=0.99
        )
    else:
        top_scores, top_idx = jax.lax.top_k(flat, k)
    tid = top_idx // (h * w)
    rem = top_idx % (h * w)
    y = rem // w
    x = rem % w
    valid = top_scores > threshold
    return (
        jnp.where(valid, tid, 0).astype(jnp.int32),
        jnp.where(valid, y, 0).astype(jnp.int32),
        jnp.where(valid, x, 0).astype(jnp.int32),
        jnp.where(valid, top_scores, -1.0),
    )


@jax.jit
def nms_boxes(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float):
    """Greedy box NMS over fixed-size candidate sets.

    Args:
      boxes: (K, 4) float32 (x, y, w, h).
      scores: (K,) float32, invalid entries < 0.  MUST be sorted descending
        (topk output already is).
      iou_threshold: suppress overlaps above this IoU.

    Returns:
      keep: (K,) bool mask of surviving boxes.
    """
    k = boxes.shape[0]
    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 0] + boxes[:, 2]
    y2 = boxes[:, 1] + boxes[:, 3]
    area = jnp.maximum(boxes[:, 2], 0) * jnp.maximum(boxes[:, 3], 0)

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)

    valid = scores >= 0

    def body(i, keep):
        # Suppress j > i overlapping with kept i.
        suppress = (iou[i] > iou_threshold) & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


@jax.jit
def dedupe_exact(tids: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, scores: jnp.ndarray):
    """Drop exact-duplicate (tid, y, x) candidates, keeping the first
    (reference sort+std::unique over matches, cpp:1771-1774).  Input must be
    sorted by score descending.  Returns a bool keep mask."""
    key = tids.astype(jnp.int64) * (1 << 40) + ys.astype(jnp.int64) * (1 << 20) + xs.astype(jnp.int64)
    same = key[:, None] == key[None, :]
    earlier = jnp.arange(key.shape[0])[:, None] > jnp.arange(key.shape[0])[None, :]
    dup = jnp.any(same & earlier, axis=1)
    return (scores >= 0) & ~dup
