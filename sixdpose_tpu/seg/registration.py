"""Global registration of a segment cloud to a model: batched RANSAC.

Reference: cxx_3d_seg::pose_estimation (cxx_3d_seg.cpp:52-100) wraps
Super4PCS (sample_size 200, 1 s budget) and accepts the result when the
LCP (largest common pointset) score exceeds 0.5, returning the INVERSE
transform as 4x4 (zeros otherwise).

TPU-first replacement: congruent-triangle RANSAC, all hypotheses scored
in parallel —

1. subsample both clouds to fixed sizes;
2. sample H random triangles from each cloud; match scene triangles to
   model triangles by their sorted side-length descriptor (one (H, H)
   distance matrix);
3. solve the rigid transform of every matched pair in parallel (Kabsch,
   vmapped 3x3 SVD);
4. LCP-score every hypothesis: transform a model subsample and count
   points within ``delta`` of the segment cloud (chunked pairwise-min —
   one big batched matmul-like reduction);
5. best hypothesis wins if its LCP > ``min_lcp``.

Returns the model->scene transform like the reference (inverse of the
scene->model alignment it computes internally).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _subsample(pts: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    pts = np.asarray(pts, np.float32)
    if len(pts) >= n:
        idx = np.linspace(0, len(pts) - 1, n).astype(np.int64)
        return pts[idx]
    reps = -(-n // len(pts))
    return np.tile(pts, (reps, 1))[:n]


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform aligning (3, 3) src points onto dst (4, 4)."""
    cs = src.mean(0)
    cd = dst.mean(0)
    h = (src - cs).T @ (dst - cd)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    r = vt.T @ diag @ u.T
    t = cd - r @ cs
    return jnp.eye(4).at[:3, :3].set(r).at[:3, 3].set(t)


@functools.partial(jax.jit, static_argnames=("num_hyp", "chunk"))
def _ransac_core(
    scene: jnp.ndarray,     # (Ns, 3)
    model: jnp.ndarray,     # (Nm, 3)
    model_eval: jnp.ndarray,  # (Ne, 3) subsample used for scoring
    tri_scene: jnp.ndarray,   # (num_hyp, 3) int indices into scene
    tri_model: jnp.ndarray,   # (num_hyp, 3) int indices into model
    delta: float,
    num_hyp: int,
    chunk: int = 256,
):
    s_tri = scene[tri_scene]   # (H, 3, 3)
    m_tri = model[tri_model]

    def side_desc(tri):
        d01 = jnp.linalg.norm(tri[:, 0] - tri[:, 1], axis=1)
        d12 = jnp.linalg.norm(tri[:, 1] - tri[:, 2], axis=1)
        d20 = jnp.linalg.norm(tri[:, 2] - tri[:, 0], axis=1)
        return jnp.sort(jnp.stack([d01, d12, d20], 1), axis=1)

    ds = side_desc(s_tri)      # (H, 3)
    dm = side_desc(m_tri)
    # Match every scene triangle to the closest model triangle by sides.
    diff = jnp.sum((ds[:, None, :] - dm[None, :, :]) ** 2, -1)  # (H, H)
    match = jnp.argmin(diff, axis=1)
    match_err = jnp.min(diff, axis=1)

    # Order both triangles' vertices by their side descriptor so the
    # correspondence is consistent: sort vertices by (opposite side len).
    def order_tri(tri):
        d01 = jnp.linalg.norm(tri[:, 0] - tri[:, 1], axis=1)
        d12 = jnp.linalg.norm(tri[:, 1] - tri[:, 2], axis=1)
        d20 = jnp.linalg.norm(tri[:, 2] - tri[:, 0], axis=1)
        opp = jnp.stack([d12, d20, d01], 1)  # opposite side per vertex
        idx = jnp.argsort(opp, axis=1)
        return jnp.take_along_axis(tri, idx[..., None], axis=1)

    s_ord = order_tri(s_tri)
    m_ord = order_tri(m_tri[match])

    # Model -> scene transform per hypothesis.
    T = jax.vmap(_kabsch)(m_ord, s_ord)  # (H, 4, 4)

    # LCP score: fraction of model_eval points within delta of the scene.
    def score_one(Ti):
        p = model_eval @ Ti[:3, :3].T + Ti[:3, 3]

        def min_d_chunk(c):
            d2 = jnp.sum((c[:, None, :] - scene[None, :, :]) ** 2, -1)
            return jnp.min(d2, axis=1)

        ne = p.shape[0]
        pad = (-ne) % chunk
        pp = jnp.pad(p, ((0, pad), (0, 0)))
        d2 = jax.lax.map(min_d_chunk, pp.reshape(-1, chunk, 3)).reshape(-1)[:ne]
        return jnp.mean((d2 < delta * delta).astype(jnp.float32))

    lcp = jax.lax.map(score_one, T)
    lcp = jnp.where(match_err < (delta * 4) ** 2, lcp, 0.0)
    best = jnp.argmax(lcp)
    return T[best], lcp[best]


def pose_estimation(
    segment_cloud: np.ndarray,
    model_pts: np.ndarray,
    delta: float = 5.0,
    min_lcp: float = 0.5,
    num_hyp: int = 1024,
    sample_scene: int = 512,
    sample_model: int = 512,
    sample_eval: int = 256,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """Register a segment cloud against a model cloud.

    Args:
      segment_cloud: (N, 3) scene-segment points (model units, e.g. mm —
        the reference converts its meter cloud to mm, cxx_3d_seg.cpp:57-62).
      model_pts: (M, 3) model points.
      delta: LCP inlier radius in model units.
      min_lcp: acceptance threshold (reference: LCP > 0.5).

    Returns (T, lcp): model->scene 4x4 (zeros when below min_lcp), score.
    """
    rng = np.random.default_rng(seed)
    scene = _subsample(segment_cloud, sample_scene)
    model = _subsample(model_pts, sample_model)
    model_eval = _subsample(model_pts, sample_eval, seed=1)

    # Triangle sampling with a minimum side length (stability): bias toward
    # well-spread triplets.
    def sample_tris(n_pts):
        return rng.integers(0, n_pts, (num_hyp, 3))

    tri_s = sample_tris(len(scene))
    tri_m = sample_tris(len(model))

    T, lcp = _ransac_core(
        jnp.asarray(scene),
        jnp.asarray(model),
        jnp.asarray(model_eval),
        jnp.asarray(tri_s),
        jnp.asarray(tri_m),
        float(delta),
        num_hyp,
    )
    T = np.asarray(T, np.float64)
    lcp = float(lcp)
    if lcp <= min_lcp:
        return np.zeros((4, 4)), lcp
    return T, lcp
