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


def _lcp_scores(T, model_eval, scene, delta, chunk=256):
    """LCP score per hypothesis: fraction of transformed model_eval points
    within ``delta`` of any scene point (chunked pairwise min)."""

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

    return jax.lax.map(score_one, T)


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

    lcp = _lcp_scores(T, model_eval, scene, delta, chunk)
    lcp = jnp.where(match_err < (delta * 4) ** 2, lcp, 0.0)
    best = jnp.argmax(lcp)
    return T[best], lcp[best]


def _coplanar_base(scene: np.ndarray, rng, delta: float, trials: int = 48):
    """Extract a wide coplanar 4-point base from the scene cloud with
    intersecting diagonals (Super4PCS TryQuadrilateral semantics).

    Returns (pair1 (2,3), pair2 (2,3), r1, r2) or None.  r1/r2 are the
    diagonal intersection ratios — the affine invariants matched against
    model pairs (the core 4PCS idea).
    """
    n = len(scene)
    if n < 8:
        return None
    for _ in range(trials):
        idx = rng.choice(n, 3, replace=False)
        a, b, c = scene[idx]
        nrm = np.cross(b - a, c - a)
        nn = np.linalg.norm(nrm)
        if nn < 1e-9:
            continue
        nrm = nrm / nn
        dist = np.abs((scene - a) @ nrm)
        mask = dist < delta
        mask[idx] = False
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            continue
        cen = (a + b + c) / 3.0
        d4 = cand[np.argmax(np.linalg.norm(scene[cand] - cen, axis=1))]
        quad = scene[np.concatenate([idx, [d4]])]
        for (i, j, k, l) in ((0, 1, 2, 3), (0, 2, 1, 3), (0, 3, 1, 2)):
            p1, p2, p3, p4 = quad[i], quad[j], quad[k], quad[l]
            u = p2 - p1
            v = p4 - p3
            w0 = p1 - p3
            aa, bb, cc = u @ u, u @ v, v @ v
            dd, ee = u @ w0, v @ w0
            den = aa * cc - bb * bb
            if abs(den) < 1e-9:
                continue
            s = (bb * ee - cc * dd) / den
            t = (aa * ee - bb * dd) / den
            if not (0.05 <= s <= 0.95 and 0.05 <= t <= 0.95):
                continue
            e1 = p1 + s * u
            e2 = p3 + t * v
            if np.linalg.norm(e1 - e2) < delta:
                return (
                    np.stack([p1, p2]),
                    np.stack([p3, p4]),
                    float(s),
                    float(t),
                )
    return None


@functools.partial(jax.jit, static_argnames=("top_hyp", "chunk"))
def _fourpcs_core(
    scene: jnp.ndarray,        # (Ns, 3)
    model: jnp.ndarray,        # (Nm, 3)
    model_eval: jnp.ndarray,   # (Ne, 3)
    pairs_i: jnp.ndarray,      # (P,) directed model pair starts
    pairs_j: jnp.ndarray,      # (P,) ends
    base1: jnp.ndarray,        # (2, 3) scene diagonal 1
    base2: jnp.ndarray,        # (2, 3) scene diagonal 2
    r1: jnp.ndarray,           # () intersection ratio on diagonal 1
    r2: jnp.ndarray,           # () on diagonal 2
    delta: float,
    top_hyp: int = 256,
    chunk: int = 256,
):
    """Congruent-4-point matching (4PCS): model pairs whose length matches a
    scene diagonal contribute an intersection-point estimate; pairs of
    pairs whose estimates coincide are congruent bases.  All candidate
    pairs evaluate in parallel; the ``top_hyp`` best coincidences go to a
    4-correspondence Kabsch + LCP scoring."""
    pa = model[pairs_i]
    pb = model[pairs_j]
    lens = jnp.linalg.norm(pb - pa, axis=1)
    d1 = jnp.linalg.norm(base1[1] - base1[0])
    d2 = jnp.linalg.norm(base2[1] - base2[0])
    ok1 = jnp.abs(lens - d1) < delta
    ok2 = jnp.abs(lens - d2) < delta
    e1 = pa + r1 * (pb - pa)
    e2 = pa + r2 * (pb - pa)
    e1m = jnp.where(ok1[:, None], e1, 1e9)
    e2m = jnp.where(ok2[:, None], e2, -1e9)

    p = pairs_i.shape[0]

    def chunk_min(c):
        d2_ = jnp.sum((c[:, None, :] - e2m[None, :, :]) ** 2, -1)
        return jnp.min(d2_, axis=1), jnp.argmin(d2_, axis=1)

    pad = (-p) % chunk
    e1p = jnp.pad(e1m, ((0, pad), (0, 0)), constant_values=1e9)
    mind, argm = jax.lax.map(chunk_min, e1p.reshape(-1, chunk, 3))
    mind = mind.reshape(-1)[:p]
    argm = argm.reshape(-1)[:p]

    neg, sel = jax.lax.top_k(-mind, top_hyp)
    q1 = sel
    q2 = argm[sel]
    src = jnp.stack(
        [pa[q1], pb[q1], pa[q2], pb[q2]], axis=1
    )  # (K, 4, 3) model base
    dst = jnp.broadcast_to(
        jnp.concatenate([base1, base2], axis=0)[None], src.shape
    )
    T = jax.vmap(_kabsch)(src, dst)
    lcp = _lcp_scores(T, model_eval, scene, delta, chunk)
    lcp = jnp.where(-neg < delta * delta, lcp, 0.0)
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
    method: str = "auto",
    num_bases: int = 4,
    num_pairs: int = 2048,
) -> Tuple[np.ndarray, float]:
    """Register a segment cloud against a model cloud.

    Args:
      segment_cloud: (N, 3) scene-segment points (model units, e.g. mm —
        the reference converts its meter cloud to mm, cxx_3d_seg.cpp:57-62).
      model_pts: (M, 3) model points.
      delta: LCP inlier radius in model units.
      min_lcp: acceptance threshold (reference: LCP > 0.5).
      method: "tri" (congruent-triangle RANSAC), "4pcs" (planar-base
        congruent-4-point sets, Super4PCS's own extraction — more robust
        under heavy occlusion where random triangles rarely land on the
        visible patch), or "auto" (tri first, 4pcs fallback when below
        ``min_lcp``).

    Returns (T, lcp): model->scene 4x4 (zeros when below min_lcp), score.
    """
    rng = np.random.default_rng(seed)
    scene = _subsample(segment_cloud, sample_scene)
    model = _subsample(model_pts, sample_model)
    model_eval = _subsample(model_pts, sample_eval, seed=1)

    best_T, best_lcp = np.zeros((4, 4)), 0.0

    if method in ("tri", "auto"):
        tri_s = rng.integers(0, len(scene), (num_hyp, 3))
        tri_m = rng.integers(0, len(model), (num_hyp, 3))
        T, lcp = _ransac_core(
            jnp.asarray(scene),
            jnp.asarray(model),
            jnp.asarray(model_eval),
            jnp.asarray(tri_s),
            jnp.asarray(tri_m),
            float(delta),
            num_hyp,
        )
        best_T, best_lcp = np.asarray(T, np.float64), float(lcp)

    if method == "4pcs" or (method == "auto" and best_lcp <= min_lcp):
        pairs_i = rng.integers(0, len(model), num_pairs)
        pairs_j = rng.integers(0, len(model), num_pairs)
        far = pairs_i != pairs_j
        pairs_i, pairs_j = pairs_i[far], pairs_j[far]
        for _ in range(num_bases):
            base = _coplanar_base(scene, rng, delta)
            if base is None:
                continue
            b1, b2, r1, r2 = base
            T, lcp = _fourpcs_core(
                jnp.asarray(scene),
                jnp.asarray(model),
                jnp.asarray(model_eval),
                jnp.asarray(pairs_i),
                jnp.asarray(pairs_j),
                jnp.asarray(b1.astype(np.float32)),
                jnp.asarray(b2.astype(np.float32)),
                jnp.float32(r1),
                jnp.float32(r2),
                float(delta),
            )
            lcp = float(lcp)
            if lcp > best_lcp:
                best_T, best_lcp = np.asarray(T, np.float64), lcp
            if best_lcp > min_lcp:
                break

    if best_lcp <= min_lcp:
        return np.zeros((4, 4)), best_lcp
    return best_T, best_lcp
