"""Depth-Adaptive Superpixels (DASP) + convexity-based grouping.

Reference: cxx_3d_seg/asp/ — SuperpixelsDasp (DASP.cpp:178-244),
ALIC clustering (alic.hpp:64-130), DsapGrouping (DASP.cpp:246-494),
DaspParameters defaults (algos.hpp:96-117: focal 545, radius 15 mm,
compactness 0.8, normal_weight 1.0).

TPU-first mapping:

- Per-pixel stage (backprojection, adaptive-window Primesense depth
  gradient, normals, density) is one jit pass.  The reference's
  per-pixel adaptive window w = 0.1 * radius * f / z (min 4, even) is
  quantized to a small static set of windows, computed in parallel and
  selected per pixel.
- Seeds: Floyd-Steinberg density dithering (FloydSteinberg.cpp:7-138) is
  inherently serial error diffusion -> host numpy, once per frame.
- ALIC: 5 assignment/update iterations.  The reference loops each
  superpixel over its 3r search box; here each PIXEL considers the
  superpixels bucketed in its 3x3 coarse-grid neighborhood (fixed
  capacity), so assignment is a dense vectorized argmin and the update is
  a segment-sum — both jit.
- Grouping: superpixel adjacency from index-diff shifts (vectorized),
  then the reference's two Kruskal-style union-find passes (plane merge
  by edge weight, then concave-pair-limited region merge) on host — the
  graph is a few hundred nodes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DaspConfig:
    """DaspParameters (algos.hpp:96-117)."""

    focal_px: float = 545.0
    cx: float = 320.0
    cy: float = 240.0
    depth_to_z: float = 0.001
    radius: float = 0.015           # meters
    num_superpixels: int = 0        # 0 = density-driven count
    compactness: float = 0.8
    normal_weight: float = 1.0
    iterations: int = 5
    lambda_box: float = 3.0
    cell_px: int = 32               # spatial hash cell for assignment
    seeds_per_cell: int = 12        # hash bucket capacity
    # convex grouping (DASP.cpp:246-494)
    convex_dot: float = -0.2
    center_dist_radii: float = 3.0
    plane_edge_count_scl: float = 400.0
    plane_weight_max: float = 0.02
    concave_dot: float = -0.1
    concave_max_pairs: int = 1


_GRAD_WINDOWS = (4, 6, 8, 12, 16, 24)


@functools.partial(jax.jit, static_argnames=("cfg",))
def pixel_stage(rgb: jnp.ndarray, depth: jnp.ndarray, cfg: DaspConfig):
    """Backprojection, depth gradient, normal, density per pixel.

    Returns dict of (H, W, ...) arrays: world (m), normal, color, density,
    valid.
    """
    h, w = depth.shape
    d = depth.astype(jnp.float32)
    z = d * cfg.depth_to_z
    valid = depth > 0
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    world = jnp.stack(
        [
            (xs - cfg.cx) * z / cfg.focal_px,
            (ys - cfg.cy) * z / cfg.focal_px,
            z,
        ],
        axis=-1,
    )

    def fd_primesense(v0, v1, v2, v3, v4):
        """LocalFiniteDifferencesPrimesense (DASP.cpp:59-96)."""
        left_bad = (v0 == 0) | (v1 == 0)
        right_bad = (v3 == 0) | (v4 == 0)
        a = jnp.abs(v2 + v0 - 2.0 * v1)
        b = jnp.abs(v4 + v2 - 2.0 * v3)
        denom = jnp.where(a + b == 0, 1.0, a + b)
        p = jnp.where(a + b == 0, 0.5, a / denom)
        q = jnp.where(a + b == 0, 0.5, b / denom)
        smooth = q * (v2 - v0) + p * (v4 - v2)
        out = jnp.where(
            left_bad & right_bad,
            0.0,
            jnp.where(left_bad, v4 - v2, jnp.where(right_bad, v2 - v0, smooth)),
        )
        special = (v0 == 0) & (v4 == 0) & (v1 != 0) & (v3 != 0)
        return jnp.where(special, v3 - v1, out)

    def grad_for_window(wpx: int):
        p = jnp.pad(d, wpx)
        sh = lambda dy, dx: p[wpx + dy : h + wpx + dy, wpx + dx : w + wpx + dx]
        gx = fd_primesense(sh(0, -wpx), sh(0, -wpx // 2), d, sh(0, wpx // 2), sh(0, wpx))
        gy = fd_primesense(sh(-wpx, 0), sh(-wpx // 2, 0), d, sh(wpx // 2, 0), sh(wpx, 0))
        return gx, gy

    z_over_f = z / cfg.focal_px
    want = 0.1 * cfg.radius / jnp.maximum(z_over_f, 1e-9)
    gxs, gys = zip(*[grad_for_window(wp) for wp in _GRAD_WINDOWS])
    gxs = jnp.stack(gxs)
    gys = jnp.stack(gys)
    # Pick the smallest window >= want (min 4), like round-to-even-ceil.
    wlist = jnp.array(_GRAD_WINDOWS, jnp.float32)
    sel = jnp.argmin(
        jnp.where(wlist[:, None, None] >= want[None], wlist[:, None, None], 1e9),
        axis=0,
    )
    used_w = wlist[sel]
    gx = jnp.take_along_axis(gxs, sel[None], axis=0)[0]
    gy = jnp.take_along_axis(gys, sel[None], axis=0)[0]
    scl = 1.0 / jnp.maximum(used_w * z_over_f, 1e-9)
    g = jnp.stack([gx, gy], -1) * (scl * cfg.depth_to_z)[..., None]

    # NormalFromGradient (DASP.cpp:142-160).
    gn = 1.0 / jnp.sqrt(1.0 + jnp.sum(g * g, -1))
    normal = jnp.stack([gn * g[..., 0], gn * g[..., 1], -gn], -1)
    flip = jnp.sign(jnp.sum(normal * (-world), -1))
    flip = jnp.where(flip == 0, 1.0, flip)
    normal = normal * flip[..., None]
    normal = jnp.where(valid[..., None], normal, jnp.array([0.0, 0.0, -1.0]))

    # Density (DASP.cpp:167-171).
    q = z / (cfg.radius * cfg.focal_px)
    density = q * q / 3.1415 * jnp.sqrt(jnp.sum(g * g, -1) + 1.0)
    density = jnp.where(valid, density, 0.0)

    color = rgb.astype(jnp.float32) / 255.0
    return {
        "world": jnp.where(valid[..., None], world, 0.0),
        "normal": normal,
        "color": color,
        "density": density,
        "valid": valid,
    }


def floyd_steinberg_seeds(density: np.ndarray) -> np.ndarray:
    """Density error-diffusion seed placement (FloydSteinberg.cpp:35-138).

    Returns (S, 2) float (x, y) seed positions.  Serpentine scan with the
    classic 7/16, 3/16, 5/16, 1/16 kernel.  Uses the native C++ kernel
    when built (~100x the pure-Python scan).
    """
    from sixdpose_tpu import native_bridge

    if native_bridge.available():
        seeds = native_bridge.floyd_steinberg(density)
        if seeds is not None:
            return seeds

    err = density.astype(np.float64).copy()
    h, w = err.shape
    seeds = []
    for y in range(h):
        rng_x = range(w) if y % 2 == 0 else range(w - 1, -1, -1)
        sgn = 1 if y % 2 == 0 else -1
        for x in rng_x:
            v = err[y, x]
            out = 1.0 if v >= 0.5 else 0.0
            if out > 0:
                seeds.append((x, y))
            e = v - out
            if 0 <= x + sgn < w:
                err[y, x + sgn] += e * 7 / 16
            if y + 1 < h:
                if 0 <= x - sgn < w:
                    err[y + 1, x - sgn] += e * 3 / 16
                err[y + 1, x] += e * 5 / 16
                if 0 <= x + sgn < w:
                    err[y + 1, x + sgn] += e * 1 / 16
    return np.array(seeds, np.float64).reshape(-1, 2)


@functools.partial(jax.jit, static_argnames=("cfg", "num_seeds_pad"))
def alic_iterate(
    px: dict,
    seed_xy: jnp.ndarray,
    seed_valid: jnp.ndarray,
    cfg: DaspConfig,
    num_seeds_pad: int,
):
    """5 ALIC iterations (alic.hpp:64-130) with hash-grid assignment.

    Args:
      px: pixel_stage output.
      seed_xy: (S, 2) float (x, y), padded.
      seed_valid: (S,) bool.

    Returns (indices (H, W) int32 [-1 = unassigned], superpixel dict with
    per-superpixel mean world/normal/color/position/density/num).
    """
    h, w = px["density"].shape
    s = num_seeds_pad
    valid_px = px["valid"]

    # Initialize superpixel state from seed pixels.
    sx = jnp.clip(seed_xy[:, 0].astype(jnp.int32), 0, w - 1)
    sy = jnp.clip(seed_xy[:, 1].astype(jnp.int32), 0, h - 1)
    sp = {
        "position": seed_xy,
        "world": px["world"][sy, sx],
        "normal": px["normal"][sy, sx],
        "color": px["color"][sy, sx],
        "density": px["density"][sy, sx],
        "num": jnp.ones((s,), jnp.float32),
    }

    gh = -(-h // cfg.cell_px)
    gw = -(-w // cfg.cell_px)
    cap = cfg.seeds_per_cell

    pyi = jnp.arange(h)[:, None] // cfg.cell_px
    pxi = jnp.arange(w)[None, :] // cfg.cell_px

    flat_world = px["world"]
    flat_color = px["color"]
    flat_normal = px["normal"]

    def assign(sp):
        """Assignment pass: each pixel picks the best superpixel among its
        3x3-hash-cell candidates (the reference iterates superpixels over
        their 3r boxes; this is the pixel-centric dual, alic.hpp:87-110)."""
        cx = jnp.clip(sp["position"][:, 0].astype(jnp.int32) // cfg.cell_px, 0, gw - 1)
        cy = jnp.clip(sp["position"][:, 1].astype(jnp.int32) // cfg.cell_px, 0, gh - 1)
        cell = cy * gw + cx
        order = jnp.argsort(cell)
        cell_sorted = cell[order]
        # rank within cell
        same = cell_sorted[:, None] == cell_sorted[None, :]
        earlier = jnp.arange(s)[:, None] > jnp.arange(s)[None, :]
        rank = jnp.sum(same & earlier, axis=1)
        slot_ok = (rank < cap) & seed_valid[order]
        # One extra sentinel slot absorbs overflow/invalid writes so they
        # can never clobber a legitimate seed in the last real cell (the
        # duplicate-index .set order is undefined).
        bucket = jnp.full((gh * gw * cap + 1,), -1, jnp.int32)
        slot_idx = cell_sorted * cap + jnp.minimum(rank, cap - 1)
        bucket = bucket.at[jnp.where(slot_ok, slot_idx, gh * gw * cap)].set(
            jnp.where(slot_ok, order.astype(jnp.int32), -1)
        )
        bucket = bucket[: gh * gw * cap].reshape(gh, gw, cap)

        # Candidate superpixels per pixel: 3x3 grid cells.
        cands = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                by = jnp.clip(pyi + dy, 0, gh - 1)
                bx = jnp.clip(pxi + dx, 0, gw - 1)
                cands.append(bucket[by, bx])  # (H, W, cap)
        cand = jnp.concatenate(cands, axis=-1)  # (H, W, 9*cap)

        ci = jnp.maximum(cand, 0)
        d_world = flat_world[:, :, None, :] - sp["world"][ci]
        d_color = flat_color[:, :, None, :] - sp["color"][ci]
        n_dot = jnp.sum(flat_normal[:, :, None, :] * sp["normal"][ci], -1)
        dist = (
            cfg.compactness
            * jnp.sum(d_world * d_world, -1)
            / (cfg.radius * cfg.radius)
            + (1.0 - cfg.compactness)
            * (
                (1.0 - cfg.normal_weight) * jnp.sum(d_color * d_color, -1)
                + cfg.normal_weight * (1.0 - n_dot)
            )
        )
        # Box gating like the reference (LAMBDA * radius around the seed).
        sp_rad = 1.0 / jnp.sqrt(jnp.maximum(3.1415 * sp["density"], 1e-9))
        pxf = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        pyf = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        inbox = (
            (jnp.abs(pxf - sp["position"][ci][..., 0]) <= cfg.lambda_box * sp_rad[ci])
            & (jnp.abs(pyf - sp["position"][ci][..., 1]) <= cfg.lambda_box * sp_rad[ci])
        )
        dist = jnp.where((cand >= 0) & inbox & valid_px[..., None], dist, jnp.inf)
        best = jnp.argmin(dist, axis=-1)
        best_d = jnp.take_along_axis(dist, best[..., None], -1)[..., 0]
        idx = jnp.take_along_axis(cand, best[..., None], -1)[..., 0]
        return jnp.where(jnp.isfinite(best_d), idx, -1)

    def one_iter(_, state):
        sp = state
        indices = assign(sp)

        # Update: segment means (alic.hpp:113-128).
        seg = jnp.where(indices >= 0, indices, s).reshape(-1)
        ones = (indices >= 0).astype(jnp.float32).reshape(-1)

        def seg_mean(vals):
            flat = vals.reshape(-1, vals.shape[-1]) if vals.ndim == 3 else vals.reshape(-1, 1)
            acc = jax.ops.segment_sum(flat * ones[:, None], seg, num_segments=s + 1)
            return acc[:s]

        cnt = jax.ops.segment_sum(ones, seg, num_segments=s + 1)[:s]
        cn = jnp.maximum(cnt, 1e-6)[:, None]
        pos_grid = jnp.stack(
            jnp.meshgrid(
                jnp.arange(w, dtype=jnp.float32),
                jnp.arange(h, dtype=jnp.float32),
                indexing="xy",
            ),
            -1,
        )
        new_sp = {
            "position": seg_mean(pos_grid) / cn,
            "world": seg_mean(flat_world) / cn,
            "normal": seg_mean(flat_normal) / cn,
            "color": seg_mean(flat_color) / cn,
            "density": (seg_mean(px["density"][..., None]) / cn)[:, 0],
            "num": cnt,
        }
        # Keep dead superpixels where they were.
        dead = cnt < 0.5
        for k in sp:
            if k == "num":
                continue
            new_sp[k] = jnp.where(dead[:, None] if new_sp[k].ndim == 2 else dead, sp[k], new_sp[k])
        return new_sp

    sp = jax.lax.fori_loop(0, cfg.iterations, one_iter, sp)
    # Final assignment against the converged superpixels.
    indices = assign(sp)
    return indices, sp


class UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, i: int) -> int:
        while self.parent[i] != i:
            self.parent[i] = self.parent[self.parent[i]]
            i = self.parent[i]
        return i

    def union_into(self, child: int, parent: int):
        self.parent[self.find(child)] = self.find(parent)


def convex_grouping(
    indices: np.ndarray,
    sp_world: np.ndarray,
    sp_normal: np.ndarray,
    sp_num: np.ndarray,
    cfg: DaspConfig,
) -> np.ndarray:
    """Merge superpixels into convex segments (DsapGrouping, DASP.cpp:246-494).

    Pass 1: sort convex edges by weight (1 - |n1.n2|); union when the
    shared border is long (count > radius*400) and the surfaces are
    coplanar (weight < 0.02) — stop at the first non-coplanar strong edge.
    Pass 2: merge adjacent groups over strong borders unless more than
    ``concave_max_pairs`` member pairs are concave.
    Returns (H, W) int32 segment ids, ordered by descending pixel count
    (-1 = unassigned).
    """
    h, w = indices.shape
    s = len(sp_world)

    # Adjacency counts from right/down neighbors (DASP.cpp:304-326).
    adj = np.zeros((s, s), np.int64)
    a = indices[:, :-1].reshape(-1)
    b = indices[:, 1:].reshape(-1)
    m = (a >= 0) & (b >= 0) & (a != b)
    np.add.at(adj, (a[m], b[m]), 1)
    np.add.at(adj, (b[m], a[m]), 1)
    a = indices[:-1, :].reshape(-1)
    b = indices[1:, :].reshape(-1)
    m = (a >= 0) & (b >= 0) & (a != b)
    np.add.at(adj, (a[m], b[m]), 1)
    np.add.at(adj, (b[m], a[m]), 1)

    present = np.unique(indices[indices >= 0])

    # Edges with convexity filter (DASP.cpp:330-363).
    edges = []
    ii, jj = np.nonzero(np.triu(adj, 1))
    for i, j in zip(ii, jj):
        c12 = sp_world[i] - sp_world[j]
        norm = np.linalg.norm(c12)
        if norm < 1e-12:
            continue
        u = c12 / norm
        if u @ sp_normal[i] < cfg.convex_dot or -(u @ sp_normal[j]) < cfg.convex_dot:
            continue
        if norm / cfg.radius > cfg.center_dist_radii:
            continue
        weight = 1.0 - abs(sp_normal[i] @ sp_normal[j])
        edges.append((weight, int(adj[i, j]), int(i), int(j)))
    edges.sort()

    uf = UnionFind(s)
    members = {int(i): [int(i)] for i in present}
    count = {int(i): float(sp_num[i]) for i in present}
    strong = cfg.radius * cfg.plane_edge_count_scl

    # Pass 1: plane merging (DASP.cpp:365-404).
    for weight, cnt, i, j in edges:
        p1, p2 = uf.find(i), uf.find(j)
        if p1 == p2:
            continue
        if count.get(p1, 0) > count.get(p2, 0):
            p1, p2 = p2, p1
        if cnt > strong:
            if weight < cfg.plane_weight_max:
                uf.union_into(p1, p2)
                members[p2] = members.get(p2, []) + members.get(p1, [])
                count[p2] = count.get(p2, 0) + count.get(p1, 0)
                adj[i, j] = adj[j, i] = 0
            else:
                break

    # Pass 2: concavity-limited group merging (DASP.cpp:406-470).
    roots = sorted(
        {uf.find(int(i)) for i in present},
        key=lambda r: -count.get(r, 0),
    )
    for p2 in roots:
        if uf.find(p2) != p2:
            continue
        for c in list(members.get(p2, [])):
            for x in present:
                x = int(x)
                if x == c:
                    continue
                if adj[x, c] > strong:
                    p1 = uf.find(x)
                    if p1 != uf.find(p2):
                        concave = 0
                        stop = False
                        for m1 in members.get(p1, []):
                            for m2 in members.get(p2, []):
                                d = sp_world[m2] - sp_world[m1]
                                nn = np.linalg.norm(d)
                                if nn < 1e-12:
                                    continue
                                u = d / nn
                                if (
                                    u @ sp_normal[m2] < cfg.concave_dot
                                    or -(u @ sp_normal[m1]) < cfg.concave_dot
                                ):
                                    concave += 1
                                    if concave > cfg.concave_max_pairs:
                                        stop = True
                                        break
                            if stop:
                                break
                        if concave <= cfg.concave_max_pairs:
                            tgt = uf.find(p2)
                            uf.union_into(p1, tgt)
                            members[tgt] = members.get(tgt, []) + members.get(p1, [])
                            count[tgt] = count.get(tgt, 0) + count.get(p1, 0)
                    adj[x, c] = adj[c, x] = 0

    # Relabel segments by descending pixel count (DASP.cpp:472-493).
    root_of = np.full(s, -1, np.int64)
    for i in present:
        root_of[int(i)] = uf.find(int(i))
    roots, root_counts = [], []
    for r in np.unique(root_of[root_of >= 0]):
        roots.append(r)
        root_counts.append(sum(sp_num[m] for m in members.get(int(r), [int(r)])))
    order = np.argsort(-np.asarray(root_counts))
    rank = {int(roots[o]): i for i, o in enumerate(order)}
    seg_rank = np.array(
        [rank.get(int(r), -1) if r >= 0 else -1 for r in root_of], np.int64
    )
    out = np.full((h, w), -1, np.int64)
    ok = indices >= 0
    out[ok] = seg_rank[indices[ok]]
    return out
