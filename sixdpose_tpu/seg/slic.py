"""SLIC / ASP color superpixels (reference asp/src/libasp/algos/{SLIC,ASP}.cpp).

The reference ships two color-only variants of its ALIC clustering next
to DASP (present but unused by the segmentation pipeline; ported for
completeness, SURVEY.md §2 item 32):

- ``SuperpixelsSlic`` (SLIC.cpp:8-38): constant density
  num_superpixels / (W*H), GRID seeds, distance
  compactness * |dpos|^2 / r^2 + (1-compactness) * |dcolor|^2 with
  colors scaled to [0, 1] and default compactness 0.15
  (algos.hpp:71-78).
- ``SuperpixelsAsp`` (ASP.cpp:8-40): same distance, user-supplied
  density image, Floyd-Steinberg-Expo seed dithering.

TPU realization mirrors seg/dasp.py: seeds on host (tiny/serial), the 5
assignment/update ALIC iterations as one jit program with hash-grid
candidate buckets and segment-sum updates.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sixdpose_tpu.seg.dasp import floyd_steinberg_seeds


@dataclasses.dataclass(frozen=True)
class SlicConfig:
    """SLIC/ASP knobs (SlicParameters/AspParameters, algos.hpp:71-88)."""

    compactness: float = 0.15
    iterations: int = 5
    cell_px: int = 16
    seeds_per_cell: int = 8
    lambda_box: float = 2.0


def grid_seeds(h: int, w: int, num_superpixels: int) -> np.ndarray:
    """Regular-lattice seeds (PoissonDiskSamplingMethod::Grid): spacing
    sqrt(W*H / num), offset half a step."""
    step = float(np.sqrt(h * w / max(num_superpixels, 1)))
    ys = np.arange(step / 2.0, h, step)
    xs = np.arange(step / 2.0, w, step)
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.ravel(), gy.ravel()], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "num_seeds_pad"))
def _alic2d(
    color: jnp.ndarray,
    density: jnp.ndarray,
    seed_xy: jnp.ndarray,
    seed_valid: jnp.ndarray,
    cfg: SlicConfig,
    num_seeds_pad: int,
):
    """5 ALIC iterations over (position, color) pixels.

    Distance (SLIC.cpp:31-34): compactness * |dpos|^2 / r_sp^2 +
    (1 - compactness) * |dcolor|^2, r_sp = 1/sqrt(pi * density_sp).
    """
    h, w = density.shape
    s = num_seeds_pad
    sx = jnp.clip(seed_xy[:, 0].astype(jnp.int32), 0, w - 1)
    sy = jnp.clip(seed_xy[:, 1].astype(jnp.int32), 0, h - 1)
    sp = {
        "position": seed_xy,
        "color": color[sy, sx],
        "density": density[sy, sx],
        "num": jnp.ones((s,), jnp.float32),
    }

    gh = -(-h // cfg.cell_px)
    gw = -(-w // cfg.cell_px)
    cap = cfg.seeds_per_cell
    pyi = jnp.arange(h)[:, None] // cfg.cell_px
    pxi = jnp.arange(w)[None, :] // cfg.cell_px

    def assign(sp):
        cx = jnp.clip(sp["position"][:, 0].astype(jnp.int32) // cfg.cell_px, 0, gw - 1)
        cy = jnp.clip(sp["position"][:, 1].astype(jnp.int32) // cfg.cell_px, 0, gh - 1)
        cell = cy * gw + cx
        order = jnp.argsort(cell)
        cell_sorted = cell[order]
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

        cands = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                by = jnp.clip(pyi + dy, 0, gh - 1)
                bx = jnp.clip(pxi + dx, 0, gw - 1)
                cands.append(bucket[by, bx])
        cand = jnp.concatenate(cands, axis=-1)  # (H, W, 9*cap)

        ci = jnp.maximum(cand, 0)
        pxf = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        pyf = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        dx_ = pxf - sp["position"][ci][..., 0]
        dy_ = pyf - sp["position"][ci][..., 1]
        d_color = color[:, :, None, :] - sp["color"][ci]
        r2 = 1.0 / jnp.maximum(np.pi * sp["density"][ci], 1e-9)
        dist = (
            cfg.compactness * (dx_ * dx_ + dy_ * dy_) / r2
            + (1.0 - cfg.compactness) * jnp.sum(d_color * d_color, -1)
        )
        inbox = (jnp.abs(dx_) <= cfg.lambda_box * jnp.sqrt(r2)) & (
            jnp.abs(dy_) <= cfg.lambda_box * jnp.sqrt(r2)
        )
        dist = jnp.where((cand >= 0) & inbox, dist, jnp.inf)
        best = jnp.argmin(dist, axis=-1)
        best_d = jnp.take_along_axis(dist, best[..., None], -1)[..., 0]
        idx = jnp.take_along_axis(cand, best[..., None], -1)[..., 0]
        return jnp.where(jnp.isfinite(best_d), idx, -1)

    pos_grid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(w, dtype=jnp.float32),
            jnp.arange(h, dtype=jnp.float32),
            indexing="xy",
        ),
        -1,
    )

    def one_iter(_, sp):
        indices = assign(sp)
        seg = jnp.where(indices >= 0, indices, s).reshape(-1)
        ones = (indices >= 0).astype(jnp.float32).reshape(-1)

        def seg_mean(vals):
            flat = vals.reshape(-1, vals.shape[-1]) if vals.ndim == 3 else vals.reshape(-1, 1)
            acc = jax.ops.segment_sum(flat * ones[:, None], seg, num_segments=s + 1)
            return acc[:s]

        cnt = jax.ops.segment_sum(ones, seg, num_segments=s + 1)[:s]
        cn = jnp.maximum(cnt, 1e-6)[:, None]
        new_sp = {
            "position": seg_mean(pos_grid) / cn,
            "color": seg_mean(color) / cn,
            "density": (seg_mean(density[..., None]) / cn)[:, 0],
            "num": cnt,
        }
        dead = cnt < 0.5
        for k in sp:
            if k == "num":
                continue
            new_sp[k] = jnp.where(
                dead[:, None] if new_sp[k].ndim == 2 else dead, sp[k], new_sp[k]
            )
        return new_sp

    sp = jax.lax.fori_loop(0, cfg.iterations, one_iter, sp)
    return assign(sp), sp


def _run(rgb: np.ndarray, density: np.ndarray, seeds: np.ndarray, cfg: SlicConfig):
    s = len(seeds)
    pad = max(1 << int(np.ceil(np.log2(max(s, 1)))), 8)
    seed_xy = np.zeros((pad, 2), np.float32)
    seed_xy[:s] = seeds
    valid = np.zeros((pad,), bool)
    valid[:s] = True
    indices, sp = _alic2d(
        jnp.asarray(rgb.astype(np.float32) / 255.0),
        jnp.asarray(density.astype(np.float32)),
        jnp.asarray(seed_xy),
        jnp.asarray(valid),
        cfg,
        pad,
    )
    return np.asarray(indices), {k: np.asarray(v)[:s] for k, v in sp.items()}


def superpixels_slic(
    rgb: np.ndarray,
    num_superpixels: int = 1000,
    compactness: float = 0.15,
) -> Tuple[np.ndarray, dict]:
    """SLIC over an (H, W, 3) uint8 image (SuperpixelsSlic, SLIC.cpp:8-38).

    Returns (indices (H, W) int32 [-1 = unassigned], superpixel dict).
    """
    h, w = rgb.shape[:2]
    density = np.full((h, w), num_superpixels / float(h * w), np.float32)
    seeds = grid_seeds(h, w, num_superpixels)
    return _run(rgb, density, seeds, SlicConfig(compactness=compactness))


def superpixels_asp(
    rgb: np.ndarray,
    density: np.ndarray,
    compactness: float = 0.15,
) -> Tuple[np.ndarray, dict]:
    """ASP with a user density image (SuperpixelsAsp, ASP.cpp:8-40)."""
    seeds = floyd_steinberg_seeds(density)
    return _run(rgb, density, seeds, SlicConfig(compactness=compactness))
