"""Triangle rasterizer in JAX (depth + shaded RGB).

Replaces the reference's offscreen OpenGL renderer (pysixd/renderer.py):
``render(model, im_size, K, R, t, clip_near, clip_far, mode)`` with the
same conventions — model points and t in mm, OpenCV camera (x right,
y down, z forward), pinhole projection u = fx*x/z + cx, output depth in
eye-space mm (renderer.py:266-304 stores eye depth in the color buffer).

TPU-first design: triangle-parallel rasterization.  Each triangle is
rasterized over a fixed PxP pixel tile anchored at its screen bbox
(static shapes) and resolved into the frame with a scatter-min z-buffer —
there is no data-dependent control flow, so the whole render jits.
Triangles whose bbox exceeds P pixels are handled by ``subdivide_mesh``
at asset-load time (models here are dense scans; typical projected
triangles are a few pixels).  Triangles are processed in fixed-size chunks
under ``lax.map`` to bound memory.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def subdivide_mesh(
    pts: np.ndarray,
    faces: np.ndarray,
    max_edge: float,
    attrs: "Optional[np.ndarray]" = None,
):
    """Split triangles until every edge is <= max_edge (model units).

    Host-side, once per asset.  Guarantees the rasterizer's fixed tile
    covers each projected triangle when max_edge * f / z_min <= tile_px.
    ``attrs`` is an optional (V, A) per-vertex attribute array (e.g.
    colors); midpoints average their endpoints.  Returns (pts, faces) or
    (pts, faces, attrs).
    """
    pts = np.asarray(pts, np.float64)
    faces = np.asarray(faces, np.int64)
    if attrs is not None:
        attrs = np.asarray(attrs, np.float64)
    while True:
        p = pts[faces]  # (m, 3, 3)
        e = np.stack(
            [
                np.linalg.norm(p[:, 0] - p[:, 1], axis=1),
                np.linalg.norm(p[:, 1] - p[:, 2], axis=1),
                np.linalg.norm(p[:, 2] - p[:, 0], axis=1),
            ],
            1,
        )
        bad = e.max(1) > max_edge
        if not bad.any():
            return (pts, faces) if attrs is None else (pts, faces, attrs)
        keep = faces[~bad]
        split = faces[bad]
        mids = (pts[split[:, [0, 1, 2]]] + pts[split[:, [1, 2, 0]]]) / 2  # (m,3,3)
        base = len(pts)
        pts = np.concatenate([pts, mids.reshape(-1, 3)], 0)
        if attrs is not None:
            amids = (attrs[split[:, [0, 1, 2]]] + attrs[split[:, [1, 2, 0]]]) / 2
            attrs = np.concatenate([attrs, amids.reshape(-1, attrs.shape[1])], 0)
        m01 = base + np.arange(len(split)) * 3 + 0
        m12 = base + np.arange(len(split)) * 3 + 1
        m20 = base + np.arange(len(split)) * 3 + 2
        a, b, c = split[:, 0], split[:, 1], split[:, 2]
        faces = np.concatenate(
            [
                keep,
                np.stack([a, m01, m20], 1),
                np.stack([m01, b, m12], 1),
                np.stack([m12, c, m20], 1),
                np.stack([m01, m12, m20], 1),
            ],
            0,
        )


@functools.partial(
    jax.jit, static_argnames=("im_size", "tile_px", "chunk")
)
def render_depth(
    pts: jnp.ndarray,
    faces: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    im_size: Tuple[int, int],
    clip_near: float = 100.0,
    clip_far: float = 10000.0,
    tile_px: int = 16,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Render eye-space depth (mm) of a posed mesh.

    Args:
      pts: (V, 3) float32 model vertices (mm).
      faces: (F, 3) int32 triangle indices.
      K: (3, 3) intrinsics; R: (3, 3); t: (3,) or (3, 1) mm.
      im_size: (W, H).
      tile_px: per-triangle rasterization tile (bbox must fit).
      chunk: triangles per lax.map step.

    Returns (H, W) float32 depth image, 0 where nothing was hit.
    """
    w, h = im_size
    p = tile_px
    cam = pts @ R.T + jnp.reshape(t, (1, 3))  # (V, 3) mm
    z = cam[:, 2]
    u = cam[:, 0] / z * K[0, 0] + K[0, 2]
    v = cam[:, 1] / z * K[1, 1] + K[1, 2]
    inv_z = 1.0 / z

    nf = faces.shape[0]
    pad = (-nf) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))  # padded tris index vtx 0
    valid_tri = jnp.pad(jnp.ones((nf,), bool), (0, pad))

    dump = h * w  # out-of-image scatter slot
    yy, xx = jnp.mgrid[0:p, 0:p]

    def raster_chunk(args):
        f, tri_ok = args  # (chunk, 3), (chunk,)
        tu = u[f]  # (chunk, 3)
        tv = v[f]
        tiz = inv_z[f]
        tz = z[f]
        front = jnp.all(tz > clip_near, axis=1) & jnp.all(tz < clip_far, axis=1)

        x0 = jnp.clip(jnp.floor(jnp.min(tu, 1)), 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(jnp.min(tv, 1)), 0, h - 1).astype(jnp.int32)
        x1 = jnp.max(tu, 1)
        y1 = jnp.max(tv, 1)
        fits = (x1 - x0 < p) & (y1 - y0 < p) & (x1 >= 0) & (y1 >= 0)
        ok = tri_ok & front & fits

        px = x0[:, None, None] + xx[None]  # (chunk, p, p)
        py = y0[:, None, None] + yy[None]
        fx = px.astype(jnp.float32) + 0.0
        fy = py.astype(jnp.float32) + 0.0

        ax, ay = tu[:, 0, None, None], tv[:, 0, None, None]
        bx, by = tu[:, 1, None, None], tv[:, 1, None, None]
        cx, cy = tu[:, 2, None, None], tv[:, 2, None, None]
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        l0 = ((by - cy) * (fx - cx) + (cx - bx) * (fy - cy)) / d
        l1 = ((cy - ay) * (fx - cx) + (ax - cx) * (fy - cy)) / d
        l2 = 1.0 - l0 - l1
        # -1e-5 slack: pixels exactly on a shared edge can round to a tiny
        # negative lambda in BOTH triangles, leaving one-pixel cracks.
        inside = (l0 >= -1e-5) & (l1 >= -1e-5) & (l2 >= -1e-5)

        # Perspective-correct depth: 1 / sum(lambda_i / z_i).
        izp = (
            l0 * tiz[:, 0, None, None]
            + l1 * tiz[:, 1, None, None]
            + l2 * tiz[:, 2, None, None]
        )
        zp = 1.0 / jnp.maximum(izp, 1e-12)

        good = (
            inside
            & ok[:, None, None]
            & (px >= 0)
            & (px < w)
            & (py >= 0)
            & (py < h)
        )
        idx = jnp.where(good, py * w + px, dump)
        return idx.reshape(-1), jnp.where(good, zp, jnp.inf).reshape(-1)

    idxs, zs = jax.lax.map(
        raster_chunk,
        (
            faces_p.reshape(-1, chunk, 3),
            valid_tri.reshape(-1, chunk),
        ),
    )
    zbuf = jnp.full((h * w + 1,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[idxs.reshape(-1)].min(zs.reshape(-1))
    depth = zbuf[: h * w].reshape(h, w)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)


@functools.partial(jax.jit, static_argnames=("im_size", "tile_px", "chunk"))
def render_depth_batch(
    pts: jnp.ndarray,
    faces: jnp.ndarray,
    K: jnp.ndarray,
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    im_size: Tuple[int, int],
    clip_near: float = 100.0,
    clip_far: float = 10000.0,
    tile_px: int = 16,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Render a BATCH of poses of one mesh in a single dispatch
    (vmap over render_depth; the reference renders views serially through
    an OpenGL window per call, renderer.py:386-407).

    Rs: (B, 3, 3); ts: (B, 3).  Returns (B, H, W) float32 depth (mm).
    """
    fn = lambda R, t: render_depth(
        pts, faces, K, R, t, im_size, clip_near, clip_far, tile_px, chunk
    )
    return jax.vmap(fn)(Rs, ts)


@functools.partial(jax.jit, static_argnames=("im_size", "tile_px", "chunk"))
def render_rgb_depth(
    pts: jnp.ndarray,
    faces: jnp.ndarray,
    colors: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    im_size: Tuple[int, int],
    clip_near: float = 100.0,
    clip_far: float = 10000.0,
    tile_px: int = 16,
    chunk: int = 8192,
    ambient: float = 0.4,
):
    """Depth + Lambertian-shaded RGB (reference draw_color's phong-lite,
    renderer.py:203-265: ambient + diffuse from a headlight).

    colors: (V, 3) float vertex colors in [0, 1] (model colors / 255).
    Returns (rgb uint8 (H, W, 3), depth float32 (H, W)).
    """
    w, h = im_size
    depth = render_depth(
        pts, faces, K, R, t, im_size, clip_near, clip_far, tile_px, chunk
    )

    cam = pts @ R.T + jnp.reshape(t, (1, 3))
    z = cam[:, 2]
    u = cam[:, 0] / z * K[0, 0] + K[0, 2]
    v = cam[:, 1] / z * K[1, 1] + K[1, 2]

    # Face normal & shade per triangle (flat shading).
    p0, p1, p2 = cam[faces[:, 0]], cam[faces[:, 1]], cam[faces[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    # Headlight at camera origin looking along +z.
    light = jnp.abs(n[:, 2])
    shade = jnp.clip(ambient + (1 - ambient) * light, 0.0, 1.0)
    fcol = (colors[faces[:, 0]] + colors[faces[:, 1]] + colors[faces[:, 2]]) / 3.0
    fcol = fcol * shade[:, None]  # (F, 3)

    nf = faces.shape[0]
    pad = (-nf) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    fcol_p = jnp.pad(fcol, ((0, pad), (0, 0)))
    valid_tri = jnp.pad(jnp.ones((nf,), bool), (0, pad))
    dump = h * w
    p = tile_px
    yy, xx = jnp.mgrid[0:p, 0:p]
    inv_z = 1.0 / z

    def raster_chunk(args):
        f, col, tri_ok = args
        tu, tv, tiz, tz = u[f], v[f], inv_z[f], z[f]
        front = jnp.all(tz > clip_near, 1) & jnp.all(tz < clip_far, 1)
        x0 = jnp.clip(jnp.floor(jnp.min(tu, 1)), 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(jnp.min(tv, 1)), 0, h - 1).astype(jnp.int32)
        fits = (jnp.max(tu, 1) - x0 < p) & (jnp.max(tv, 1) - y0 < p)
        ok = tri_ok & front & fits
        px = x0[:, None, None] + xx[None]
        py = y0[:, None, None] + yy[None]
        fx, fy = px.astype(jnp.float32), py.astype(jnp.float32)
        ax, ay = tu[:, 0, None, None], tv[:, 0, None, None]
        bx, by = tu[:, 1, None, None], tv[:, 1, None, None]
        cx, cy = tu[:, 2, None, None], tv[:, 2, None, None]
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        l0 = ((by - cy) * (fx - cx) + (cx - bx) * (fy - cy)) / d
        l1 = ((cy - ay) * (fx - cx) + (ax - cx) * (fy - cy)) / d
        l2 = 1.0 - l0 - l1
        # -1e-5 slack: pixels exactly on a shared edge can round to a tiny
        # negative lambda in BOTH triangles, leaving one-pixel cracks.
        inside = (l0 >= -1e-5) & (l1 >= -1e-5) & (l2 >= -1e-5)
        izp = (
            l0 * tiz[:, 0, None, None]
            + l1 * tiz[:, 1, None, None]
            + l2 * tiz[:, 2, None, None]
        )
        zp = 1.0 / jnp.maximum(izp, 1e-12)
        good = inside & ok[:, None, None] & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        # Winner test vs the final z-buffer (tolerance half a mm).
        zref = depth.reshape(-1)[jnp.clip(py * w + px, 0, h * w - 1).reshape(f.shape[0], -1)].reshape(py.shape)
        win = good & (jnp.abs(zp - zref) < 0.5)
        idx = jnp.where(win, py * w + px, dump)
        colpix = jnp.broadcast_to(col[:, None, None, :], px.shape + (3,))
        return idx.reshape(-1), colpix.reshape(-1, 3)

    idxs, cols = jax.lax.map(
        raster_chunk,
        (
            faces_p.reshape(-1, chunk, 3),
            fcol_p.reshape(-1, chunk, 3),
            valid_tri.reshape(-1, chunk),
        ),
    )
    img = jnp.zeros((h * w + 1, 3), jnp.float32)
    img = img.at[idxs.reshape(-1)].set(cols.reshape(-1, 3))
    rgb = jnp.clip(img[: h * w].reshape(h, w, 3) * 255.0, 0, 255).astype(jnp.uint8)
    return rgb, depth


@functools.partial(jax.jit, static_argnames=("im_size", "tile_px", "chunk"))
def render_textured(
    pts: jnp.ndarray,
    faces: jnp.ndarray,
    uv: jnp.ndarray,
    texture: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    im_size: Tuple[int, int],
    clip_near: float = 100.0,
    clip_far: float = 10000.0,
    tile_px: int = 16,
    chunk: int = 8192,
    ambient: float = 0.4,
):
    """Depth + texture-mapped RGB (reference renderer.py:206-265,316-321:
    texture2D fetch modulated by flat-shaded light).

    uv: (V, 2) float texture coordinates in [0, 1], origin bottom-left
    (the reference flipud's the texture before GL upload, renderer.py:319
    — same convention here: v=0 is the BOTTOM row of ``texture``).
    texture: (Th, Tw, 3) float32 in [0, 1].
    Returns (rgb uint8 (H, W, 3), depth float32 (H, W)).

    UVs are interpolated perspective-correct per pixel (barycentric over
    attr/z, normalized by the interpolated 1/z), then sampled bilinearly —
    the TPU analog of the GL varying + texture2D path.
    """
    w, h = im_size
    depth = render_depth(
        pts, faces, K, R, t, im_size, clip_near, clip_far, tile_px, chunk
    )

    cam = pts @ R.T + jnp.reshape(t, (1, 3))
    z = cam[:, 2]
    u_s = cam[:, 0] / z * K[0, 0] + K[0, 2]
    v_s = cam[:, 1] / z * K[1, 1] + K[1, 2]
    inv_z = 1.0 / z
    uv_over_z = uv * inv_z[:, None]  # (V, 2) for perspective-correct interp

    # Per-face flat shade (headlight), like render_rgb_depth.
    p0, p1, p2 = cam[faces[:, 0]], cam[faces[:, 1]], cam[faces[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    shade_f = jnp.clip(ambient + (1 - ambient) * jnp.abs(n[:, 2]), 0.0, 1.0)

    nf = faces.shape[0]
    pad = (-nf) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    shade_p = jnp.pad(shade_f, (0, pad))
    valid_tri = jnp.pad(jnp.ones((nf,), bool), (0, pad))
    dump = h * w
    p = tile_px
    yy, xx = jnp.mgrid[0:p, 0:p]

    def raster_chunk(args):
        f, shd, tri_ok = args
        tu, tv, tiz, tz = u_s[f], v_s[f], inv_z[f], z[f]
        tuvz = uv_over_z[f]  # (chunk, 3, 2)
        front = jnp.all(tz > clip_near, 1) & jnp.all(tz < clip_far, 1)
        x0 = jnp.clip(jnp.floor(jnp.min(tu, 1)), 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(jnp.min(tv, 1)), 0, h - 1).astype(jnp.int32)
        fits = (jnp.max(tu, 1) - x0 < p) & (jnp.max(tv, 1) - y0 < p)
        ok = tri_ok & front & fits
        px = x0[:, None, None] + xx[None]
        py = y0[:, None, None] + yy[None]
        fx, fy = px.astype(jnp.float32), py.astype(jnp.float32)
        ax, ay = tu[:, 0, None, None], tv[:, 0, None, None]
        bx, by = tu[:, 1, None, None], tv[:, 1, None, None]
        cx, cy = tu[:, 2, None, None], tv[:, 2, None, None]
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        l0 = ((by - cy) * (fx - cx) + (cx - bx) * (fy - cy)) / d
        l1 = ((cy - ay) * (fx - cx) + (ax - cx) * (fy - cy)) / d
        l2 = 1.0 - l0 - l1
        # -1e-5 slack: pixels exactly on a shared edge can round to a tiny
        # negative lambda in BOTH triangles, leaving one-pixel cracks.
        inside = (l0 >= -1e-5) & (l1 >= -1e-5) & (l2 >= -1e-5)
        izp = (
            l0 * tiz[:, 0, None, None]
            + l1 * tiz[:, 1, None, None]
            + l2 * tiz[:, 2, None, None]
        )
        zp = 1.0 / jnp.maximum(izp, 1e-12)
        uvp = (
            l0[..., None] * tuvz[:, None, None, 0]
            + l1[..., None] * tuvz[:, None, None, 1]
            + l2[..., None] * tuvz[:, None, None, 2]
        ) * zp[..., None]  # (chunk, p, p, 2)
        good = inside & ok[:, None, None] & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        zref = depth.reshape(-1)[
            jnp.clip(py * w + px, 0, h * w - 1).reshape(f.shape[0], -1)
        ].reshape(py.shape)
        win = good & (jnp.abs(zp - zref) < 0.5)
        idx = jnp.where(win, py * w + px, dump)
        attr = jnp.concatenate(
            [uvp, jnp.broadcast_to(shd[:, None, None, None], px.shape + (1,))],
            axis=-1,
        )
        return idx.reshape(-1), attr.reshape(-1, 3)

    idxs, attrs = jax.lax.map(
        raster_chunk,
        (
            faces_p.reshape(-1, chunk, 3),
            shade_p.reshape(-1, chunk),
            valid_tri.reshape(-1, chunk),
        ),
    )
    buf = jnp.zeros((h * w + 1, 3), jnp.float32)
    buf = buf.at[idxs.reshape(-1)].set(attrs.reshape(-1, 3))
    uv_img = buf[: h * w, :2].reshape(h, w, 2)
    shade_img = buf[: h * w, 2].reshape(h, w)

    # Bilinear texture fetch; v=0 at the bottom row (GL convention).
    th, tw = texture.shape[0], texture.shape[1]
    tx = jnp.clip(uv_img[..., 0], 0.0, 1.0) * (tw - 1)
    ty = (1.0 - jnp.clip(uv_img[..., 1], 0.0, 1.0)) * (th - 1)
    x0i = jnp.floor(tx).astype(jnp.int32)
    y0i = jnp.floor(ty).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, tw - 1)
    y1i = jnp.minimum(y0i + 1, th - 1)
    wx = (tx - x0i)[..., None]
    wy = (ty - y0i)[..., None]
    tex = (
        texture[y0i, x0i] * (1 - wx) * (1 - wy)
        + texture[y0i, x1i] * wx * (1 - wy)
        + texture[y1i, x0i] * (1 - wx) * wy
        + texture[y1i, x1i] * wx * wy
    )
    rgb = tex * shade_img[..., None]
    rgb = jnp.where(depth[..., None] > 0, rgb, 0.0)
    return jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8), depth


def render(
    model: dict,
    im_size: Tuple[int, int],
    K: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    clip_near: float = 100.0,
    clip_far: float = 10000.0,
    mode: str = "depth",
    tile_px: int = 16,
    ssaa: int = 1,
    texture: Optional[np.ndarray] = None,
    surf_color: Optional[Tuple[float, float, float]] = None,
):
    """Reference-compatible entry (pysixd/renderer.py render:306).

    model: dict with 'pts' (mm) and 'faces'; 'colors' optional for rgb.
    Returns depth (H, W) float32 mm for mode='depth', (rgb, depth) for
    'rgb+depth', rgb for 'rgb'.  ``ssaa`` supersamples the RGB render
    (the reference renders templates at 4x and downsamples,
    renderer.py surface_color / linemod_and_levelup_test.py:233).

    ``texture``: (Th, Tw, 3) image (uint8 or [0,1] float).  When given and
    the model has 'texture_uv' (load_ply parses it), RGB is texture-mapped
    with perspective-correct UV interpolation instead of vertex-colored
    (reference renderer.py:316-321 — T-LESS canon/reconst, rutgers).

    ``surf_color``: (r, g, b) in [0, 1] — flat surface color overriding
    the model's vertex colors (reference renderer.py:324-333, used by
    t_less_toolkit/check_poses_*.py to color objects per id).
    """
    # A flat surf_color does not invalidate the subdivision cache: the
    # tessellated geometry is color-independent, so keep the ORIGINAL
    # model dict (and its _subdiv_cache) and override the interpolated
    # colors after subdivision — check_poses_tless renders each mesh
    # hundreds of times with per-id flat colors and re-subdividing per
    # call dominated its runtime.
    flat_color = (
        np.asarray(surf_color, np.float64) * 255.0
        if surf_color is not None
        else None
    )
    if flat_color is not None:
        texture = None
    if ssaa > 1 and mode in ("rgb", "rgb+depth"):
        w, h = im_size
        Ks = np.asarray(K, np.float64) * 1.0
        Ks = Ks.copy()
        Ks[0] *= ssaa
        Ks[1] *= ssaa
        Ks[2, 2] = 1.0
        out = render(
            model, (w * ssaa, h * ssaa), Ks, R, t,
            clip_near, clip_far, mode, tile_px, ssaa=1, texture=texture,
            surf_color=surf_color,
        )
        rgb_hi, depth_hi = out if mode == "rgb+depth" else (out, None)
        rgb_np = np.asarray(rgb_hi, np.float32)
        rgb_lo = rgb_np.reshape(h, ssaa, w, ssaa, 3).mean((1, 3)).astype(np.uint8)
        if mode == "rgb":
            return rgb_lo
        depth_np = np.asarray(depth_hi)
        depth_lo = depth_np.reshape(h, ssaa, w, ssaa)
        # depth: take the nearest valid sample per cell (mean would blur
        # edges into false depths).
        dval = np.where(depth_lo > 0, depth_lo, np.inf).min((1, 3))
        depth_lo = np.where(np.isfinite(dval), dval, 0.0).astype(np.float32)
        return rgb_lo, depth_lo
    pts_np = np.asarray(model["pts"], np.float64)
    faces_np = np.asarray(model["faces"], np.int64)
    colors_np = model.get("colors")
    col_np = (
        np.full((len(pts_np), 3), 127.0)
        if colors_np is None
        else np.asarray(colors_np, np.float64)
    )
    use_texture = texture is not None and "texture_uv" in model
    uv_np = (
        np.asarray(model["texture_uv"], np.float64)
        if use_texture
        else np.zeros((len(pts_np), 2))
    )
    # Attributes carried through subdivision: colors + uv.
    attr_np = np.concatenate([col_np, uv_np], axis=1)

    # Auto-subdivide so every projected triangle fits the raster tile.
    # The subdivision level k is quantized to powers of two so the mesh
    # shape (and hence the jit cache key) doesn't churn with pose depth;
    # results are cached on the model dict.
    cam_z = (
        pts_np @ np.asarray(R, np.float64).T
        + np.asarray(t, np.float64).reshape(1, 3)
    )[:, 2]
    z_min = max(float(cam_z.min()), float(clip_near))
    Kn = np.asarray(K, np.float64)
    ppm = max(Kn[0, 0], Kn[1, 1]) / z_min
    tri = pts_np[faces_np]
    edge_max = float(
        max(
            np.linalg.norm(tri[:, 0] - tri[:, 1], axis=1).max(),
            np.linalg.norm(tri[:, 1] - tri[:, 2], axis=1).max(),
            np.linalg.norm(tri[:, 2] - tri[:, 0], axis=1).max(),
        )
    ) if len(tri) else 0.0
    max_edge_px = edge_max * ppm
    budget = tile_px - 2
    if max_edge_px > budget:
        k = int(np.ceil(np.log2(max_edge_px / budget)))
        cache = model.setdefault("_subdiv_cache", {})
        if k not in cache:
            cache[k] = subdivide_mesh(
                pts_np, faces_np, max_edge=edge_max / (2**k), attrs=attr_np
            )
        pts_np, faces_np, attr_np = cache[k]
        col_np, uv_np = attr_np[:, :3], attr_np[:, 3:5]
    if flat_color is not None:
        col_np = np.tile(flat_color, (len(pts_np), 1))

    pts = jnp.asarray(pts_np.astype(np.float32))
    faces = jnp.asarray(faces_np.astype(np.int32))
    Kj = jnp.asarray(np.asarray(K, np.float32))
    Rj = jnp.asarray(np.asarray(R, np.float32))
    tj = jnp.asarray(np.asarray(t, np.float32).flatten())
    if mode == "depth":
        return render_depth(
            pts, faces, Kj, Rj, tj, tuple(im_size), clip_near, clip_far, tile_px
        )
    if use_texture:
        tex_np = np.asarray(texture, np.float32)
        if tex_np.max() > 1.0:
            tex_np = tex_np / 255.0
        rgb, depth = render_textured(
            pts, faces,
            jnp.asarray(uv_np.astype(np.float32)),
            jnp.asarray(tex_np[..., :3]),
            Kj, Rj, tj, tuple(im_size), clip_near, clip_far, tile_px,
        )
    else:
        col = jnp.asarray((col_np / 255.0).astype(np.float32))
        rgb, depth = render_rgb_depth(
            pts, faces, col, Kj, Rj, tj, tuple(im_size), clip_near, clip_far, tile_px
        )
    if mode == "rgb":
        return rgb
    return rgb, depth
