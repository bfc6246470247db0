"""Render-based template training.

Reference flow (linemod_and_levelup_test.py:263-272 'render_train' mode and
linemod_ros/train.py:21-128): sample camera views on a sphere around the
object, render RGB-D at each view, and add a template per view with the
render's depth>0 mask; per-template pose info (cam_K, cam_R_w2c,
cam_t_w2c) is stored alongside (inout.save_info).

Here the renders come from the JAX rasterizer in device-side batches; the
(host-side, greedy) feature extraction runs per view as in the reference.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.geometry.view_sampler import sample_views
from sixdpose_tpu.models.detector import Detector


def render_train_templates(
    detector: Detector,
    class_id: str,
    model: dict,
    K: np.ndarray,
    radii: Sequence[float],
    min_n_views: int = 100,
    im_size: Tuple[int, int] = (640, 480),
    azimuth_range: Tuple[float, float] = (0.0, 2 * math.pi),
    elev_range: Tuple[float, float] = (0.0, 0.5 * math.pi),
    tilt_range: Tuple[float, float] = (-0.5 * math.pi, 0.5 * math.pi),
    tilt_step: float = 0.2 * math.pi,
    verbose: bool = False,
) -> Dict[str, int]:
    """Train a template bank from rendered views.

    Args:
      detector: target detector (templates are added to its bank).
      model: mesh dict with 'pts' (mm), 'faces', optional 'colors'.
      K: (3, 3) camera intrinsics used for the renders.
      radii: view-sphere radii in mm; each radius is a scale variant
        (reference renders radii like [600] or [800, 1000],
        linemod_ros/train.py:32).

    Returns stats: {'added': n_ok, 'failed': n_fail} (the reference skips
    views whose extraction fails, linemod_and_levelup_test.py:155).
    """
    import jax
    import jax.numpy as jnp

    from sixdpose_tpu.geometry.render import render_rgb_depth, subdivide_mesh

    added = failed = 0
    for radius in radii:
        views, _levels = sample_views(
            min_n_views,
            radius=float(radius),
            azimuth_range=azimuth_range,
            elev_range=elev_range,
            tilt_range=tilt_range,
            tilt_step=tilt_step,
        )

        # Pre-subdivide once for this radius so the batched renderer's
        # fixed tile covers every projected triangle.
        pts_np = np.asarray(model["pts"], np.float64)
        faces_np = np.asarray(model["faces"], np.int64)
        colors_np = (
            np.asarray(model.get("colors"), np.float64)
            if model.get("colors") is not None
            else np.full((len(pts_np), 3), 127.0)
        )
        # Texture-mapped models (reference renderer.py:316-321): carry UVs
        # through subdivision alongside colors and render via the textured
        # rasterizer below.
        use_texture = (
            model.get("texture") is not None and "texture_uv" in model
        )
        if use_texture:
            colors_np = np.concatenate(
                [colors_np, np.asarray(model["texture_uv"], np.float64)], 1
            )
        extent = float(np.linalg.norm(pts_np, axis=1).max())
        z_min = max(float(radius) - extent, 50.0)
        ppm = max(K[0][0], K[1][1]) / z_min
        tri = pts_np[faces_np]
        edge_max = float(
            max(
                np.linalg.norm(tri[:, 0] - tri[:, 1], axis=1).max(),
                np.linalg.norm(tri[:, 1] - tri[:, 2], axis=1).max(),
                np.linalg.norm(tri[:, 2] - tri[:, 0], axis=1).max(),
            )
        )
        if edge_max * ppm > 14:
            pts_np, faces_np, colors_np = subdivide_mesh(
                pts_np, faces_np, max_edge=14.0 / ppm, attrs=colors_np
            )
        ptsj = jnp.asarray(pts_np.astype(np.float32))
        facesj = jnp.asarray(faces_np.astype(np.int32))
        if use_texture:
            uvj = jnp.asarray(colors_np[:, 3:5].astype(np.float32))
            tex_np = np.asarray(model["texture"], np.float32)
            if tex_np.max() > 1.0:
                tex_np = tex_np / 255.0
            texj = jnp.asarray(tex_np[..., :3])
        else:
            colj = jnp.asarray((colors_np / 255.0).astype(np.float32))
        Kj = jnp.asarray(np.asarray(K, np.float32))

        # Render + quantize views in device batches (two dispatches per
        # chunk of 16 views; per-view device round trips through the
        # extraction path were the training bottleneck).
        from sixdpose_tpu.models.templates import extract_template_from_quantized
        from sixdpose_tpu.ops import quantize as Q

        cfg = detector.cfg
        levels = cfg.pyramid_levels
        batch = 16
        if use_texture:
            from sixdpose_tpu.geometry.render import render_textured

            batch_render = jax.jit(
                jax.vmap(
                    lambda R, t: render_textured(
                        ptsj, facesj, uvj, texj, Kj, R, t, tuple(im_size)
                    )
                )
            )
        else:
            batch_render = jax.jit(
                jax.vmap(
                    lambda R, t: render_rgb_depth(
                        ptsj, facesj, colj, Kj, R, t, tuple(im_size)
                    )
                )
            )

        def quantize_one(rgb, dep):
            color = []
            if cfg.use_color:
                cur = rgb
                for l in range(levels):
                    if l > 0:
                        cur = Q.pyr_down_rgb(cur)
                    color.append(
                        Q.quantize_color_gradient(cur, cfg.color.weak_threshold)
                    )
            dls = (
                Q.depth_normal_pyramid(
                    dep,
                    levels,
                    cfg.depth.distance_threshold,
                    cfg.depth.difference_threshold,
                    cfg.depth.focal,
                    cfg.depth.lut_parity,
                )
                if cfg.use_depth
                else []
            )
            return tuple(color), tuple(dls)

        batch_quantize = jax.jit(jax.vmap(quantize_one))

        vi = 0
        for b0 in range(0, len(views), batch):
            vs = views[b0 : b0 + batch]
            Rs = jnp.asarray(np.stack([v["R"] for v in vs]).astype(np.float32))
            ts = jnp.asarray(
                np.stack([v["t"].flatten() for v in vs]).astype(np.float32)
            )
            pad = batch - len(vs)
            if pad:
                Rs = jnp.concatenate([Rs, jnp.tile(Rs[-1:], (pad, 1, 1))])
                ts = jnp.concatenate([ts, jnp.tile(ts[-1:], (pad, 1))])
            rgb_b, dep_b = batch_render(Rs, ts)
            color_b, depth_b = batch_quantize(
                rgb_b, dep_b.astype(jnp.uint16)
            )
            rgb_np = np.asarray(rgb_b)
            dep_np = np.asarray(dep_b)
            color_np = jax.device_get(color_b)
            depth_np = jax.device_get(depth_b)

            for j, view in enumerate(vs):
                depth_mm = dep_np[j]
                mask = (depth_mm > 0).astype(np.uint8) * 255
                if mask.sum() == 0:
                    failed += 1
                    vi += 1
                    continue
                color_levels = (
                    [(color_np[l][0][j], color_np[l][1][j]) for l in range(levels)]
                    if cfg.use_color
                    else None
                )
                depth_levels = (
                    [depth_np[l][j] for l in range(levels)]
                    if cfg.use_depth
                    else None
                )
                tl = extract_template_from_quantized(
                    color_levels, depth_levels, mask, cfg
                )
                if tl is None:
                    failed += 1
                else:
                    # Train-time ICP artifacts: the visible-surface cloud,
                    # render bbox, and anchor depth, so serving never has
                    # to re-render templates (serving.py).
                    from sixdpose_tpu.models.refine import sample_model_points

                    icp_pts, icp_valid, (pys, pxs) = sample_model_points(
                        depth_mm.astype(np.uint16), np.asarray(K), 512,
                        return_pixels=True,
                    )
                    icp_colors = rgb_np[j][pys, pxs].astype(np.uint8)
                    ys_r, xs_r = np.nonzero(depth_mm > 0)
                    info = {
                        "cam_K": np.asarray(K, np.float64),
                        "cam_R_w2c": np.asarray(view["R"], np.float64),
                        "cam_t_w2c": np.asarray(view["t"], np.float64).reshape(3, 1),
                        "radius": float(radius),
                        "view_id": vi,
                        "icp_points": icp_pts[icp_valid].astype(np.float32),
                        "icp_colors": icp_colors,
                        "render_bbox": np.array(
                            [xs_r.min(), ys_r.min(), xs_r.max(), ys_r.max()]
                        ),
                        "anchor_depth": float(np.median(depth_mm[depth_mm > 0])),
                    }
                    detector.bank.add_template_levels(class_id, tl, info=info)
                    detector.invalidate(class_id)
                    added += 1
                vi += 1
            if verbose and (b0 // batch) % 4 == 0:
                print(f"radius {radius}: view {vi}/{len(views)} added={added}")
    return {"added": added, "failed": failed}


def template_pose(detector: Detector, class_id: str, template_id: int):
    """(K, R, t) recorded for a template (for ICP seeding, reference
    linemod_and_levelup_test.py:345-376 reads the saved info YAML)."""
    info = detector.bank.infos[class_id][template_id]
    return info["cam_K"], info["cam_R_w2c"], info["cam_t_w2c"]
