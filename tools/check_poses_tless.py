#!/usr/bin/env python3
"""Render T-LESS GT poses into test/train images for visual checking
(t_less_toolkit/check_poses_test_imgs.py + check_poses_train_imgs.py,
one driver for both splits, PNG outputs instead of matplotlib windows).

For every im_step-th image of each scene/object: an RGB overlay of the
models rendered at their GT poses (colored per object id, GT bounding
boxes drawn), and for depth-bearing sensors a captured-minus-rendered
depth-difference map (mm) as a signed-color PNG.

Example:
  python tools/check_poses_tless.py --base-path /data/t-less_v2 \
      --split test --device primesense --scenes 1 2 3 --im-step 100 \
      --out vis_check/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _object_color(obj_id: int, table=None):
    """Color for an object id: row from a load_colors table when given,
    else a deterministic golden-angle hue (the toolkit ships a fixed
    obj_rgb.txt; without the dataset we synthesize an equivalent)."""
    if table is not None and 0 < obj_id <= len(table):
        return tuple(table[obj_id - 1])
    h = (obj_id * 0.61803398875) % 1.0
    i = int(h * 6.0)
    f = h * 6.0 - i
    v, p, q, tt = 1.0, 0.25, 1.0 - 0.75 * f, 0.25 + 0.75 * f
    rgb = [(v, tt, p), (q, v, p), (p, v, tt), (p, q, v), (tt, p, v), (v, p, q)]
    return rgb[i % 6]


def _draw_rect(im: np.ndarray, rect, color=(255, 255, 255)) -> np.ndarray:
    """Rectangle outline, rect = [x, y, w, h] (pytless/misc.py draw_rect)."""
    from PIL import Image, ImageDraw

    pil = Image.fromarray(im)
    d = ImageDraw.Draw(pil)
    d.rectangle(
        (rect[0], rect[1], rect[0] + rect[2], rect[1] + rect[3]),
        outline=tuple(int(c) for c in color),
    )
    return np.array(pil)


def _depth_diff_png(diff: np.ndarray, limit: float = 50.0) -> np.ndarray:
    """Signed depth difference (mm) -> red(neg)/blue(pos) uint8 image."""
    x = np.clip(diff / limit, -1.0, 1.0)
    img = np.full(diff.shape + (3,), 255, np.uint8)
    img[..., 1] = (255 * (1.0 - np.abs(x))).astype(np.uint8)
    img[..., 0] = np.where(x > 0, img[..., 1], 255)
    img[..., 2] = np.where(x > 0, 255, img[..., 1])
    img[diff == 0] = 0
    return img


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base-path", required=True)
    ap.add_argument("--split", choices=["test", "train"], default="test")
    ap.add_argument("--device", default="primesense",
                    choices=["primesense", "kinect", "canon"])
    ap.add_argument("--model-type", default="cad",
                    choices=["cad", "reconst"])
    ap.add_argument("--scenes", type=int, nargs="+",
                    default=list(range(1, 21)),
                    help="scene ids (test) or object ids (train)")
    ap.add_argument("--im-step", type=int, default=100)
    ap.add_argument("--obj-colors", default=None,
                    help="optional obj_rgb.txt color table")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from sixdpose_tpu.data import inout
    from sixdpose_tpu.geometry.render import render

    rgb_ext = {"primesense": "png", "kinect": "png", "canon": "jpg"}[args.device]
    base = args.base_path
    split_dir = f"{args.split}_{args.device}"
    model_mask = os.path.join(
        base, f"models_{args.model_type}", "obj_{:02d}.ply")
    os.makedirs(args.out, exist_ok=True)
    colors = inout.load_colors(args.obj_colors) if args.obj_colors else None

    models = {}
    for scene_id in args.scenes:
        scene_dir = os.path.join(base, split_dir, f"{scene_id:02d}")
        info = inout.load_info(os.path.join(scene_dir, "info.yml"))
        gts = inout.load_gt(os.path.join(scene_dir, "gt.yml"))
        for gt_list in gts.values():
            for gt in gt_list:
                oid = gt["obj_id"]
                if oid not in models:
                    models[oid] = inout.load_ply(model_mask.format(oid))
        for im_id in sorted(info.keys()):
            if im_id % args.im_step != 0:
                continue
            K = info[im_id]["cam_K"]
            rgb = inout.load_im(os.path.join(
                scene_dir, "rgb", f"{im_id:04d}.{rgb_ext}"))
            h, w = rgb.shape[:2]
            vis = np.zeros(rgb.shape, np.float64)
            ren_depth = np.zeros((h, w), np.float64)
            for gt in gts[im_id]:
                oid = gt["obj_id"]
                ren_rgb, d = render(
                    models[oid], (w, h), K, gt["cam_R_m2c"], gt["cam_t_m2c"],
                    mode="rgb+depth",
                    surf_color=_object_color(oid, colors),
                )
                ren_rgb = np.asarray(ren_rgb)
                if "obj_bb" in gt:
                    ren_rgb = _draw_rect(ren_rgb, gt["obj_bb"])
                vis += 0.7 * ren_rgb.astype(np.float64)
                d = np.asarray(d, np.float64)
                closer = (ren_depth == 0) | ((d > 0) & (d < ren_depth))
                ren_depth = np.where((d > 0) & closer, d, ren_depth)
            vis = np.clip(0.6 * vis + 0.4 * rgb, 0, 255).astype(np.uint8)
            stem = f"{scene_id:02d}_{args.device}_{args.model_type}_{im_id:04d}"
            inout.save_im(os.path.join(args.out, stem + "_rgb.png"), vis)

            depth_path = os.path.join(scene_dir, "depth", f"{im_id:04d}.png")
            if args.device != "canon" and os.path.exists(depth_path):
                depth = inout.load_depth(depth_path).astype(np.float64) * 0.1
                valid = (depth > 0) & (ren_depth > 0)
                diff = np.where(valid, depth - ren_depth, 0.0)
                inout.save_im(
                    os.path.join(args.out, stem + "_depth_diff.png"),
                    _depth_diff_png(diff),
                )
            print(f"scene {scene_id} im {im_id}: wrote {stem}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
