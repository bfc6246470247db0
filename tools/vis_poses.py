#!/usr/bin/env python3
"""Visualize estimated or GT poses as render overlays (reference:
tools/vis_sixd_poses.py / vis_gt_poses.py, writing PNGs instead of
imshow windows).

Example:
  python tools/vis_poses.py --dataset hinterstoisser --scene 6 \
      --results results/sixdpose --out vis/
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="hinterstoisser")
    ap.add_argument("--base-path", default=None)
    ap.add_argument("--scene", type=int, required=True)
    ap.add_argument("--results", default=None, help="omit to draw GT poses")
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from sixdpose_tpu.data import get_dataset_params, inout
    from sixdpose_tpu.geometry.render import render

    dp = get_dataset_params(args.dataset, base_path=args.base_path)
    scene_info = inout.load_info(dp["scene_info_mpath"].format(args.scene))
    gts = inout.load_gt(dp["scene_gt_mpath"].format(args.scene))
    os.makedirs(args.out, exist_ok=True)
    models = {}

    for im_id in sorted(scene_info.keys()):
        K = scene_info[im_id]["cam_K"]
        rgb = inout.load_im(dp["test_rgb_mpath"].format(args.scene, im_id)).copy()
        poses = []
        if args.results:
            for p in glob.glob(
                os.path.join(args.results, f"{args.scene:02d}", f"{im_id:04d}_*.yml")
            ):
                m = re.match(r"\d+_(\d+)\.yml", os.path.basename(p))
                res = inout.load_results_sixd17(p)
                for e in res["ests"]:
                    poses.append((int(m.group(1)), e["R"], e["t"]))
        else:
            for g in gts.get(im_id, []):
                poses.append((g["obj_id"], g["cam_R_m2c"], g["cam_t_m2c"]))
        vis = rgb.astype(np.float32)
        for oid, R, t in poses:
            if oid not in models:
                models[oid] = inout.load_ply(dp["model_mpath"].format(oid))
            d = np.asarray(
                render(models[oid], (rgb.shape[1], rgb.shape[0]), K, R, t, mode="depth")
            )
            mask = d > 0
            vis[mask] = (
                (1 - args.alpha) * vis[mask]
                + args.alpha * np.array([0, 255, 0], np.float32)
            )
        out = os.path.join(args.out, f"{args.scene:02d}_{im_id:04d}.png")
        inout.save_im(out, vis.astype(np.uint8))
        print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
