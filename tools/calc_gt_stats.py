#!/usr/bin/env python3
"""GT visibility statistics (reference: tools/calc_gt_stats.py): per GT
pose, render the model, estimate the visibility mask against the test
depth, and record visib_fract.

Example:
  python tools/calc_gt_stats.py --dataset hinterstoisser --scenes 6 \
      --delta 15 --out stats/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="hinterstoisser")
    ap.add_argument("--base-path", default=None)
    ap.add_argument("--scenes", type=int, nargs="*", default=None)
    ap.add_argument("--delta", type=float, default=15.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax.numpy as jnp

    from sixdpose_tpu.data import get_dataset_params, inout
    from sixdpose_tpu.eval.misc import depth_im_to_dist_im
    from sixdpose_tpu.eval.pose_error import estimate_visib_mask_gt
    from sixdpose_tpu.geometry.render import render

    dp = get_dataset_params(args.dataset, base_path=args.base_path)
    scenes = args.scenes or range(1, dp["scene_count"] + 1)
    os.makedirs(args.out, exist_ok=True)

    models = {}
    for scene_id in scenes:
        gts = inout.load_gt(dp["scene_gt_mpath"].format(scene_id))
        scene_info = inout.load_info(dp["scene_info_mpath"].format(scene_id))
        stats = {}
        for im_id, gts_im in sorted(gts.items()):
            K = scene_info[im_id]["cam_K"]
            depth = inout.load_depth(dp["test_depth_mpath"].format(scene_id, im_id))
            dist_test = depth_im_to_dist_im(jnp.asarray(depth.astype(np.float32)), jnp.asarray(K))
            entries = []
            for gt in gts_im:
                oid = gt["obj_id"]
                if oid not in models:
                    models[oid] = inout.load_ply(dp["model_mpath"].format(oid))
                d = render(
                    models[oid], (depth.shape[1], depth.shape[0]), K,
                    gt["cam_R_m2c"], gt["cam_t_m2c"], mode="depth",
                )
                dist_gt = depth_im_to_dist_im(d, jnp.asarray(K))
                visib = np.asarray(estimate_visib_mask_gt(dist_test, dist_gt, args.delta))
                full = np.asarray(d) > 0
                frac = float(visib.sum()) / max(int(full.sum()), 1)
                entries.append({"visib_fract": frac, "px_count_all": int(full.sum())})
            stats[int(im_id)] = entries
        out_path = os.path.join(args.out, f"{scene_id:02d}_delta={args.delta:g}.yml")
        with open(out_path, "w") as f:
            yaml.dump(stats, f, default_flow_style=None)
        print(f"scene {scene_id} -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
