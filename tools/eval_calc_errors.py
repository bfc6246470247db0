#!/usr/bin/env python3
"""Calculate per-estimate pose errors for SIXD result files.

Reference: tools/eval_calc_errors.py (protocol at :34-42: n_top=1, VSD
delta=15 tau=20 cost=step).

Example:
  python tools/eval_calc_errors.py --dataset hinterstoisser \
      --results results/sixdpose --error vsd --out eval/sixdpose
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="hinterstoisser")
    ap.add_argument("--base-path", default=None)
    ap.add_argument("--results", required=True)
    ap.add_argument("--error", default="vsd",
                    choices=["vsd", "add", "adi", "cou", "re", "te"])
    ap.add_argument("--n-top", type=int, default=1)
    ap.add_argument("--vsd-delta", type=float, default=15)
    ap.add_argument("--vsd-tau", type=float, default=20)
    ap.add_argument("--vsd-cost", default="step")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from sixdpose_tpu.data import get_dataset_params, inout
    from sixdpose_tpu.eval.loc import calc_errors

    dp = get_dataset_params(args.dataset, base_path=args.base_path)

    sign = f"error={args.error}_ntop={args.n_top}"
    if args.error == "vsd":
        sign += f"_delta={args.vsd_delta:g}_tau={args.vsd_tau:g}_cost={args.vsd_cost}"

    models = {}
    for scene_dir in sorted(glob.glob(os.path.join(args.results, "[0-9][0-9]"))):
        scene_id = int(os.path.basename(scene_dir))
        gts = inout.load_gt(dp["scene_gt_mpath"].format(scene_id))
        scene_info = inout.load_info(dp["scene_info_mpath"].format(scene_id))
        errors = []
        for res_path in sorted(glob.glob(os.path.join(scene_dir, "*.yml"))):
            m = re.match(r"(\d+)_(\d+)\.yml", os.path.basename(res_path))
            if not m:
                continue
            im_id, obj_id = int(m.group(1)), int(m.group(2))
            if obj_id not in models:
                models[obj_id] = inout.load_ply(dp["model_mpath"].format(obj_id))
            res = inout.load_results_sixd17(res_path)
            gts_im = [g for g in gts.get(im_id, []) if g["obj_id"] == obj_id]
            if not gts_im:
                continue
            K = scene_info[im_id]["cam_K"]
            depth = (
                inout.load_depth(dp["test_depth_mpath"].format(scene_id, im_id))
                if args.error in ("vsd", "cou")
                else None
            )
            errs = calc_errors(
                res["ests"], gts_im, models[obj_id], depth, K,
                error_type=args.error, n_top=args.n_top,
                vsd_delta=args.vsd_delta, vsd_tau=args.vsd_tau,
                vsd_cost=args.vsd_cost,
            )
            for e in errs:
                errors.append(
                    {
                        "im_id": im_id,
                        "obj_id": obj_id,
                        "est_id": e["est_id"],
                        "score": float(e["score"]),
                        "errors": {int(k): float(v) for k, v in e["errors"].items()},
                    }
                )
        out_dir = os.path.join(args.out, sign)
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"errors_{scene_id:02d}.yml")
        inout.save_errors(out_path, errors)
        print(f"scene {scene_id}: {len(errors)} error entries -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
