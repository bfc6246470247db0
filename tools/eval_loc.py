#!/usr/bin/env python3
"""6D localization scores from calculated errors (reference: tools/eval_loc.py).

Protocol (eval_loc.py:7-14, 205-216): n_top=1, VSD threshold 0.3, ADD/ADI
threshold 0.1 x object diameter, GT valid when visib_fract >= 0.1.
For 'hinterstoisser', also reports the LINEMOD (scene==obj) and Occlusion
(scene 2, 9 objects) splits.

Example:
  python tools/eval_loc.py --dataset hinterstoisser \
      --errors eval/sixdpose/error=vsd_ntop=1_delta=15_tau=20_cost=step
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="hinterstoisser")
    ap.add_argument("--base-path", default=None)
    ap.add_argument("--errors", required=True, help="error dir from eval_calc_errors")
    ap.add_argument("--error-type", default=None, help="inferred from dir name")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--visib-gt-min", type=float, default=0.1)
    ap.add_argument("--n-top", type=int, default=1)
    args = ap.parse_args()

    from sixdpose_tpu.data import get_dataset_params, inout
    from sixdpose_tpu.eval.loc import calc_scores, match_scene, split_hinterstoisser
    from sixdpose_tpu.eval.misc import model_diameter

    dp = get_dataset_params(args.dataset, base_path=args.base_path)

    err_name = os.path.basename(os.path.normpath(args.errors))
    etype = args.error_type or err_name.split("_")[0].split("=")[1]

    # Per-object error thresholds (eval_loc.py:205-216).
    diameters = {}
    if etype in ("add", "adi"):
        info_path = dp["models_info_path"]
        if os.path.exists(info_path):
            with open(info_path) as f:
                minfo = yaml.safe_load(f)
            diameters = {int(k): float(v["diameter"]) for k, v in minfo.items()}

    def thresh_for(obj_id: int) -> float:
        if args.threshold is not None:
            return args.threshold
        if etype == "vsd":
            return 0.3
        if etype in ("add", "adi"):
            return 0.1 * diameters.get(obj_id, 100.0)
        return {"cou": 0.5, "re": 5.0, "te": 50.0}.get(etype, 0.3)

    all_matches = []
    scene_ids = []
    obj_ids = set()
    for err_path in sorted(glob.glob(os.path.join(args.errors, "errors_*.yml"))):
        scene_id = int(os.path.basename(err_path)[7:9])
        scene_ids.append(scene_id)
        errors = inout.load_errors(err_path)
        gts = inout.load_gt(dp["scene_gt_mpath"].format(scene_id))
        # GT visibility stats if present; default fully visible.
        stats_path = dp["scene_gt_stats_mpath"].format(scene_id, 15)
        visib = {}
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                st = yaml.safe_load(f)
            visib = {
                int(im): [g["visib_fract"] for g in lst] for im, lst in st.items()
            }
        gt_visib = {
            im: visib.get(im, [1.0] * len(lst)) for im, lst in gts.items()
        }
        errs_by_im = {}
        threshs = {}
        for e in errors:
            errs_by_im.setdefault(e["im_id"], {}).setdefault(e["obj_id"], []).append(e)
            obj_ids.add(e["obj_id"])
            threshs[e["obj_id"]] = thresh_for(e["obj_id"])
        for lst in gts.values():
            for g in lst:
                obj_ids.add(g["obj_id"])
                threshs.setdefault(g["obj_id"], thresh_for(g["obj_id"]))
        all_matches += match_scene(
            gts, gt_visib, errs_by_im, scene_id, threshs,
            n_top=args.n_top, visib_gt_min=args.visib_gt_min,
        )

    obj_ids = sorted(obj_ids)
    print("== all scenes ==")
    calc_scores(scene_ids, obj_ids, all_matches, args.n_top, do_print=True)
    if args.dataset == "hinterstoisser":
        lm, occ, occ_objs = split_hinterstoisser(all_matches)
        print("== LINEMOD split (scene == obj) ==")
        calc_scores(scene_ids, obj_ids, lm, args.n_top, do_print=True)
        if occ:
            print("== Occlusion split (scene 2) ==")
            calc_scores([2], occ_objs, occ, args.n_top, do_print=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
