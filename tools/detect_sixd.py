#!/usr/bin/env python3
"""Run detection + refinement over SIXD test scenes and write SIXD-2017
result files (reference: the 'test' mode of linemod_and_levelup_test.py
:278-394 + inout.save_results_sixd17).

Example:
  python tools/detect_sixd.py --dataset hinterstoisser --scenes 6 \
      --banks banks/ --out results/sixdpose_hinterstoisser
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="hinterstoisser")
    ap.add_argument("--base-path", default=None)
    ap.add_argument("--scenes", type=int, nargs="*", default=None)
    ap.add_argument("--banks", default="banks")
    ap.add_argument("--threshold", type=float, default=75.0)
    ap.add_argument("--max-refine", type=int, default=8)
    ap.add_argument("--out", default="results/sixdpose")
    args = ap.parse_args()

    from sixdpose_tpu.config import DetectorConfig
    from sixdpose_tpu.data import get_dataset_params, inout
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.serving import PoseEstimationService

    dp = get_dataset_params(args.dataset, base_path=args.base_path)
    scenes = args.scenes or range(1, dp["scene_count"] + 1)

    for scene_id in scenes:
        obj_id = scene_id  # SIXD: scene k contains object k (+ others)
        bank_path = os.path.join(args.banks, f"obj_{obj_id:02d}.npz")
        model_path = dp["model_mpath"].format(obj_id)
        if not (os.path.exists(bank_path) and os.path.exists(model_path)):
            print(f"scene {scene_id}: bank or model missing; skipping")
            continue
        det = Detector.read_classes(bank_path, DetectorConfig())
        model = inout.load_ply(model_path)
        cid = det.class_ids()[0]

        scene_info = inout.load_info(dp["scene_info_mpath"].format(scene_id))
        out_dir = os.path.join(args.out, f"{scene_id:02d}")
        os.makedirs(out_dir, exist_ok=True)
        for im_id in sorted(scene_info.keys()):
            K = scene_info[im_id]["cam_K"]
            rgb = inout.load_im(dp["test_rgb_mpath"].format(scene_id, im_id))
            depth = inout.load_depth(dp["test_depth_mpath"].format(scene_id, im_id))
            svc = PoseEstimationService(
                det, {cid: model}, K,
                threshold=args.threshold, max_refine=args.max_refine,
            )
            t0 = time.time()
            ests = svc.process_frame(rgb, depth)
            run_time = time.time() - t0
            res = {
                "ests": [
                    {"score": e.similarity / 100.0, "R": e.R, "t": e.t}
                    for e in ests
                ]
            }
            out = os.path.join(out_dir, f"{im_id:04d}_{obj_id:02d}.yml")
            inout.save_results_sixd17(out, res, run_time)
            print(f"scene {scene_id} im {im_id}: {len(ests)} ests {run_time:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
