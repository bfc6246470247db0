#!/usr/bin/env python3
"""Train template banks for SIXD dataset objects by rendering view spheres.

Reference: tools/render_train_imgs.py (per-dataset radii table :29-81) +
the 'render_train' mode of linemod_and_levelup_test.py:164-272, as one CLI.

Example:
  python tools/train_templates.py --dataset hinterstoisser --objects 6 \
      --radii 600 --min-views 100 --out banks/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# Per-dataset view-sphere radii (reference render_train_imgs.py:29-81).
DEFAULT_RADII = {
    "hinterstoisser": [600],
    "tless": [650],
    "tudlight": [850],
    "rutgers": [590],
    "tejani": [720],
    "doumanoglou": [455],
    "toyotalight": [600],
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="hinterstoisser")
    ap.add_argument("--base-path", default=None, help="SIXD datasets root")
    ap.add_argument("--objects", type=int, nargs="*", default=None)
    ap.add_argument("--radii", type=float, nargs="*", default=None)
    ap.add_argument("--min-views", type=int, default=100)
    ap.add_argument("--max-feats", type=int, default=63)
    ap.add_argument("--t-levels", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--im-size", type=int, nargs=2, default=None,
                    help="override render size (W H)")
    ap.add_argument("--out", default="banks")
    args = ap.parse_args()

    from sixdpose_tpu.config import ColorGradientConfig, DepthNormalConfig, DetectorConfig
    from sixdpose_tpu.data import get_dataset_params, inout
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.models.train import render_train_templates

    dp = get_dataset_params(args.dataset, base_path=args.base_path)
    K = dp["cam"]["K"] if dp.get("cam") else np.array(
        [[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1]]
    )
    radii = args.radii or DEFAULT_RADII.get(args.dataset, [600])
    objects = args.objects or range(1, dp["obj_count"] + 1)

    os.makedirs(args.out, exist_ok=True)
    cfg = DetectorConfig(
        t_at_level=tuple(args.t_levels),
        color=ColorGradientConfig(num_features=args.max_feats),
        depth=DepthNormalConfig(num_features=args.max_feats),
    )
    for obj_id in objects:
        model_path = dp["model_mpath"].format(obj_id)
        if not os.path.exists(model_path):
            print(f"obj {obj_id}: model missing at {model_path}; skipping")
            continue
        model = inout.load_ply(model_path)
        det = Detector(cfg)
        stats = render_train_templates(
            det,
            f"obj_{obj_id:02d}",
            model,
            K,
            radii=radii,
            min_n_views=args.min_views,
            im_size=tuple(args.im_size) if args.im_size else dp["train_im_size"],
            verbose=True,
        )
        out = os.path.join(args.out, f"obj_{obj_id:02d}.npz")
        det.write_classes(out)
        print(f"obj {obj_id}: {stats} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
