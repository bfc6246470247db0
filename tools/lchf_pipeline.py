#!/usr/bin/env python3
"""LCHF end-to-end pipeline driver (reference LCHF_test.py analog).

Modes mirror the reference driver (LCHF_test.py:122-425):
  render_train : render views of a mesh, crop patches, build features,
                 train the forest, save (npz).
  test         : dense scene ROIs -> whole-scene response crops ->
                 forest prediction (one jit dispatch per tree) -> hough
                 voting -> top-K pose-bin hypotheses.
  demo         : both, on a synthetic scene (no dataset needed).

Example:
  python tools/lchf_pipeline.py demo --views 20 --out /tmp/lchf_model
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_demo_assets(views: int, seed: int = 0):
    from sixdpose_tpu.benchmark import make_models
    from sixdpose_tpu.geometry.render import render
    from sixdpose_tpu.geometry.view_sampler import sample_views

    K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1]])
    model = make_models()["box"]
    vs, _ = sample_views(views, radius=500.0)
    return K, model, vs


def render_train(args) -> int:
    from sixdpose_tpu.geometry.render import render
    from sixdpose_tpu.lchf.feature import LchfConfig
    from sixdpose_tpu.lchf.model import LchfModel, make_training_patches, train_forest

    K, model, views = build_demo_assets(args.views, args.seed)
    cfg = LchfConfig()
    patches, rpys, ts = [], [], []
    t0 = time.time()
    for view in views:
        rgb, depth = render(
            model, (320, 240), K, view["R"], view["t"], mode="rgb+depth"
        )
        rgb = np.asarray(rgb)
        depth = np.asarray(depth).astype(np.uint16)
        mask = (depth > 0).astype(np.uint8) * 255
        p, r, t = make_training_patches(rgb, depth, mask, view["R"], cfg)
        patches.extend(p)
        rpys.extend(r)
        ts.extend(t)
    print(f"{len(patches)} training patches from {len(views)} views "
          f"({time.time()-t0:.1f}s)")
    model_l = train_forest(
        patches, np.asarray(rpys, np.float32), np.asarray(ts, np.float32), cfg
    )
    model_l.save(args.out)
    print(f"forest saved to {args.out}*")
    return 0


def test(args) -> int:
    from sixdpose_tpu.geometry.render import render
    from sixdpose_tpu.lchf.feature import LchfConfig
    from sixdpose_tpu.lchf.model import LchfModel, predict_scene, scene_roi_set
    from sixdpose_tpu.lchf.voting import dense_rois, hough_vote

    cfg = LchfConfig()
    model_l = LchfModel.load(args.out)
    K, model, views = build_demo_assets(2, args.seed + 1)
    view = views[0]
    rgb, depth = render(model, (320, 240), K, view["R"], view["t"], mode="rgb+depth")
    rgb = np.asarray(rgb)
    depth = np.asarray(depth).astype(np.uint16)

    t0 = time.time()
    rois = dense_rois(depth, stride=args.stride)
    roi_set = scene_roi_set(rgb, depth, rois, cfg)
    leaves = predict_scene(model_l, roi_set, cfg, device=True)
    bins, scores, _votes = hough_vote(
        leaves,
        model_l.leaf_feats_map(),
        rois,
        model_l.rpy,
        model_l.t,
        (320, 240),
        train_radius=500.0,
        top_k=args.top_k,
    )
    print(f"{len(rois)} rois -> top-{args.top_k} vote bins "
          f"({time.time()-t0:.1f}s):")
    for b, s in zip(np.asarray(bins), np.asarray(scores)):
        print(json.dumps({"bin": b.tolist(), "score": round(float(s), 3)}))
    return 0


def evaluate(args) -> int:
    """Quantitative recall over held-out rendered views, with and without
    mean-shift leaf-mode voting (lchf/eval.py)."""
    from sixdpose_tpu.lchf.eval import evaluate_recall
    from sixdpose_tpu.lchf.feature import LchfConfig
    from sixdpose_tpu.lchf.model import LchfModel
    from sixdpose_tpu.geometry.view_sampler import sample_views

    cfg = LchfConfig()
    model_l = LchfModel.load(args.out)
    K, model, _ = build_demo_assets(2, args.seed)
    test_views, _ = sample_views(args.eval_views, radius=500.0)

    results = {}
    for use_modes in (False, True):
        t0 = time.time()
        r = evaluate_recall(
            model_l, model, K, (320, 240), test_views,
            train_radius=500.0, cfg=cfg, stride=args.stride,
            top_k=args.top_k, leaf_modes=use_modes,
        )
        name = "leaf_modes" if use_modes else "raw_samples"
        results[name] = {
            "recall": round(r["recall"], 3),
            "top1_recall": round(r["top1_recall"], 3),
            "mean_center_err_px": (
                round(r["mean_center_err_px"], 1)
                if r["mean_center_err_px"] is not None else None
            ),
            "n_views": r["n_views"],
            "time_s": round(time.time() - t0, 1),
        }
        print(json.dumps({name: results[name]}))
    return 0


def pose_eval(args) -> int:
    """LCHF all the way to 6D poses + batched ICP, scored ADD-S@0.1d
    (lchf/pose.py) — the accuracy row the reference never produced (its
    driver stops at top-10 vote bins, LCHF_test.py:343-405)."""
    from sixdpose_tpu.geometry.view_sampler import sample_views
    from sixdpose_tpu.lchf.feature import LchfConfig
    from sixdpose_tpu.lchf.model import LchfModel
    from sixdpose_tpu.lchf.pose import evaluate_pose_recall

    cfg = LchfConfig()
    model_l = LchfModel.load(args.out)
    K, model, train_views = build_demo_assets(args.views, args.seed)
    if args.in_sample:
        test_views = train_views[: args.eval_views]
    else:
        test_views, _ = sample_views(args.eval_views, radius=500.0)

    leaf_modes = None
    if args.leaf_modes:
        from sixdpose_tpu.lchf.voting import leaf_mode_map

        leaf_modes = leaf_mode_map(model_l)

    t0 = time.time()
    r = evaluate_pose_recall(
        model_l, model, K, (320, 240), test_views, train_radius=500.0,
        cfg=cfg, stride=args.stride, top_k=args.top_k,
        icp_seeds=args.icp_seeds, leaf_modes=leaf_modes,
    )
    record = {
        "recall_add_s": round(r["recall"], 3),
        "n_views": r["n_views"],
        "diameter_mm": round(r["diameter_mm"], 1),
        "threshold_mm": round(r["threshold_mm"], 2),
        "metric": r["metric"],
        "time_s": round(time.time() - t0, 1),
        "records": r["records"],
    }
    print(json.dumps(record))
    if args.artifact:
        from sixdpose_tpu.utils.artifacts import write_artifact

        write_artifact(args.artifact, record, config=vars(args))
        print(f"wrote {args.artifact}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "mode",
        choices=["render_train", "test", "demo", "eval", "pose_eval"],
    )
    ap.add_argument("--out", default="/tmp/lchf_model")
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--eval-views", type=int, default=12)
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--artifact", default=None,
                    help="pose_eval: write the stamped JSON record here")
    ap.add_argument("--leaf-modes", action="store_true",
                    help="pose_eval: vote with mean-shift leaf MODES "
                         "(lchf/meanshift.py) instead of raw leaf samples")
    ap.add_argument("--icp-seeds", type=int, default=5,
                    help="pose_eval: in-plane ICP seed fan per hypothesis")
    ap.add_argument("--in-sample", action="store_true",
                    help="pose_eval: evaluate on the TRAINING view poses "
                         "(default: a fresh view sampling = held out)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU-tunnel "
                         "sitecustomize overrides JAX_PLATFORMS, so an env "
                         "var alone cannot; forest training is "
                         "compile-bound on the remote-compile tunnel and "
                         "~4x faster on host CPU)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.mode in ("render_train", "demo"):
        rc = render_train(args)
        if rc:
            return rc
    if args.mode in ("test", "demo"):
        return test(args)
    if args.mode == "eval":
        return evaluate(args)
    if args.mode == "pose_eval":
        return pose_eval(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
