"""Drive EVERY checked-in reference case1 fixture end-to-end and emit a
rerunnable accuracy report (positions, scale recovery, ICP fitness).

The reference ships more fixtures than its own tests exercise
(/root/reference/linemodLevelup/test/case1/): template banks serialized by
writeClasses at feature budgets 63/127 and radius 600 mm, per-template pose
infos for 800_1000 and allScales sweeps, a VGA RGB-D scene (0000), and a
poseRefine input pair (pose/0003.png scene depth + pose/depth_ren.png
rendered model depth).  This tool runs each one through the TPU-native
pipeline and checks the goldens:

  63  bank, single-scale match ......... x=332, y=127   (tid 34)
  127 bank, single-scale match ......... x=327, y=127   (tid 34; the
        recorded reference golden, test.cpp:76-88)
  600 bank, multiscale match ........... x=332, y=127, depth bin 1050 mm,
        scale 600/1050 (the documented 600 mm-bank/1050 mm-scene scenario,
        linemodLevelup/readme.md:29-34)
  600 bank, single-scale match ......... documents the failure that
        motivates multiscale (score below the multiscale score)
  depth-histogram proposals ............ 1050 mm among the top-5 bins
  pose/ ICP fixture .................... point-to-plane ICP on real sensor
        depth: fitness and depth-agreement must improve over the initial
        alignment and exceed the serving accept threshold (0.5)
  800_1000 / allScales infos ........... parse + pose-radius coverage

Usage:  python tools/accuracy_case1.py [--out ACCURACY_case1.json]
Exit code != 0 when any golden fails — safe to wire into CI/the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE1 = "/root/reference/linemodLevelup/test/case1"
K_HINTER = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
    np.float32,
)


def _detector(templates, cid, top_k=64):
    from sixdpose_tpu.config import DetectorConfig
    from sixdpose_tpu.models.detector import Detector

    cfg = DetectorConfig(t_at_level=(5, 8), top_k=top_k)
    det = Detector(cfg)
    for tl in templates:
        det.bank.add_template_levels(cid, tl)
    return det


def run(out_path=None) -> dict:
    from sixdpose_tpu.data.inout import (
        load_depth,
        load_im,
        load_info,
        load_reference_template_bank,
    )
    from sixdpose_tpu.models.multiscale import MultiScaleDetector
    from sixdpose_tpu.models.refine import PoseRefiner, sample_model_points
    from sixdpose_tpu.ops.scale_proposal import propose_depths

    import jax.numpy as jnp

    rgb = load_im(os.path.join(CASE1, "0000_rgb.png"))
    dep = load_depth(os.path.join(CASE1, "0000_dep.png"))
    report = {"fixtures": {}, "ok": True}

    def check(name, cond, detail):
        report["fixtures"][name] = {"ok": bool(cond), **detail}
        if not cond:
            report["ok"] = False
        print(f"[{'PASS' if cond else 'FAIL'}] {name}: {detail}")

    # --- single-scale banks -------------------------------------------------
    goldens = {"63": (332, 127), "127": (327, 127)}
    for bank, (gx, gy) in goldens.items():
        cid, templates = load_reference_template_bank(
            os.path.join(CASE1, bank, "06_template.yaml")
        )
        det = _detector(templates, cid)
        ms = det.match(rgb, dep, threshold=75.0)
        top = (ms[0].x, ms[0].y) if ms else None
        check(
            f"bank{bank}_single_scale",
            bool(ms) and top == (gx, gy),
            {
                "golden": [gx, gy],
                "got": list(top) if top else None,
                "similarity": round(ms[0].similarity, 2) if ms else None,
                "template_id": ms[0].template_id if ms else None,
                "n_templates": len(templates),
            },
        )

    # --- depth-histogram scale proposal -------------------------------------
    depths, counts = propose_depths(jnp.asarray(dep), num_scales=5)
    depths = np.asarray(depths)[np.asarray(counts) > 0]
    check(
        "scale_proposal_1050",
        bool(np.any(np.abs(depths - 1050.0) < 1.0)),
        {"proposed_depths_mm": depths.tolist()},
    )

    # --- 600 mm bank: single-scale fails, multiscale recovers ---------------
    cid, templates = load_reference_template_bank(
        os.path.join(CASE1, "600", "06_template.yaml")
    )
    det600 = _detector(templates, cid, top_k=128)
    single = det600.match(rgb, dep, threshold=70.0)
    msd = MultiScaleDetector(det600, train_depth=600.0, num_scales=5)
    multi = msd.match(rgb, dep, threshold=70.0, class_id=cid)
    m = multi[0] if multi else None
    check(
        "bank600_multiscale",
        m is not None
        and abs(m.x - 332) <= 4
        and abs(m.y - 127) <= 4
        and m.depth_mm == 1050.0
        and abs(m.scale - 600.0 / 1050.0) < 1e-3,
        {
            "golden": [332, 127, 1050.0],
            "got": [m.x, m.y, m.depth_mm] if m else None,
            "scale": round(m.scale, 4) if m else None,
            "similarity": round(m.similarity, 2) if m else None,
            "n_templates": len(templates),
        },
    )
    single_best = single[0].similarity if single else -1.0
    check(
        "bank600_single_scale_worse",
        m is not None and single_best < m.similarity,
        {
            "single_scale_best": round(single_best, 2),
            "multiscale_best": round(m.similarity, 2) if m else None,
        },
    )

    # --- pose/ ICP fixture (real sensor depth) ------------------------------
    scene_d = load_depth(os.path.join(CASE1, "pose", "0003.png"))
    model_d = load_depth(os.path.join(CASE1, "pose", "depth_ren.png"))
    ys, xs = np.nonzero(model_d > 0)

    pts_m, valid_m = sample_model_points(model_d, K_HINTER, 2048)
    cloud = pts_m[valid_m]  # meters, camera space (already posed)

    def agreement(R_c, t_c):
        """Fraction of CLOUD-transformed model points whose depth agrees
        with the scene within 20 mm (projective association).  (R_c, t_c)
        is a transform on the backprojected cloud in meters — identity is
        the as-rendered alignment."""
        p = cloud @ np.asarray(R_c).T + np.asarray(t_c).ravel()
        u = (p[:, 0] / p[:, 2] * K_HINTER[0, 0] + K_HINTER[0, 2]).astype(int)
        v = (p[:, 1] / p[:, 2] * K_HINTER[1, 1] + K_HINTER[1, 2]).astype(int)
        inb = (u >= 0) & (u < 640) & (v >= 0) & (v < 480)
        ds = scene_d[v[inb], u[inb]].astype(np.float64)
        ok = (ds > 0) & (np.abs(ds - p[inb, 2] * 1000.0) < 20.0)
        return float(ok.sum() / max(inb.sum(), 1))

    agree_init = agreement(np.eye(3), np.zeros(3))
    z_m = float(np.median(model_d[model_d > 0])) / 1000.0
    t0 = np.array([[0.0], [0.0], [z_m * 1000.0]])
    ref = PoseRefiner()
    ref.process(
        scene_d, model_d, K_HINTER, K_HINTER,
        np.eye(3), t0, int(xs.min()), int(ys.min()),
    )
    if ref.getResidual() >= 0:
        # Recover the cloud transform T from the composed result:
        # result = T @ init_base with init_base = [I | (0, 0, z_m)]
        # (t_x = t_y = 0, so the reference's mm/m mixing cancels).
        R_c = ref.getR()
        t_c = ref.getT().ravel() / 1000.0 - R_c @ np.array([0.0, 0.0, z_m])
        agree_ref = agreement(R_c, t_c)
    else:
        agree_ref = 0.0
    check(
        "pose_icp_fixture",
        ref.getResidual() > 0.5 and agree_ref >= agree_init,
        {
            "fitness": round(ref.getResidual(), 4),
            "depth_agreement_init": round(agree_init, 4),
            "depth_agreement_refined": round(agree_ref, 4),
        },
    )

    # --- 800_1000 / allScales pose infos -------------------------------------
    for name, radii in (("800_1000", {800.0, 1000.0}),
                        ("allScales", None), ("127", {1000.0})):
        info = load_info(os.path.join(CASE1, name, "06_info.yaml"))
        zs = {round(float(v["cam_t_w2c"][2, 0]), 1) for v in info.values()}
        ok = all(
            v["cam_K"].shape == (3, 3) and v["cam_R_w2c"].shape == (3, 3)
            for v in info.values()
        )
        if radii is not None:
            ok = ok and zs == radii
        check(
            f"infos_{name}",
            ok and len(info) > 0,
            {"n_templates": len(info), "radii_mm": sorted(zs)},
        )

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    return report


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args()
    if not os.path.isdir(CASE1):
        print("reference case1 fixtures not mounted; nothing to do")
        return 0
    report = run(args.out)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
