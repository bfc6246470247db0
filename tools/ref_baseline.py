#!/usr/bin/env python3
"""Apples-to-apples baseline: the REFERENCE linemodLevelup matcher vs this
framework, on IDENTICAL synthetic scenes and identically-trained banks.

The reference C++ matching core (meiqua/6DPose, linemodLevelup.cpp:1702-1941)
is compiled by refbaseline/build_reference.sh (OpenCV 4; the Open3D-only
poseRefine stubbed — matching stage only) and driven through
refbaseline/ref_driver.cpp as JSON-emitting subprocesses.

Both sides are scored on the MATCH STAGE with the same localization metric:
a visible ground-truth target counts as hit when the top match of its class
lands within ``tol = max(10 px, 0.25 * gt bbox diagonal)`` of the gt bbox
center.  (ICP is stubbed on the reference side, so pose-level ADI is not
comparable here; SYNTH_r*.json carries the full-pipeline accuracy.)

Phases (resumable; artifacts under --workdir):
  export  render per-class training views + the benchmark scenes as PNGs
  train   run ref_driver train per class (templates_*.yml.gz)
  detect  run ref_driver detect per scene; score reference recall + ms
  ours    run this framework's one-dispatch multi-class matcher on the
          same scenes; score with the same metric
  report  write the side-by-side JSON (+ provenance)

Run with JAX on CPU or TPU; the reference side is pure subprocess.

Example:
  python tools/ref_baseline.py --workdir .cache/refbase --scenes 20 \
      --views 80 --bank-cache .cache/synth_bank.npz --out REFBASELINE.json
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DRIVER = os.path.join(REPO, "refbaseline", "build", "ref_driver")

K_BENCH = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1]])
IM_SIZE = (320, 240)
RADIUS = 450.0


def _batched_view_renders(model, views_list, batch=16):
    """Yield (view_index, rgb, depth_u16) for every view, rendered in
    device batches (same mesh prep as models/train.py: subdivide so the
    rasterizer tile covers every projected triangle)."""
    import jax
    import jax.numpy as jnp

    from sixdpose_tpu.geometry.render import (
        render_rgb_depth, render_textured, subdivide_mesh,
    )

    pts_np = np.asarray(model["pts"], np.float64)
    faces_np = np.asarray(model["faces"], np.int64)
    colors_np = (
        np.asarray(model.get("colors"), np.float64)
        if model.get("colors") is not None
        else np.full((len(pts_np), 3), 127.0)
    )
    use_texture = model.get("texture") is not None and "texture_uv" in model
    if use_texture:
        colors_np = np.concatenate(
            [colors_np, np.asarray(model["texture_uv"], np.float64)], 1
        )
    extent = float(np.linalg.norm(pts_np, axis=1).max())
    z_min = max(RADIUS - extent, 50.0)
    ppm = max(K_BENCH[0][0], K_BENCH[1][1]) / z_min
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
    Kj = jnp.asarray(K_BENCH.astype(np.float32))
    if use_texture:
        uvj = jnp.asarray(colors_np[:, 3:5].astype(np.float32))
        tex_np = np.asarray(model["texture"], np.float32)
        if tex_np.max() > 1.0:
            tex_np = tex_np / 255.0
        texj = jnp.asarray(tex_np[..., :3])
        fn = jax.jit(jax.vmap(
            lambda R, t: render_textured(
                ptsj, facesj, uvj, texj, Kj, R, t, IM_SIZE
            )
        ))
    else:
        colj = jnp.asarray((colors_np / 255.0).astype(np.float32))
        fn = jax.jit(jax.vmap(
            lambda R, t: render_rgb_depth(
                ptsj, facesj, colj, Kj, R, t, IM_SIZE
            )
        ))
    for b0 in range(0, len(views_list), batch):
        vs = views_list[b0 : b0 + batch]
        Rs = jnp.asarray(np.stack([v["R"] for v in vs]).astype(np.float32))
        ts = jnp.asarray(
            np.stack([v["t"].flatten() for v in vs]).astype(np.float32)
        )
        pad = batch - len(vs)
        if pad:
            Rs = jnp.concatenate([Rs, jnp.tile(Rs[-1:], (pad, 1, 1))])
            ts = jnp.concatenate([ts, jnp.tile(ts[-1:], (pad, 1))])
        rgb_b, dep_b = fn(Rs, ts)
        rgb_b = np.asarray(rgb_b)
        dep_b = np.asarray(dep_b)
        for j in range(len(vs)):
            yield b0 + j, rgb_b[j], dep_b[j].astype(np.uint16)


def export_training_views(workdir: str, views: int, verbose: bool = True):
    """Render the SAME view sphere the benchmark trains on, as PNG triples
    (rgb, depth, mask) + a list file per class for ref_driver train."""
    from sixdpose_tpu.benchmark import make_models
    from sixdpose_tpu.data.inout import save_depth, save_im
    from sixdpose_tpu.geometry.view_sampler import sample_views

    models = make_models()
    train_dir = os.path.join(workdir, "train")
    os.makedirs(train_dir, exist_ok=True)
    for cid, model in models.items():
        list_path = os.path.join(train_dir, f"{cid}.list")
        if os.path.exists(list_path):
            continue
        vs, _ = sample_views(
            views, radius=RADIUS,
            elev_range=(-0.5 * np.pi, 0.5 * np.pi),
            tilt_range=(-0.5 * np.pi, 0.5 * np.pi),
            tilt_step=0.2 * np.pi,
        )
        lines = []
        for vi, rgb, dep in _batched_view_renders(model, vs):
            if (dep > 0).sum() == 0:
                continue
            mask = ((dep > 0) * 255).astype(np.uint8)
            base = os.path.join(train_dir, f"{cid}_{vi:04d}")
            save_im(base + "_rgb.png", rgb)
            save_depth(base + "_dep.png", dep)
            save_im(base + "_mask.png", mask)
            lines.append(f"{base}_rgb.png {base}_dep.png {base}_mask.png")
        with open(list_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        if verbose:
            print(f"exported {cid}: {len(lines)} views")


def export_scenes(workdir: str, scenes: int, seed: int,
                  objects_per_scene, verbose: bool = True):
    """Regenerate the benchmark's exact scenes (same rng stream) and dump
    them as PNGs + a gt JSON with the same visibility gating inputs."""
    from sixdpose_tpu.benchmark import make_models, make_scene
    from sixdpose_tpu.data.inout import save_depth, save_im
    from sixdpose_tpu.geometry.render import render

    scene_dir = os.path.join(workdir, "scenes")
    gt_path = os.path.join(scene_dir, "gt.json")
    if os.path.exists(gt_path):
        with open(gt_path) as f:
            cached = json.load(f)
        if len(cached) >= scenes:
            return cached[:scenes]
        # Need more scenes than cached: regenerate the whole stream (the
        # rng stream is sequential, so a longer run re-derives the same
        # prefix scenes).
    os.makedirs(scene_dir, exist_ok=True)
    models = make_models()
    rng = np.random.default_rng(seed)
    all_gts = []
    for si in range(scenes):
        rgb, depth, gts = make_scene(
            models, K_BENCH, IM_SIZE, rng, max_objects=objects_per_scene
        )
        save_im(os.path.join(scene_dir, f"{si:04d}_rgb.png"), rgb)
        save_depth(os.path.join(scene_dir, f"{si:04d}_dep.png"), depth)
        rows = []
        for gt in gts:
            cid = gt["obj_id"]
            d_solo = np.asarray(
                render(models[cid], IM_SIZE, K_BENCH, gt["R"], gt["t"],
                       mode="depth")
            )
            npx = int((d_solo > 0).sum())
            vis = int(
                ((np.abs(depth.astype(np.float32) - d_solo) < 5)
                 & (d_solo > 0)).sum()
            )
            ys, xs = np.nonzero(d_solo > 0)
            bbox = (
                [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]
                if npx else [0, 0, 0, 0]
            )
            rows.append({
                "obj_id": cid,
                "R": np.asarray(gt["R"]).tolist(),
                "t": np.asarray(gt["t"]).flatten().tolist(),
                "bbox": bbox,
                "vis_frac": vis / max(npx, 1),
            })
        all_gts.append(rows)
        if verbose and (si + 1) % 5 == 0:
            print(f"exported scene {si + 1}/{scenes}")
    with open(gt_path, "w") as f:
        json.dump(all_gts, f)
    return all_gts


def train_reference(workdir: str, num_feats: int, t_levels: str,
                    verbose: bool = True) -> dict:
    from sixdpose_tpu.benchmark import make_models

    train_dir = os.path.join(workdir, "train")
    bank_dir = os.path.join(workdir, "refbank")
    os.makedirs(bank_dir, exist_ok=True)
    pattern = os.path.join(bank_dir, "templates_%s.yml.gz")
    stats = {}
    for cid in make_models():
        out_file = pattern.replace("%s", cid)
        map_file = os.path.join(bank_dir, f"{cid}_tidmap.json")
        if os.path.exists(out_file) and os.path.exists(map_file):
            stats[cid] = {"cached": True}
            continue
        cmd = [
            REF_DRIVER, "train", pattern, cid, str(num_feats), t_levels,
            os.path.join(train_dir, f"{cid}.list"),
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        if res.returncode != 0:
            raise RuntimeError(f"ref train {cid} failed: {res.stderr[-500:]}")
        stats[cid] = json.loads(res.stdout.strip().splitlines()[-1])
        # Persist template_id -> list-line map (failures shift ids); the
        # end-to-end control row needs it to recover each matched
        # template's training pose.
        with open(map_file, "w") as f:
            json.dump(stats[cid].get("tid_lines", []), f)
        if verbose:
            print("ref", {k: v for k, v in stats[cid].items()
                          if k != "tid_lines"})
        stats[cid].pop("tid_lines", None)
    return stats


def _hit(matches_for_class, gt_row, tol_floor=10.0):
    """Localization hit test shared by both sides: top match center within
    tol of the gt bbox center."""
    x0, y0, x1, y1 = gt_row["bbox"]
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    diag = math.hypot(x1 - x0, y1 - y0)
    tol = max(tol_floor, 0.25 * diag)
    for m in matches_for_class[:1]:
        mx = m["x"] + m["w"] / 2.0
        my = m["y"] + m["h"] / 2.0
        if math.hypot(mx - cx, my - cy) <= tol:
            return True
    return False


def detect_reference(workdir: str, all_gts, num_feats: int, t_levels: str,
                     threshold: float, verbose: bool = True) -> dict:
    from sixdpose_tpu.benchmark import make_models

    scene_dir = os.path.join(workdir, "scenes")
    pattern = os.path.join(workdir, "refbank", "templates_%s.yml.gz")
    class_csv = ",".join(make_models().keys())
    targets = hits = 0
    per_obj = {}
    times = []
    matches_per_scene = []
    for si, rows in enumerate(all_gts):
        repeats = 5 if si == 0 else 1
        cmd = [
            REF_DRIVER, "detect", pattern, class_csv, str(num_feats),
            t_levels,
            os.path.join(scene_dir, f"{si:04d}_rgb.png"),
            os.path.join(scene_dir, f"{si:04d}_dep.png"),
            str(threshold), str(repeats), "200",
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        if res.returncode != 0:
            raise RuntimeError(f"ref detect scene {si}: {res.stderr[-500:]}")
        out = json.loads(res.stdout.strip().splitlines()[-1])
        times.append(out["match_time_s_min"])
        by_class = {}
        for m in out["matches"]:  # already similarity-sorted
            by_class.setdefault(m["class_id"], []).append(m)
        for row in rows:
            if row["vis_frac"] < 0.3:
                continue
            targets += 1
            per_obj.setdefault(row["obj_id"], [0, 0])[1] += 1
            if _hit(by_class.get(row["obj_id"], []), row):
                hits += 1
                per_obj[row["obj_id"]][0] += 1
        if verbose and (si + 1) % 5 == 0:
            print(f"ref detect {si + 1}/{len(all_gts)}: {hits}/{targets}")
        matches_per_scene.append(by_class)
    return {
        "loc_recall": hits / max(targets, 1),
        "targets": targets,
        "hits": hits,
        "per_object": {c: v[0] / max(v[1], 1) for c, v in per_obj.items()},
        "match_time_s": float(np.median(times)),
        "match_time_s_all": times,
    }, matches_per_scene


def detect_ours(workdir: str, all_gts, threshold: float, bank_cache: str,
                views: int, verbose: bool = True) -> dict:
    """Same scenes, same metric, this framework's one-dispatch multi-class
    matcher (match stage only, mirroring the stubbed reference)."""
    from sixdpose_tpu.benchmark import make_models, train_benchmark_bank
    from sixdpose_tpu.config import (
        ColorGradientConfig, DepthNormalConfig, DetectorConfig,
    )
    from sixdpose_tpu.data.inout import load_depth, load_im
    from sixdpose_tpu.models.multiclass import MultiClassMatcher

    models = make_models()
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        top_k=32,
        color=ColorGradientConfig(num_features=40, strong_threshold=30.0),
        depth=DepthNormalConfig(
            num_features=24, extract_threshold=1, focal=280.0
        ),
    )
    det, _ = train_benchmark_bank(
        models, K_BENCH, IM_SIZE, views, cfg, bank_cache, verbose
    )
    matcher = MultiClassMatcher(det)
    wh0 = {
        cid: np.asarray(det.bank.finalized(cid)[0].wh)
        for cid in matcher.class_ids
    }
    scene_dir = os.path.join(workdir, "scenes")
    targets = hits = 0
    per_obj = {}
    times = []
    for si, rows in enumerate(all_gts):
        rgb = load_im(os.path.join(scene_dir, f"{si:04d}_rgb.png"))
        depth = load_depth(os.path.join(scene_dir, f"{si:04d}_dep.png"))
        t0 = time.time()
        matches = matcher.match(rgb, depth, threshold)
        times.append(time.time() - t0)
        by_class = {}
        for m in matches:
            w, h = wh0[m.class_id][m.template_id]
            by_class.setdefault(m.class_id, []).append(
                {"x": m.x, "y": m.y, "w": int(w), "h": int(h)}
            )
        for row in rows:
            if row["vis_frac"] < 0.3:
                continue
            targets += 1
            per_obj.setdefault(row["obj_id"], [0, 0])[1] += 1
            if _hit(by_class.get(row["obj_id"], []), row):
                hits += 1
                per_obj[row["obj_id"]][0] += 1
        if verbose and (si + 1) % 5 == 0:
            print(f"ours detect {si + 1}/{len(all_gts)}: {hits}/{targets}")
    # First frame carries the compile; report the post-warmup median.
    steady = times[1:] or times
    return {
        "loc_recall": hits / max(targets, 1),
        "targets": targets,
        "hits": hits,
        "per_object": {c: v[0] / max(v[1], 1) for c, v in per_obj.items()},
        "match_time_s": float(np.median(steady)),
        "match_time_note": (
            "host wall time incl. device dispatch+readback through the "
            "tunnel (sync mode); bench.py's chained methodology reports "
            "pure device time"
        ),
    }


def control_reference_matches_our_icp(
    workdir: str, all_gts, matches_per_scene, views: int,
    verbose: bool = True,
) -> dict:
    """END-TO-END control row: the REFERENCE's own match output, refined
    by OUR batched projective point-to-plane ICP and scored with
    ADI@0.1d against ground truth.

    The baseline build stubs the reference's Open3D poseRefine
    (refbaseline/build_reference.sh), so the head-to-head table is
    match-stage only; the reference's end-to-end identity is match + ICP
    (linemodLevelup.cpp:27-170).  Feeding its matches through our
    refiner isolates the matcher comparison at the POSE level: any
    recall gap in this row vs our full pipeline on the same scenes is
    attributable to the match stage, not the refiner."""
    import jax.numpy as jnp

    from sixdpose_tpu.benchmark import make_models
    from sixdpose_tpu.data.inout import load_depth
    from sixdpose_tpu.eval import pose_error
    from sixdpose_tpu.eval.misc import model_diameter
    from sixdpose_tpu.geometry.render import render
    from sixdpose_tpu.geometry.view_sampler import sample_views
    from sixdpose_tpu.models.refine import (
        backproject,
        icp_batch,
        sample_model_points,
        scene_normals,
    )

    models = make_models()
    diameters = {cid: model_diameter(m["pts"]) for cid, m in models.items()}
    vs, _ = sample_views(
        views, radius=RADIUS,
        elev_range=(-0.5 * np.pi, 0.5 * np.pi),
        tilt_range=(-0.5 * np.pi, 0.5 * np.pi),
        tilt_step=0.2 * np.pi,
    )
    bank_dir = os.path.join(workdir, "refbank")
    train_dir = os.path.join(workdir, "train")
    tid2view = {}
    for cid in models:
        with open(os.path.join(train_dir, f"{cid}.list")) as f:
            lines = [ln.split()[0] for ln in f if ln.strip()]
        # File names embed the view index (export_training_views):
        # .../{cid}_{vi:04d}_rgb.png
        line_vi = [
            int(os.path.basename(p)[len(cid) + 1 : len(cid) + 5])
            for p in lines
        ]
        with open(os.path.join(bank_dir, f"{cid}_tidmap.json")) as f:
            tid_lines = json.load(f)
        tid2view[cid] = [line_vi[l] for l in tid_lines]

    npts = 512
    cloud_cache = {}

    def template_cloud(cid, tid):
        key = (cid, tid)
        if key not in cloud_cache:
            vi = tid2view[cid][tid]
            R0 = np.asarray(vs[vi]["R"], np.float64)
            t0 = np.asarray(vs[vi]["t"], np.float64).reshape(3, 1)
            dimg = np.asarray(
                render(models[cid], IM_SIZE, K_BENCH, R0, t0, mode="depth")
            ).astype(np.uint16)
            pts_all, val_all = sample_model_points(dimg, K_BENCH, npts)
            pts_m = np.asarray(pts_all)[np.asarray(val_all)]
            ys, xs = np.nonzero(dimg > 0)
            if len(pts_m) < 8 or len(ys) == 0:
                cloud_cache[key] = None
            else:
                z_anchor = float(np.median(dimg[dimg > 0])) / 1000.0
                base = np.eye(4)
                base[:3, :3] = R0
                base[:3, 3] = t0.flatten()
                base[2, 3] /= 1000.0  # reference quirk (cpp:37)
                cloud_cache[key] = (
                    pts_m.astype(np.float32), z_anchor, base,
                    int(xs.max() - xs.min()), int(ys.max() - ys.min()),
                )
        return cloud_cache[key]

    scene_dir = os.path.join(workdir, "scenes")
    targets = hits = 0
    per_obj = {}
    h, w = IM_SIZE[1], IM_SIZE[0]
    for si, rows in enumerate(all_gts):
        depth = np.asarray(
            load_depth(os.path.join(scene_dir, f"{si:04d}_dep.png"))
        ).astype(np.uint16)
        by_class = matches_per_scene[si]
        cands = []  # (row, cloud, T0, base)
        for row in rows:
            if row["vis_frac"] < 0.3:
                continue
            targets += 1
            per_obj.setdefault(row["obj_id"], [0, 0])[1] += 1
            ms = by_class.get(row["obj_id"], [])
            if not ms:
                continue
            m = ms[0]
            tc = template_cloud(row["obj_id"], m["template_id"])
            if tc is None:
                continue
            pts_m, z_anchor, base, bw, bh = tc
            # Seed translation exactly as the serving host path: window
            # median depth -> centroid shift (poseRefine's init guess,
            # linemodLevelup.cpp:60-104).
            zs = depth[
                np.clip(m["y"], 0, h - 1):np.clip(m["y"] + bh + 1, 1, h),
                np.clip(m["x"], 0, w - 1):np.clip(m["x"] + bw + 1, 1, w),
            ]
            zs_nz = zs[zs > 0]
            z_med = (
                float(np.median(zs_nz)) / 1000.0 if len(zs_nz) else z_anchor
            )
            u = m["x"] + bw / 2.0
            v = m["y"] + bh / 2.0
            target = np.array([
                (u - K_BENCH[0, 2]) / K_BENCH[0, 0] * z_med,
                (v - K_BENCH[1, 2]) / K_BENCH[1, 1] * z_med,
                z_med,
            ])
            T0 = np.eye(4, dtype=np.float32)
            T0[:3, 3] = target - pts_m.mean(0)
            cands.append((row, pts_m, T0, base))
        if not cands:
            continue
        n_fix = 12  # static batch: recompiles only once
        clouds = np.zeros((n_fix, npts, 3), np.float32)
        valids = np.zeros((n_fix, npts), bool)
        inits = np.tile(np.eye(4, dtype=np.float32), (n_fix, 1, 1))
        for i, (_, pts_m, T0, _) in enumerate(cands[:n_fix]):
            k = min(len(pts_m), npts)
            clouds[i, :k] = pts_m[:k]
            valids[i, :k] = True
            inits[i] = T0
        sp = backproject(
            jnp.asarray(depth), jnp.asarray(K_BENCH.astype(np.float32))
        )
        sn = scene_normals(sp)
        Ts, fits, _ = icp_batch(
            jnp.asarray(clouds), jnp.asarray(valids), sp, sn,
            jnp.asarray(K_BENCH.astype(np.float32)), jnp.asarray(inits),
            0.02, 20, 4.0,
        )
        Ts = np.asarray(Ts, np.float64)
        for i, (row, _, _, base) in enumerate(cands[:n_fix]):
            result = Ts[i] @ base
            R_e = result[:3, :3]
            t_e = result[:3, 3:4] * 1000.0
            cid = row["obj_id"]
            err = pose_error.adi(
                R_e, t_e, np.asarray(row["R"]),
                np.asarray(row["t"]).reshape(3, 1), models[cid],
                max_pts=1024,
            )
            if err < 0.1 * diameters[cid]:
                hits += 1
                per_obj[cid][0] += 1
        if verbose and (si + 1) % 10 == 0:
            print(f"control {si + 1}/{len(all_gts)}: {hits}/{targets}")
    return {
        "pose_recall_adi": hits / max(targets, 1),
        "targets": targets,
        "hits": hits,
        "per_object": {c: v[0] / max(v[1], 1) for c, v in per_obj.items()},
        "icp": "ours (batched projective point-to-plane GN, depth-only, "
               "single seed, top-1 reference match per class)",
    }


def case1_reference() -> dict:
    """The reference binary on its own case1 golden fixture."""
    case1 = "/root/reference/linemodLevelup/test/case1"
    if not os.path.isdir(case1):
        return {"skipped": "reference case1 not mounted"}
    cmd = [
        REF_DRIVER, "detect", f"{case1}/127/%s.yaml", "06_template",
        "127", "5,8", f"{case1}/0000_rgb.png", f"{case1}/0000_dep.png",
        "75", "5", "5",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    if res.returncode != 0:
        return {"error": res.stderr[-300:]}
    out = json.loads(res.stdout.strip().splitlines()[-1])
    out["documented_golden"] = {
        "x": 327, "y": 127, "similarity": 92.66, "template_id": 424,
        "source": "linemodLevelup/test.cpp:76-88 (author's OpenCV3 run)",
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=os.path.join(REPO, ".cache/refbase"))
    ap.add_argument("--scenes", type=int, default=20)
    ap.add_argument("--views", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--objects-per-scene", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=55.0)
    ap.add_argument("--num-feats", type=int, default=64,
                    help="reference Detector num_features (ours: 40+24)")
    ap.add_argument("--t-levels", default="4,8")
    ap.add_argument("--bank-cache", default=None)
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not os.path.exists(REF_DRIVER):
        print(f"ref_driver missing; run refbaseline/build_reference.sh",
              file=sys.stderr)
        return 2

    os.makedirs(args.workdir, exist_ok=True)
    export_training_views(args.workdir, args.views)
    all_gts = export_scenes(
        args.workdir, args.scenes, args.seed, args.objects_per_scene or None
    )
    t0 = time.time()
    train_stats = train_reference(args.workdir, args.num_feats, args.t_levels)
    ref_train_s = time.time() - t0
    ref, ref_matches = detect_reference(
        args.workdir, all_gts, args.num_feats, args.t_levels, args.threshold
    )
    control = control_reference_matches_our_icp(
        args.workdir, all_gts, ref_matches, args.views
    )
    ours = (
        None if args.skip_ours else detect_ours(
            args.workdir, all_gts, args.threshold, args.bank_cache, args.views
        )
    )

    from sixdpose_tpu.utils.artifacts import provenance, write_artifact

    result = {
        "metric": "match-stage localization recall on identical synthetic "
                  "scenes (top-1 center within max(10px, 0.25*diag))",
        "reference": ref,
        "reference_train": {"wall_s": ref_train_s, "per_class": train_stats},
        "reference_end_to_end_control": control,
        "ours": ours,
        "case1_reference_binary": case1_reference(),
        "notes": [
            "reference = meiqua/6DPose linemodLevelup compiled against "
            "OpenCV4 with Open3D poseRefine stubbed (matching stage only)",
            "both sides trained on the same rendered views (radius 450, "
            "full sphere) and scored on the same scenes/targets",
            "reference DepthNormal hardcodes focal 1150 "
            "(linemodLevelup.cpp:781-783); consistent train/test so "
            "matching is unaffected to first order",
            "reference_end_to_end_control = the reference's matches fed "
            "through OUR batched ICP and scored ADI@0.1d: the "
            "full-pipeline comparator for our SYNTH recall on the same "
            "scene stream (same seed)",
        ],
    }
    config = {k: v for k, v in vars(args).items() if k != "out"}
    if args.out:
        result = write_artifact(args.out, result, config)
    else:
        result["provenance"] = provenance(config)
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
