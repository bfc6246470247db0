"""End-to-end CLI tools over a synthetic mini-SIXD dataset on disk.

Builds a one-object, one-scene SIXD tree, then runs the real CLIs:
train_templates -> detect_sixd -> eval_calc_errors -> eval_loc, checking
a recall of 1.0 — the full offline workflow of the reference's
tools/ + test drivers, against data we control.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.data import inout
from sixdpose_tpu.eval.misc import model_diameter
from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.geometry.view_sampler import sample_views

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _box_model():
    half = np.array([30.0, 20.0, 12.0])
    pts = np.array(
        [
            [sx * half[0], sy * half[1], sz * half[2]]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )
    quads = [
        (0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5),
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    colors = np.stack(
        [
            100 + 155 * (pts[:, 0] > 0),
            100 + 155 * (pts[:, 1] > 0),
            100 + 155 * (pts[:, 2] > 0),
        ],
        1,
    ).astype(np.uint8)
    return {"pts": pts, "faces": np.array(faces), "colors": colors}


K = np.array([[240.0, 0, 120.0], [0, 240.0, 90.0], [0, 0, 1.0]])
IMW, IMH = 240, 180


@pytest.fixture(scope="module")
def mini_sixd(tmp_path_factory):
    root = tmp_path_factory.mktemp("sixd") / "hinterstoisser"
    model = _box_model()
    (root / "models").mkdir(parents=True)
    inout.save_ply(str(root / "models" / "obj_01.ply"), model)
    with open(root / "models" / "models_info.yml", "w") as f:
        yaml.dump({1: {"diameter": float(model_diameter(model["pts"]))}}, f)
    with open(root / "camera.yml", "w") as f:
        yaml.dump(
            {"fx": 240.0, "fy": 240.0, "cx": 120.0, "cy": 90.0,
             "width": IMW, "height": IMH, "depth_scale": 1.0},
            f,
        )

    # One test scene with two images at known poses.
    views, _ = sample_views(8, radius=430.0, elev_range=(0.3, 1.2),
                            tilt_range=(0, 0.1), tilt_step=1.0)
    scene = root / "test" / "01"
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir(parents=True)
    info, gt = {}, {}
    for im_id, view in enumerate(views[:2]):
        R = view["R"]
        t = view["t"] + np.array([[10.0], [-5.0], [15.0]])
        rgb, depth = render(model, (IMW, IMH), K, R, t, mode="rgb+depth")
        inout.save_im(str(scene / "rgb" / f"{im_id:04d}.png"), np.asarray(rgb))
        inout.save_depth(
            str(scene / "depth" / f"{im_id:04d}.png"),
            np.asarray(depth).astype(np.uint16),
        )
        info[im_id] = {"cam_K": K}
        gt[im_id] = [{"obj_id": 1, "cam_R_m2c": R, "cam_t_m2c": t}]
    inout.save_info(str(scene / "info.yml"), info)
    inout.save_gt(str(scene / "gt.yml"), gt)
    return str(root.parent)


def _run(args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    return r.stdout


@pytest.mark.slow
def test_full_tool_chain(mini_sixd, tmp_path):
    work = str(tmp_path)
    base = ["--dataset", "hinterstoisser", "--base-path", mini_sixd]

    _run(
        [os.path.join(REPO, "tools", "train_templates.py"), *base,
         "--objects", "1", "--radii", "430", "--min-views", "60",
         "--max-feats", "24", "--im-size", str(IMW), str(IMH),
         "--out", os.path.join(work, "banks")],
        work,
    )
    assert os.path.exists(os.path.join(work, "banks", "obj_01.npz"))

    _run(
        [os.path.join(REPO, "tools", "detect_sixd.py"), *base,
         "--scenes", "1", "--banks", os.path.join(work, "banks"),
         "--threshold", "60", "--out", os.path.join(work, "results")],
        work,
    )
    res_files = os.listdir(os.path.join(work, "results", "01"))
    assert len(res_files) == 2

    _run(
        [os.path.join(REPO, "tools", "eval_calc_errors.py"), *base,
         "--results", os.path.join(work, "results"), "--error", "adi",
         "--out", os.path.join(work, "eval")],
        work,
    )
    err_dir = os.path.join(work, "eval", "error=adi_ntop=1")
    assert os.path.exists(os.path.join(err_dir, "errors_01.yml"))

    out = _run(
        [os.path.join(REPO, "tools", "eval_loc.py"), *base,
         "--errors", err_dir],
        work,
    )
    assert "total recall" in out
    # Both images should be matched (ADI within 0.1 * diameter).
    recall = float(out.split("total recall")[1].split()[0])
    assert recall == 1.0, out
