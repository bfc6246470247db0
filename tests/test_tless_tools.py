"""T-LESS toolkit surface: check_poses driver over a synthetic mini
T-LESS tree, downloader URL manifest, color-table loader, flat-surface
rendering (t_less_toolkit/{check_poses_test_imgs.py,t-less_download.py,
pytless/inout.py,pytless/renderer.py}).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.data import inout
from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.geometry.view_sampler import sample_views

from tests.test_tools import _box_model, _run, K, IMW, IMH

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini_tless(tmp_path_factory):
    """models_cad/ + test_primesense/01/{rgb,depth,info.yml,gt.yml} with
    the T-LESS depth convention (stored units = 0.1 mm)."""
    root = tmp_path_factory.mktemp("tless") / "t-less_v2"
    model = _box_model()
    (root / "models_cad").mkdir(parents=True)
    inout.save_ply(str(root / "models_cad" / "obj_01.ply"), model)

    views, _ = sample_views(8, radius=430.0, elev_range=(0.3, 1.2),
                            tilt_range=(0, 0.1), tilt_step=1.0)
    scene = root / "test_primesense" / "01"
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir(parents=True)
    info, gt = {}, {}
    for im_id, view in enumerate(views[:2]):
        R, t = view["R"], view["t"]
        rgb, depth = render(model, (IMW, IMH), K, R, t, mode="rgb+depth")
        inout.save_im(str(scene / "rgb" / f"{im_id:04d}.png"), np.asarray(rgb))
        inout.save_depth(  # T-LESS stores 0.1 mm units
            str(scene / "depth" / f"{im_id:04d}.png"),
            (np.asarray(depth) * 10.0).astype(np.uint16),
        )
        info[im_id] = {"cam_K": K, "depth_scale": 0.1}
        x, y = np.nonzero(np.asarray(depth) > 0)[::-1]
        gt[im_id] = [{
            "obj_id": 1, "cam_R_m2c": R, "cam_t_m2c": t,
            "obj_bb": [int(x.min()), int(y.min()),
                       int(x.max() - x.min()), int(y.max() - y.min())],
        }]
    inout.save_info(str(scene / "info.yml"), info)
    inout.save_gt(str(scene / "gt.yml"), gt)
    return str(root)


def test_check_poses_tless(mini_tless, tmp_path):
    out = os.path.join(str(tmp_path), "vis")
    _run(
        [os.path.join(REPO, "tools", "check_poses_tless.py"),
         "--base-path", mini_tless, "--split", "test",
         "--device", "primesense", "--scenes", "1", "--im-step", "1",
         "--out", out],
        str(tmp_path),
    )
    files = sorted(os.listdir(out))
    # Per image: an RGB overlay + a depth-diff map.
    assert [f for f in files if f.endswith("_rgb.png")]
    assert [f for f in files if f.endswith("_depth_diff.png")]
    vis = inout.load_im(os.path.join(out, files[0]))
    assert vis.shape == (IMH, IMW, 3) and vis.any()

    # GT poses are exact -> captured-minus-rendered depth stays near zero:
    # the diff map's colored band (nonzero pixels) must be mostly the
    # near-agreement color (green channel high where valid).
    diff = inout.load_im(
        os.path.join(out, [f for f in files if "depth_diff" in f][0])
    )
    nz = diff.any(axis=-1)
    assert nz.any()
    assert (diff[nz][:, 1] > 200).mean() > 0.9


def test_tless_download_manifest(tmp_path):
    mf = os.path.join(str(tmp_path), "urls.txt")
    _run(
        [os.path.join(REPO, "tools", "tless_download.py"),
         "--manifest", mf, "--sensors", "primesense",
         "--objects", "1", "2", "--scenes", "3", "--model-types", "cad"],
        str(tmp_path),
    )
    lines = open(mf).read().splitlines()
    assert len(lines) == 4  # 2 train + 1 test + 1 models archive
    assert lines[0].split()[0] == (
        "http://ptak.felk.cvut.cz/darwin/t-less/v2/"
        "t-less_v2_train_primesense_01.zip"
    )
    assert lines[2].split()[1].endswith("test_primesense")
    assert "models_cad" in lines[3]


def test_load_colors(tmp_path):
    p = os.path.join(str(tmp_path), "obj_rgb.txt")
    with open(p, "w") as f:
        f.write("0.1 0.2 0.3\n0.4 0.5 0.6\n")
    colors = inout.load_colors(p)
    assert colors.shape == (2, 3)
    assert np.allclose(colors[1], [0.4, 0.5, 0.6])


def test_render_surf_color():
    """surf_color overrides vertex colors with a flat color and leaves
    the model dict's own colors untouched (renderer.py:324-333)."""
    model = _box_model()
    before = model["colors"].copy()
    R = np.eye(3)
    t = np.array([[0.0], [0.0], [400.0]])
    rgb = np.asarray(
        render(model, (IMW, IMH), K, R, t, mode="rgb",
               surf_color=(1.0, 0.0, 0.0))
    )
    mask = rgb.any(axis=-1)
    assert mask.any()
    assert (rgb[mask][:, 0] > 0).all()
    assert (rgb[mask][:, 2] == 0).all()  # flat red: no blue anywhere
    assert (model["colors"] == before).all()
