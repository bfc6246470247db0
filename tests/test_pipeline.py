"""Fused detect->refine->verify pipeline (models/pipeline.py): one
compiled dispatch must reproduce the unfused serving path's behavior."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.benchmark import make_models
from sixdpose_tpu.config import (
    ColorGradientConfig,
    DepthNormalConfig,
    DetectorConfig,
    IcpConfig,
)
from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.models.pipeline import FusedPipeline, build_refine_bank
from sixdpose_tpu.models.train import render_train_templates, template_pose


K = np.array([[160.0, 0, 80], [0, 160.0, 60], [0, 0, 1]])
IM = (160, 120)


@pytest.fixture(scope="module")
def trained_box():
    model = make_models()["box"]
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        top_k=16,
        color=ColorGradientConfig(num_features=24, strong_threshold=30.0),
        depth=DepthNormalConfig(num_features=16, extract_threshold=1, focal=160.0),
    )
    det = Detector(cfg)
    stats = render_train_templates(
        det, "box", model, K,
        radii=[420.0], min_n_views=16, im_size=IM,
        tilt_range=(0.0, 0.1), tilt_step=1.0,
    )
    assert stats["added"] >= 8, stats
    return det, model


def test_refine_bank_builds(trained_box):
    det, _ = trained_box
    rb = build_refine_bank(det, "box", num_points=256)
    assert rb is not None
    n = det.num_templates("box")
    assert rb.clouds.shape == (n, 256, 3)
    assert rb.base_T.shape == (n, 4, 4)
    assert bool(rb.valids.any())
    # base_T z is in meters (reference quirk), x/y in mm.
    assert float(rb.base_T[0, 2, 3]) == pytest.approx(0.42, abs=0.01)


def test_fused_pipeline_recovers_pose(trained_box):
    det, model = trained_box
    # Scene: the object at a pose near training template 0, shifted.
    Ki, R0, t0 = template_pose(det, "box", 0)
    t_gt = t0.flatten() + np.array([14.0, -9.0, 22.0])
    rgb, depth = render(model, IM, K, R0, t_gt, mode="rgb+depth")
    rgb = np.asarray(rgb)
    depth = np.asarray(depth).astype(np.uint16)

    pipe = FusedPipeline(
        det, "box", K, icp=IcpConfig(max_iters=12), max_refine=4,
        num_points=256,
    )
    tid, x, y, score, R, t, fit, ver, active = map(
        np.asarray, pipe(rgb, depth, 60.0)
    )
    assert active[0] and fit[0] > 0.5, (active, fit, score)
    # Refined translation within a few mm of ground truth.
    err = np.linalg.norm(t[0] - t_gt)
    assert err < 6.0, (t[0], t_gt, err)


def test_fused_matches_unfused_serving(trained_box):
    """The fused dispatch and the host-orchestrated serving path must
    agree on the winning template and the pose within tolerance."""
    from sixdpose_tpu.serving import PoseEstimationService

    det, model = trained_box
    Ki, R0, t0 = template_pose(det, "box", 2)
    t_gt = t0.flatten() + np.array([-10.0, 6.0, 15.0])
    rgb, depth = render(model, IM, K, R0, t_gt, mode="rgb+depth")
    rgb = np.asarray(rgb)
    depth = np.asarray(depth).astype(np.uint16)

    icp = IcpConfig(max_iters=12)
    svc = PoseEstimationService(
        det, {"box": model}, K, threshold=60.0, max_refine=4, icp=icp,
        min_fitness=0.3, min_verify=0.0,
    )
    svc._fused = {"box": None}  # force the host-orchestrated path
    ests = svc.process_frame(rgb, depth)
    assert ests

    pipe = FusedPipeline(det, "box", K, icp=icp, max_refine=4, num_points=512)
    tid, x, y, score, R, t, fit, ver, active = map(
        np.asarray, pipe(rgb, depth, 60.0)
    )
    assert active[0]
    best = ests[0]
    err_t = np.linalg.norm(t[0] - best.t.flatten())
    assert err_t < 5.0, (t[0], best.t.flatten())
    # Same rotation up to a few degrees.
    cosang = (np.trace(R[0] @ best.R.T) - 1) / 2
    assert cosang > np.cos(np.deg2rad(8.0)), cosang


def test_fused_pipeline_empty_scene(trained_box):
    det, _ = trained_box
    pipe = FusedPipeline(
        det, "box", K, icp=IcpConfig(max_iters=6), max_refine=4,
        num_points=128,
    )
    rgb = np.zeros((120, 160, 3), np.uint8)
    depth = np.zeros((120, 160), np.uint16)
    out = pipe(rgb, depth, 60.0)
    active = np.asarray(out[8])
    fit = np.asarray(out[6])
    assert not active.any()
    assert (fit < 0).all()
