"""Fused detect->refine->verify pipeline (models/pipeline.py): one
compiled dispatch must reproduce the unfused serving path's behavior."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


@pytest.fixture(scope="module")
def trained_two_class():
    """One detector bank holding two classes (box + star)."""
    models = make_models()
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        top_k=16,
        color=ColorGradientConfig(num_features=24, strong_threshold=30.0),
        depth=DepthNormalConfig(num_features=16, extract_threshold=1, focal=160.0),
    )
    det = Detector(cfg)
    for cid in ("box", "cup"):
        stats = render_train_templates(
            det, cid, models[cid], K,
            radii=[420.0], min_n_views=16, im_size=IM,
            tilt_range=(0.0, 0.1), tilt_step=1.0,
        )
        assert stats["added"] >= 8, (cid, stats)
    return det, {c: models[c] for c in ("box", "cup")}


def _two_object_scene(det, models):
    """Both objects in one frame, z-buffer composited."""
    _, Rb, tb = template_pose(det, "box", 0)
    _, Rc, tc = template_pose(det, "cup", 0)
    t_box = tb.flatten() + np.array([-35.0, 0.0, 10.0])
    t_cup = tc.flatten() + np.array([45.0, 5.0, -15.0])
    rgb = np.zeros((IM[1], IM[0], 3), np.uint8)
    depth = np.zeros((IM[1], IM[0]), np.float32)
    for cid, R, t in (("box", Rb, t_box), ("cup", Rc, t_cup)):
        r_i, d_i = render(models[cid], IM, K, R, t, mode="rgb+depth")
        r_i, d_i = np.asarray(r_i), np.asarray(d_i)
        closer = (d_i > 0) & ((depth == 0) | (d_i < depth))
        depth[closer] = d_i[closer]
        rgb[closer] = r_i[closer]
    gts = {"box": (Rb, t_box), "cup": (Rc, t_cup)}
    return rgb, depth.astype(np.uint16), gts


def test_fused_multiclass_recovers_both(trained_two_class):
    """One dispatch over two classes recovers both poses."""
    from sixdpose_tpu.models.pipeline import FusedMultiClassPipeline
    from sixdpose_tpu.serving import PoseEstimationService

    det, models = trained_two_class
    rgb, depth, gts = _two_object_scene(det, models)

    svc = PoseEstimationService(
        det, models, K, threshold=55.0, max_refine=4,
        icp=IcpConfig(max_iters=12), min_fitness=0.3,
    )
    vps = {c: np.asarray(svc._verify_points(c)[0]) for c in models}
    vcs = {c: np.asarray(svc._verify_points(c)[1]) for c in models}
    pipe = FusedMultiClassPipeline(
        det, K, class_ids=["box", "cup"], icp=IcpConfig(max_iters=12),
        max_refine=4, num_points=256, verify_pts=vps, verify_colors=vcs,
    )
    tid, x, y, score, R, t, fit, ver, active = map(
        np.asarray, pipe(rgb, depth, 55.0)
    )
    assert tid.shape == (2, 4)
    for ci, cid in enumerate(["box", "cup"]):
        R_gt, t_gt = gts[cid]
        # Best-verify active hypothesis of the class lands on the object.
        idx = [i for i in range(4) if active[ci, i] and fit[ci, i] > 0.3]
        assert idx, (cid, active[ci], fit[ci])
        best = max(idx, key=lambda i: ver[ci, i])
        err = np.linalg.norm(t[ci, best] - t_gt)
        assert err < 10.0, (cid, t[ci, best], t_gt, err)


def test_fused_multiclass_matches_per_class(trained_two_class):
    """Multi-class fused output per class == per-class fused pipeline
    (same templates, same ICP, same verify), modulo float tolerance."""
    from sixdpose_tpu.models.pipeline import FusedMultiClassPipeline
    from sixdpose_tpu.serving import PoseEstimationService

    det, models = trained_two_class
    rgb, depth, _ = _two_object_scene(det, models)
    icp = IcpConfig(max_iters=10)
    svc = PoseEstimationService(det, models, K, icp=icp)
    vps = {c: np.asarray(svc._verify_points(c)[0]) for c in models}
    vcs = {c: np.asarray(svc._verify_points(c)[1]) for c in models}

    mc = FusedMultiClassPipeline(
        det, K, class_ids=["box", "cup"], icp=icp, max_refine=3,
        num_points=256, verify_pts=vps, verify_colors=vcs,
    )
    out_mc = [np.asarray(a) for a in mc(rgb, depth, 55.0)]

    for ci, cid in enumerate(["box", "cup"]):
        single = FusedPipeline(
            det, cid, K, icp=icp, max_refine=3, num_points=256,
            verify_pts=vps[cid], verify_colors=vcs[cid],
        )
        tid, x, y, score, R, t, fit, ver, active = map(
            np.asarray, single(rgb, depth, 55.0)
        )
        np.testing.assert_array_equal(out_mc[8][ci], active)
        sel = active
        np.testing.assert_array_equal(out_mc[0][ci][sel], tid[sel])
        np.testing.assert_allclose(
            out_mc[3][ci][sel], score[sel], atol=1e-4
        )
        np.testing.assert_allclose(out_mc[5][ci][sel], t[sel], atol=0.5)
        np.testing.assert_allclose(out_mc[7][ci][sel], ver[sel], atol=0.02)


def test_service_multiclass_one_dispatch(trained_two_class):
    """The serving layer routes multi-class banks through the fused
    multi-class pipeline and returns per-class verified estimates."""
    from sixdpose_tpu.serving import PoseEstimationService

    det, models = trained_two_class
    rgb, depth, gts = _two_object_scene(det, models)
    svc = PoseEstimationService(
        det, models, K, threshold=55.0, max_refine=4,
        icp=IcpConfig(max_iters=12), min_fitness=0.3,
    )
    ests = svc.process_frame(rgb, depth)
    assert svc._fused_mc is not None  # the one-dispatch path was used
    found = {e.class_id for e in ests}
    assert found == {"box", "cup"}, found
    for cid in ("box", "cup"):
        top = next(e for e in ests if e.class_id == cid)
        _, t_gt = gts[cid]
        assert np.linalg.norm(top.t.flatten() - t_gt) < 10.0, (cid, top.t)


def test_verify_poses_multi_matches_single(trained_box):
    """verify_poses_multi with broadcast points == verify_poses."""
    import jax.numpy as jnp

    from sixdpose_tpu.models.refine import verify_poses, verify_poses_multi

    from sixdpose_tpu.geometry.render import subdivide_mesh

    det, model = trained_box
    _, R0, t0 = template_pose(det, "box", 0)
    _, depth = render(model, IM, K, R0, t0.flatten(), mode="rgb+depth")
    depth = jnp.asarray(np.asarray(depth).astype(np.uint16))
    pts2, faces2 = subdivide_mesh(
        np.asarray(model["pts"], np.float64),
        np.asarray(model["faces"], np.int64), max_edge=4.0,
    )
    pts = np.concatenate([pts2, pts2[faces2].mean(1)], 0).astype(np.float32)
    Rs = jnp.asarray(np.stack([R0, R0]).astype(np.float32))
    ts = jnp.asarray(
        np.stack([t0.flatten(), t0.flatten() + 200.0]).astype(np.float32)
    )
    Kj = jnp.asarray(K.astype(np.float32))
    s1 = np.asarray(verify_poses(jnp.asarray(pts), Rs, ts, depth, Kj))
    # Padded multi variant: second half of the rows invalid.
    pts_pad = np.concatenate([pts, np.zeros_like(pts)], 0)
    valid = np.concatenate(
        [np.ones(len(pts), bool), np.zeros(len(pts), bool)]
    )
    s2 = np.asarray(
        verify_poses_multi(
            jnp.asarray(np.stack([pts_pad, pts_pad])),
            jnp.asarray(np.stack([valid, valid])),
            Rs, ts, depth, Kj,
        )
    )
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    # GT pose scores well above the displaced pose (absolute value is
    # resolution-limited at 160x120: silhouette-adjacent samples straddle
    # pixels).
    assert s1[0] > 0.4 and s1[1] < 0.1, s1


def test_verify_color_zscore_separates_texture_twin():
    """Per-pixel chroma informativeness weighting (color_zscore=True)
    widens the verify margin between a pose with CORRECT texture and its
    geometric twin with WRONG texture: depth is identical for both, the
    texture strip is only 25% of the surface, so the unweighted color
    fraction moves little, while the z-score weights make the texture
    pixels dominate.  For a uniform-color model the weights collapse to
    the constant floor and the score must equal the unweighted one."""
    import jax.numpy as jnp

    from sixdpose_tpu.models.refine import verify_poses

    Kc = np.array([[200.0, 0, 80.0], [0, 200.0, 60.0], [0, 0, 1]],
                  np.float32)
    # Flat 40x40 mm plate of points facing the camera at z=300.
    xs, ys = np.meshgrid(np.arange(-20.0, 20.0), np.arange(-20.0, 20.0))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], 1)
    pts = pts.astype(np.float32)
    t = np.array([0.0, 0.0, 300.0], np.float32)
    R = np.eye(3, dtype=np.float32)
    u = np.round(pts[:, 0] / 300.0 * 200.0 + 80.0).astype(int)
    v = np.round(pts[:, 1] / 300.0 * 200.0 + 60.0).astype(int)
    depth = np.zeros((120, 160), np.uint16)
    depth[v, u] = 300
    # Scene color: a red texture strip over x > 10 mm, gray elsewhere.
    tex = pts[:, 0] > 10.0  # 25% of the points
    rgb = np.full((120, 160, 3), (120, 120, 120), np.uint8)
    rgb[v[tex], u[tex]] = (200, 40, 40)
    col_right = np.where(tex[:, None], (200, 40, 40), (120, 120, 120))
    col_wrong = np.where(tex[:, None], (40, 40, 200), (120, 120, 120))
    Rs = jnp.asarray(np.stack([R, R]))
    ts = jnp.asarray(np.stack([t, t]))

    def score(colors, zscore):
        return np.asarray(
            verify_poses(
                jnp.asarray(pts), Rs, ts, jnp.asarray(depth),
                jnp.asarray(Kc), tau_mm=6.0,
                model_colors=jnp.asarray(colors.astype(np.float32)),
                rgb=jnp.asarray(rgb), color_zscore=zscore,
            )
        )

    # Two hypotheses share geometry; only the model texture differs.
    plain_r = score(col_right, False)[0]
    plain_w = score(col_wrong, False)[0]
    z_r = score(col_right, True)[0]
    z_w = score(col_wrong, True)[0]
    margin_plain = plain_r - plain_w
    margin_z = z_r - z_w
    assert margin_plain > 0.0
    assert margin_z > 1.5 * margin_plain, (margin_plain, margin_z)
    # Uniform-color model: z-scoring must reduce to the unweighted score.
    col_uni = np.full_like(col_right, 120)
    np.testing.assert_allclose(
        score(col_uni, True), score(col_uni, False), atol=1e-6
    )


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


def test_inplane_seed_fan_flip():
    """The seed fan's flip variant replaces the last slot with a 180-deg
    in-plane rotation about the camera ray through the seeded centroid:
    near-180-symmetric silhouettes (wedge vs its flip) lock template
    matching onto the wrong half of the view sphere, and only a flipped
    ICP init reaches the true basin (TUNING_r04.json: wedge 4/8 -> 6/8)."""
    import jax.numpy as jnp

    from sixdpose_tpu.models.pipeline import _inplane_seed_transforms

    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = (0.01, -0.02, 0.4)
    src_c = np.array([[0.005, 0.0, 0.01]], np.float32)
    out = np.asarray(
        _inplane_seed_transforms(
            jnp.asarray(T0[None]), jnp.asarray(src_c), 4, 18.0, True
        )
    )
    assert out.shape == (4, 4, 4)
    # Slots 0-2: the +-18-deg fan INCLUDING the identity seed.
    assert any(np.allclose(out[i], T0, atol=1e-6) for i in range(3))
    # Slot 3: 180-deg in-plane rotation composed with T0; the MODEL-frame
    # centroid src_c maps to the same camera point under T0 and under the
    # flip seed (the rotation pivots about T0(src_c)), and the relative
    # rotation trace is -1 (2*cos 180 + 1).
    center = T0[:3, 3] + src_c[0]          # T0(src_c), T0 rotation = I
    c2 = out[3, :3, :3] @ src_c[0] + out[3, :3, 3]
    np.testing.assert_allclose(c2, center, atol=1e-5)
    rel = out[3, :3, :3] @ np.linalg.inv(T0[:3, :3])
    assert abs(np.trace(rel) - (-1.0)) < 1e-4, np.trace(rel)
    # flip=False keeps the plain symmetric fan (no 180 slot).
    out0 = np.asarray(
        _inplane_seed_transforms(
            jnp.asarray(T0[None]), jnp.asarray(src_c), 3, 18.0, False
        )
    )
    assert np.allclose(out0[1], T0, atol=1e-6)


def test_fused_pipeline_two_instances(trained_box):
    """Two instances of the SAME object must BOTH reach the refine pool:
    the (template, location) dedupe keeps same-view peaks that are far
    apart (round-4 template-only dedupe silently dropped the second
    instance whenever both peaked on the same view)."""
    det, model = trained_box
    Ki, R0, t0 = template_pose(det, "box", 0)
    t_a = t0.flatten() + np.array([-30.0, 0.0, 10.0])
    t_b = t0.flatten() + np.array([34.0, 6.0, 10.0])
    rgb_a, dep_a = render(model, IM, K, R0, t_a, mode="rgb+depth")
    rgb_b, dep_b = render(model, IM, K, R0, t_b, mode="rgb+depth")
    dep_a = np.asarray(dep_a).astype(np.uint16)
    dep_b = np.asarray(dep_b).astype(np.uint16)
    rgb = np.where(
        (dep_b > 0)[..., None], np.asarray(rgb_b), np.asarray(rgb_a)
    )
    depth = np.where((dep_b > 0) & ((dep_a == 0) | (dep_b < dep_a)),
                     dep_b, dep_a)

    pipe = FusedPipeline(
        det, "box", K, icp=IcpConfig(max_iters=12), max_refine=8,
        num_points=256,
    )
    tid, x, y, score, R, t, fit, ver, active = map(
        np.asarray, pipe(rgb, depth.astype(np.uint16), 60.0)
    )
    good = active & (fit > 0.3)
    errs_a = np.linalg.norm(t[good] - t_a, axis=1)
    errs_b = np.linalg.norm(t[good] - t_b, axis=1)
    assert (errs_a < 15.0).any(), (t[good], t_a)
    assert (errs_b < 15.0).any(), (t[good], t_b)
