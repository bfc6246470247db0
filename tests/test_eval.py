"""Evaluation metrics: analytic golden cases and protocol behavior."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.eval import pose_error as PE
from sixdpose_tpu.eval.loc import calc_errors, calc_scores, match_scene
from sixdpose_tpu.eval.misc import depth_im_to_dist_im, model_diameter
from sixdpose_tpu.eval.score import ap, match_poses


def _cube_model(half=20.0):
    pts = np.array(
        [
            [sx * half, sy * half, sz * half]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ],
        np.float64,
    )
    faces = []
    # 12 triangles over the cube faces (vertex order chosen per face).
    quads = [
        (0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5),
    ]
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return {"pts": pts, "faces": np.array(faces)}


def test_add_translation():
    m = {"pts": np.random.default_rng(0).normal(size=(100, 3))}
    R = np.eye(3)
    t0 = np.zeros((3, 1))
    t1 = np.array([[3.0], [4.0], [0.0]])
    assert abs(PE.add(R, t1, R, t0, m) - 5.0) < 1e-5


def test_adi_leq_add_and_symmetry():
    rng = np.random.default_rng(1)
    m = {"pts": rng.normal(size=(200, 3))}
    R = np.eye(3)
    t0 = np.zeros((3, 1))
    t1 = np.array([[1.0], [0.5], [0.2]])
    a = PE.add(R, t1, R, t0, m)
    b = PE.adi(R, t1, R, t0, m)
    assert b <= a + 1e-6
    # Rotationally symmetric cloud: ring in xy-plane; rotation about z is
    # "free" for ADI but not ADD.
    th = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    ring = {"pts": np.stack([np.cos(th), np.sin(th), 0 * th], 1)}
    Rz = np.array(
        [[np.cos(0.5), -np.sin(0.5), 0], [np.sin(0.5), np.cos(0.5), 0], [0, 0, 1]]
    )
    assert PE.add(Rz, t0, np.eye(3), t0, ring) > 0.1
    assert PE.adi(Rz, t0, np.eye(3), t0, ring) < 0.02


def test_re_te():
    Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    assert abs(PE.re(Rz90, np.eye(3)) - 90.0) < 1e-6
    assert abs(PE.te(np.array([1, 2, 2.0]), np.zeros(3)) - 3.0) < 1e-9


def test_dist_im():
    K = np.array([[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]])
    d = np.zeros((16, 16), np.float32)
    d[8, 8] = 500.0  # principal point: dist == depth
    dist = np.asarray(depth_im_to_dist_im(jnp.asarray(d), jnp.asarray(K)))
    assert abs(dist[8, 8] - 500.0) < 1e-3
    d[0, 0] = 500.0
    dist = np.asarray(depth_im_to_dist_im(jnp.asarray(d), jnp.asarray(K)))
    assert dist[0, 0] > 500.0


def test_model_diameter():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 0], [5, 5, 5.0]])
    d = model_diameter(pts)
    assert abs(d - np.sqrt(75)) < 1e-9


def test_vsd_same_pose_zero_far_pose_one():
    m = _cube_model()
    K = np.array([[200.0, 0, 32], [0, 200.0, 32], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([0, 0, 400.0])
    from sixdpose_tpu.geometry.render import render

    depth_test = np.asarray(render(m, (64, 64), K, R, t, mode="depth"))
    assert (depth_test > 0).sum() > 50
    e_same = PE.vsd(R, t, R, t, m, depth_test, K, delta=15, tau=20, cost_type="step")
    assert e_same < 0.01
    t_far = np.array([0, 0, 800.0])
    e_far = PE.vsd(R, t_far, R, t, m, depth_test, K, delta=15, tau=20, cost_type="step")
    assert e_far > 0.5


def test_cou():
    m = _cube_model()
    K = np.array([[200.0, 0, 32], [0, 200.0, 32], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([0, 0, 400.0])
    assert PE.cou(R, t, R, t, m, (64, 64), K) < 1e-6
    t2 = np.array([200.0, 0, 400.0])  # far off screen-overlap
    assert PE.cou(R, t2, R, t, m, (64, 64), K) > 0.9


def test_ap_properties():
    # Perfect classifier: precision 1 at every recall.
    rec = [0.2, 0.4, 0.6, 0.8, 1.0]
    pre = [1.0] * 5
    assert abs(ap(rec, pre) - 1.0) < 1e-9
    # The reference's own self-test case (score.py:40-48).
    tp = np.array([False, True, True, False, True, False])
    tp_c = np.cumsum(tp).astype(float)
    fp_c = np.cumsum(~tp).astype(float)
    rec = tp_c / tp.size
    pre = tp_c / (fp_c + tp_c)
    v = ap(rec, pre)
    # Independent step integration of the monotone envelope.
    import numpy as _np

    grid = _np.linspace(0, 1, 10001)
    env = _np.zeros_like(grid)
    rec_a = _np.concatenate([rec, [1.0]])
    pre_a = _np.concatenate([pre, [0.0]])
    for i, r in enumerate(grid):
        sel = rec_a >= r
        env[i] = pre_a[sel].max() if sel.any() else 0.0
    approx = _np.trapezoid(env, grid)
    assert abs(v - approx) < 5e-3


def test_match_poses_greedy():
    errs = [
        {"est_id": 0, "score": 0.9, "errors": {0: 0.05, 1: 0.2}},
        {"est_id": 1, "score": 0.8, "errors": {0: 0.04, 1: 0.15}},
    ]
    ms = match_poses(errs, error_thresh=0.3)
    # est 0 (highest score) takes gt 0; est 1 falls back to gt 1.
    assert ms[0]["est_id"] == 0 and ms[0]["gt_id"] == 0
    assert ms[1]["est_id"] == 1 and ms[1]["gt_id"] == 1
    # n_top=1 keeps only the best-scored estimate.
    ms1 = match_poses(errs, error_thresh=0.3, max_ests_count=1)
    assert len(ms1) == 1 and ms1[0]["est_id"] == 0
    # Invalid gt mask blocks matching.
    ms2 = match_poses(errs, 0.3, gt_valid_mask=[False, True])
    assert all(m["gt_id"] == 1 for m in ms2)


def test_scene_scoring():
    gts = {0: [{"obj_id": 5}], 1: [{"obj_id": 5}]}
    visib = {0: [1.0], 1: [0.05]}  # image 1's GT barely visible -> invalid
    errs_by_im = {
        0: {5: [{"est_id": 0, "score": 0.9, "errors": {0: 0.1}}]},
        1: {5: [{"est_id": 0, "score": 0.9, "errors": {0: 0.1}}]},
    }
    matches = match_scene(gts, visib, errs_by_im, scene_id=5, error_threshs={5: 0.3})
    scores = calc_scores([5], [5], matches, n_top=1)
    # Only image 0 counts as a target; it was matched -> recall 1.
    assert scores["targets_count"] == 1
    assert scores["tp_count"] == 1
    assert scores["total_recall"] == 1.0


def test_calc_errors_types():
    m = _cube_model()
    ests = [{"score": 1.0, "R": np.eye(3), "t": np.array([[0.0], [0.0], [400.0]])}]
    gts = [
        {"obj_id": 1, "cam_R_m2c": np.eye(3), "cam_t_m2c": np.array([[0.0], [0.0], [400.0]])}
    ]
    for et in ("add", "adi", "re", "te"):
        out = calc_errors(ests, gts, m, None, None, error_type=et)
        assert out[0]["errors"][0] < 1e-3
