"""LCHF: synthetic-similarity forest validation (the reference's
fake_feature_test idea, cxxLCHF/test.cpp:94-141), mean-shift, voting, and
a small end-to-end render -> train -> predict -> vote run."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.lchf import (
    LchfConfig,
    Forest,
    PatchSet,
    cluster_modes,
    dense_rois,
    extract_patch_feature,
    hough_vote,
    make_training_patches,
    predict_scene,
    scene_roi_set,
    similarity_one_to_many,
    train_forest,
)


def _fake_clusters(rng, n_clusters=4, per=30):
    """2-D points in well-separated clusters; similarity = closed-form
    distance measure; rpy label = cluster-specific direction + noise."""
    centers = rng.uniform(-50, 50, (n_clusters, 2))
    pts, rpy = [], []
    for ci, c in enumerate(centers):
        pts.append(c + rng.normal(0, 1.5, (per, 2)))
        base = np.array([ci * 0.7, -ci * 0.4, ci * 0.2])
        rpy.append(base + rng.normal(0, 0.02, (per, 3)))
    return np.concatenate(pts), np.concatenate(rpy).astype(np.float32)


def test_forest_splits_fake_clusters(rng):
    pts, rpy = _fake_clusters(rng)
    n = len(pts)

    def similarity_rows(pivot, members):
        d = np.linalg.norm(pts[members] - pts[pivot], axis=1)
        return 100.0 * np.exp(-d / 20.0)

    forest = Forest(num_trees=3, train_ratio=0.8, seed=1, size_thresh=5)
    forest.train(similarity_rows, rpy)

    # Leaves should be (near-)pure in cluster identity.
    cluster_of = np.repeat(np.arange(4), 30)
    purities = []
    for tree in forest.trees:
        for leaf in tree.id_leafnodes:
            ids = tree.nodes[leaf].ind_feats
            if len(ids) < 3:
                continue
            labels = cluster_of[ids]
            purities.append(np.bincount(labels).max() / len(labels))
    assert purities and np.mean(purities) > 0.9

    # Prediction routes a sample near a cluster center to a leaf whose
    # members are from that cluster.
    probe = pts[5] + 0.1  # near cluster 0
    leaf_ids = forest.predict(lambda piv: 100.0 * np.exp(-np.linalg.norm(pts[piv] - probe) / 20.0))
    lm = forest.leaf_feats_map()
    for ti, leaf in enumerate(leaf_ids):
        members = lm[ti][leaf]
        assert np.bincount(cluster_of[members]).argmax() == 0


def test_forest_save_load(rng, tmp_path):
    pts, rpy = _fake_clusters(rng, n_clusters=2, per=20)

    def similarity_rows(pivot, members):
        d = np.linalg.norm(pts[members] - pts[pivot], axis=1)
        return 100.0 * np.exp(-d / 20.0)

    forest = Forest(num_trees=2, seed=0, size_thresh=5)
    forest.train(similarity_rows, rpy)
    p = str(tmp_path / "forest.npz")
    forest.save(p)
    back = Forest.load(p)
    assert len(back.trees) == 2
    for t1, t2 in zip(forest.trees, back.trees):
        assert t1.id_leafnodes == t2.id_leafnodes
        assert all(
            n1.split_feat_idx == n2.split_feat_idx
            and abs(n1.simi_thresh - n2.simi_thresh) < 1e-6
            for n1, n2 in zip(t1.nodes, t2.nodes)
        )


def test_mean_shift_modes(rng):
    blobs = np.concatenate(
        [rng.normal(0, 0.1, (40, 2)), rng.normal(5, 0.1, (40, 2)), rng.normal((0, 8), 0.1, (40, 2))]
    )
    modes, labels = cluster_modes(blobs, bandwidth=1.0)
    assert len(modes) == 3
    assert len(np.unique(labels)) == 3


def _patch_pair():
    rng = np.random.default_rng(0)
    rgb = np.zeros((50, 50, 3), np.uint8)
    rgb[10:40, 10:40] = (200, 60, 30)
    rgb[20:30, 20:30] = (30, 200, 160)
    depth = np.full((50, 50), 800, np.uint16)
    yy, xx = np.mgrid[0:50, 0:50]
    depth = (depth + 3 * xx).astype(np.uint16)
    return rgb, depth


def test_patch_similarity_self_high():
    """simi_test semantics (cxxLCHF/test.cpp:200): self-similarity ~ 100."""
    rgb, depth = _patch_pair()
    cfg = LchfConfig(num_features=8, extract_threshold=1)
    f = extract_patch_feature(rgb, depth, None, cfg, with_responses=True)
    assert f is not None
    pset = PatchSet.from_features([f])
    sim = similarity_one_to_many(f, pset, np.array([0]), cfg.z_check)
    assert sim[0] > 90.0

    # A blank patch's responses give (near-)zero similarity.
    blank_rgb = np.zeros((50, 50, 3), np.uint8)
    blank_rgb[24:26, 24:26] = 255
    f2 = extract_patch_feature(blank_rgb, depth, None, cfg, with_responses=True)
    if f2 is not None:
        pset2 = PatchSet.from_features([f2])
        sim12 = similarity_one_to_many(f, pset2, np.array([0]), cfg.z_check)
        assert sim12[0] < sim[0]


def test_dense_rois():
    depth = np.zeros((100, 120), np.uint16)
    depth[20:80, 30:90] = 700
    rois = dense_rois(depth, stride=10, width=50, height=50)
    assert len(rois) > 0
    assert (rois[:, 4] > 0).all()
    assert (rois[:, 0] + rois[:, 2] < 120).all()


def test_end_to_end_vote_peak():
    """Train on patches of one rendered-like object; vote on a scene with
    the object translated; the top vote bin should be near the new center."""
    rng = np.random.default_rng(2)
    obj = np.zeros((60, 60, 3), np.uint8)
    yy, xx = np.mgrid[0:60, 0:60]
    m = ((yy - 30) ** 2 + (xx - 30) ** 2) < 625
    obj[m] = (180, 90, 40)
    obj[m & (xx > 30)] = (40, 160, 220)
    obj[m & (yy > 30) & (xx <= 30)] = (90, 220, 90)
    obj_depth = np.where(m, 500 + (xx - 30) * 2, 0).astype(np.uint16)

    train_rgb = np.zeros((120, 140, 3), np.uint8)
    train_rgb[30:90, 40:100] = obj
    train_depth = np.zeros((120, 140), np.uint16)
    train_depth[30:90, 40:100] = obj_depth
    train_mask = np.zeros((120, 140), np.uint8)
    train_mask[30:90, 40:100] = m.astype(np.uint8) * 255

    cfg = LchfConfig(num_features=6, extract_threshold=1, strong_threshold=30.0)
    feats, rpys, ts = make_training_patches(
        train_rgb, train_depth, train_mask, np.eye(3), cfg, patch=40, stride=10
    )
    assert len(feats) >= 4, len(feats)
    model = train_forest(
        feats, np.array(rpys), np.array(ts), cfg, num_trees=2, size_thresh=2, seed=3
    )

    # Scene: same object shifted.
    scene_rgb = np.zeros((120, 140, 3), np.uint8)
    scene_rgb[50:110, 60:120] = obj
    scene_depth = np.zeros((120, 140), np.uint16)
    scene_depth[50:110, 60:120] = obj_depth

    rois = dense_rois(scene_depth, stride=10, width=40, height=40)
    assert len(rois) > 0
    roi_set = scene_roi_set(scene_rgb, scene_depth, rois, cfg)
    leaves = predict_scene(model, roi_set, cfg)
    bins, scores, votes = hough_vote(
        leaves,
        model.leaf_feats_map(),
        rois,
        model.rpy,
        model.t,
        im_size=(140, 120),
        train_radius=500.0,
        steps=10,
    )
    assert len(bins) > 0 and scores[0] > 0
    # Scene object center ~ (90, 80); top-3 vote x-bin within 2 bins.
    top_xy = bins[:3, :2] * 10
    d = np.linalg.norm(top_xy - np.array([90, 80]), axis=1)
    assert d.min() < 25.0, (bins[:3], scores[:3])


def test_lchf_model_save_load(tmp_path):
    """Full model persistence roundtrip (replaces the reference's
    protobuf forests/features/infos triple)."""
    from sixdpose_tpu.lchf.model import LchfModel

    rgb, depth = _patch_pair()
    cfg = LchfConfig(num_features=8, extract_threshold=1)
    f = extract_patch_feature(rgb, depth, None, cfg, with_responses=True)
    assert f is not None
    model = train_forest([f, f], np.zeros((2, 3)), np.zeros((2, 3)), cfg,
                         num_trees=1, size_thresh=1)
    prefix = str(tmp_path / "lchf")
    model.save(prefix)
    back = LchfModel.load(prefix)
    assert len(back.patches) == 2
    assert (back.patch_set.responses == model.patch_set.responses).all()
    assert back.patches[0].center_dep == model.patches[0].center_dep
    assert len(back.forest.trees) == 1


def test_predict_scene_device_matches_host():
    """Device-staged cohort similarity must match the host numpy path."""
    rng = np.random.default_rng(5)
    obj = np.zeros((60, 60, 3), np.uint8)
    yy, xx = np.mgrid[0:60, 0:60]
    m = ((yy - 30) ** 2 + (xx - 30) ** 2) < 625
    obj[m] = (180, 90, 40)
    obj[m & (xx > 30)] = (40, 160, 220)
    obj_depth = np.where(m, 500 + (xx - 30) * 2, 0).astype(np.uint16)

    train_rgb = np.zeros((120, 140, 3), np.uint8)
    train_rgb[30:90, 40:100] = obj
    train_depth = np.zeros((120, 140), np.uint16)
    train_depth[30:90, 40:100] = obj_depth
    train_mask = np.zeros((120, 140), np.uint8)
    train_mask[30:90, 40:100] = m.astype(np.uint8) * 255

    cfg = LchfConfig(num_features=6, extract_threshold=1, strong_threshold=30.0)
    feats, rpys, ts = make_training_patches(
        train_rgb, train_depth, train_mask, np.eye(3), cfg, patch=40, stride=12
    )
    assert len(feats) >= 3
    model = train_forest(
        feats, np.array(rpys), np.array(ts), cfg, num_trees=2, size_thresh=2, seed=1
    )
    scene_rgb = np.zeros((120, 140, 3), np.uint8)
    scene_rgb[50:110, 60:120] = obj
    scene_depth = np.zeros((120, 140), np.uint16)
    scene_depth[50:110, 60:120] = obj_depth
    rois = dense_rois(scene_depth, stride=12, width=40, height=40)
    roi_set = scene_roi_set(scene_rgb, scene_depth, rois, cfg)
    host = predict_scene(model, roi_set, cfg, device=False)
    dev = predict_scene(model, roi_set, cfg, device=True)
    assert host == dev


def test_similarity_matrix_device_matches_numpy():
    """The one-dispatch N x N training similarity matrix must equal the
    numpy reference row by row."""
    from sixdpose_tpu.lchf.device import similarity_matrix_device
    from sixdpose_tpu.lchf.feature import (
        LchfConfig, PatchSet, extract_patch_feature, similarity_one_to_many,
    )

    rng = np.random.default_rng(2)
    cfg = LchfConfig()
    patches = []
    for _ in range(8):
        rgb = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        dep = (500 + 40 * rng.standard_normal((32, 32))).astype(np.uint16)
        p = extract_patch_feature(rgb, dep, cfg=cfg, with_responses=True)
        if p is not None:
            patches.append(p)
    assert len(patches) >= 4
    pset = PatchSet.from_features(patches)
    S = similarity_matrix_device(patches, pset, cfg.z_check)
    idx = np.arange(len(patches))
    for i in range(len(patches)):
        ref = similarity_one_to_many(patches[i], pset, idx, cfg.z_check)
        assert np.allclose(S[i], ref, atol=1e-4), i


def test_train_forest_device_matches_host():
    from sixdpose_tpu.lchf.feature import LchfConfig, extract_patch_feature
    from sixdpose_tpu.lchf.model import train_forest, predict_scene
    from sixdpose_tpu.lchf.feature import PatchSet

    rng = np.random.default_rng(3)
    cfg = LchfConfig()
    patches, rpys, ts = [], [], []
    for _ in range(20):
        rgb = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        dep = (600 + 30 * rng.standard_normal((32, 32))).astype(np.uint16)
        p = extract_patch_feature(rgb, dep, cfg=cfg, with_responses=True)
        if p is None:
            continue
        patches.append(p)
        rpys.append(rng.standard_normal(3))
        ts.append(rng.standard_normal(3))
    rpys = np.asarray(rpys, np.float32); ts = np.asarray(ts, np.float32)
    m_host = train_forest(patches, rpys, ts, cfg, device=False)
    m_dev = train_forest(patches, rpys, ts, cfg, device=True)
    # Thresholds are sampled from similarity quartiles; float32 device
    # sims vs float64 numpy sims can flip borderline splits, so exact
    # tree equality is not required — but the device-trained forest must
    # be structurally equivalent (same tree count, non-trivial splits)
    # and predict consistently.
    assert len(m_dev.forest.trees) == len(m_host.forest.trees)
    for td, th in zip(m_dev.forest.trees, m_host.forest.trees):
        assert sum(nd.isleafnode for nd in td.nodes) >= 2
        assert abs(len(td.nodes) - len(th.nodes)) <= len(th.nodes)
    roi_set = PatchSet.from_features(patches[:8])
    dev_leaves = predict_scene(m_dev, roi_set, cfg)
    assert len(dev_leaves) == 8
    for leaves in dev_leaves:
        assert all(
            m_dev.forest.trees[ti].nodes[leaf].isleafnode
            for ti, leaf in enumerate(leaves)
        )


def test_dense_rois_reference_parity():
    """dense_rois must reproduce the reference ROI loop EXACTLY
    (LCHF_test.py:303-334: 5x5 nonzero-mean depth anchored at
    (x+10, y+10), truncated to int; rois with no valid depth dropped) —
    including at mask boundaries where the window is partially valid."""
    rng = np.random.default_rng(7)
    depth = np.zeros((100, 130), np.uint16)
    depth[18:77, 25:95] = rng.integers(400, 1200, (59, 70)).astype(np.uint16)
    depth[30:40, 40:55] = 0  # hole: windows straddling it are partial
    stride, width, height = 5, 50, 50

    ref = []
    rows, cols = depth.shape
    for x in range(0, cols - width - 2 * stride, stride):
        for y in range(0, rows - height - 2 * stride, stride):
            vals = depth[y + 10 : y + 15, x + 10 : x + 15].astype(np.float64)
            nz = vals[vals > 0]
            if len(nz) == 0:
                continue
            ref.append([x, y, width, height, int(nz.mean())])
    ref = np.array(ref, np.int64)

    got = dense_rois(depth, stride=stride, width=width, height=height)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_array_equal(got[:, :4], ref[:, :4])
    # float32 whole-image mean vs float64 loop: allow 1 mm truncation skew
    assert np.max(np.abs(got[:, 4] - ref[:, 4])) <= 1


def test_leaf_mode_voting_matches_peak():
    """Leaf-mode (mean-shift clustered) voting finds the same object
    center as raw-sample voting, with fewer votes (forest.cpp:200-228)."""
    from sixdpose_tpu.lchf import leaf_mode_map

    obj = np.zeros((60, 60, 3), np.uint8)
    yy, xx = np.mgrid[0:60, 0:60]
    m = ((yy - 30) ** 2 + (xx - 30) ** 2) < 625
    obj[m] = (180, 90, 40)
    obj[m & (xx > 30)] = (40, 160, 220)
    obj_depth = np.where(m, 500 + (xx - 30) * 2, 0).astype(np.uint16)

    train_rgb = np.zeros((120, 140, 3), np.uint8)
    train_rgb[30:90, 40:100] = obj
    train_depth = np.zeros((120, 140), np.uint16)
    train_depth[30:90, 40:100] = obj_depth
    train_mask = np.zeros((120, 140), np.uint8)
    train_mask[30:90, 40:100] = m.astype(np.uint8) * 255

    cfg = LchfConfig(num_features=6, extract_threshold=1, strong_threshold=30.0)
    feats, rpys, ts = make_training_patches(
        train_rgb, train_depth, train_mask, np.eye(3), cfg, patch=40, stride=10
    )
    model = train_forest(
        feats, np.array(rpys), np.array(ts), cfg, num_trees=2, size_thresh=2, seed=3
    )
    modes = leaf_mode_map(model)
    # every leaf's mode weights sum to 1 (weight conservation per tree)
    for tree_modes in modes:
        for _, (_, _, w) in tree_modes.items():
            assert abs(w.sum() - 1.0) < 1e-9

    scene_rgb = np.zeros((120, 140, 3), np.uint8)
    scene_rgb[50:110, 60:120] = obj
    scene_depth = np.zeros((120, 140), np.uint16)
    scene_depth[50:110, 60:120] = obj_depth

    rois = dense_rois(scene_depth, stride=10, width=40, height=40)
    roi_set = scene_roi_set(scene_rgb, scene_depth, rois, cfg)
    leaves = predict_scene(model, roi_set, cfg)
    bins, scores, _ = hough_vote(
        leaves, model.leaf_feats_map(), rois, model.rpy, model.t,
        im_size=(140, 120), train_radius=500.0, steps=10,
        leaf_modes=modes,
    )
    assert len(bins) > 0 and scores[0] > 0
    top_xy = bins[:3, :2] * 10
    d = np.linalg.norm(top_xy - np.array([90, 80]), axis=1)
    assert d.min() < 25.0, (bins[:3], scores[:3])


@pytest.mark.slow
def test_evaluate_recall_synthetic():
    """End-to-end recall harness on rendered views: in-sample evaluation
    must score well above zero, and the leaf-mode variant must run and
    report the same schema (lchf/eval.py)."""
    from sixdpose_tpu.benchmark import make_models
    from sixdpose_tpu.geometry.render import render
    from sixdpose_tpu.geometry.view_sampler import sample_views
    from sixdpose_tpu.lchf.eval import evaluate_recall
    from sixdpose_tpu.lchf.model import train_forest as tf

    K = np.array([[200.0, 0, 80.0], [0, 200.0, 60.0], [0, 0, 1]])
    model_mesh = make_models()["box"]
    views, _ = sample_views(8, radius=420.0)
    cfg = LchfConfig(num_features=6, extract_threshold=1, strong_threshold=30.0)
    feats, rpys, ts = [], [], []
    for v in views:
        rgb, depth = render(model_mesh, (160, 120), K, v["R"], v["t"], mode="rgb+depth")
        rgb, depth = np.asarray(rgb), np.asarray(depth).astype(np.uint16)
        mask = (depth > 0).astype(np.uint8) * 255
        p, r, t = make_training_patches(rgb, depth, mask, v["R"], cfg, patch=40, stride=12)
        feats.extend(p); rpys.extend(r); ts.extend(t)
    assert len(feats) >= 8
    model_l = tf(feats, np.array(rpys), np.array(ts), cfg,
                 num_trees=2, size_thresh=2, seed=1)

    res = evaluate_recall(
        model_l, model_mesh, K, (160, 120), views[:3], train_radius=420.0,
        cfg=cfg, stride=8, top_k=5, tol_px=30.0, device=False,
    )
    assert res["n_views"] == 3
    assert res["recall"] >= 1 / 3, res  # in-sample: most views must hit
    res_m = evaluate_recall(
        model_l, model_mesh, K, (160, 120), views[:2], train_radius=420.0,
        cfg=cfg, stride=8, top_k=5, tol_px=30.0, leaf_modes=True, device=False,
    )
    assert res_m["leaf_modes"] and res_m["n_views"] == 2


@pytest.mark.slow
def test_lchf_6d_pose_recall():
    """LCHF all the way to a 6D pose: vote bins decode to (R, t), batched
    ICP refines them, and in-sample ADD-S recall at 0.1*diameter must be
    positive — the row the reference never produced (its driver stops at
    top-10 vote bins, LCHF_test.py:343-405)."""
    from sixdpose_tpu.benchmark import make_models
    from sixdpose_tpu.geometry.render import render
    from sixdpose_tpu.geometry.view_sampler import sample_views
    from sixdpose_tpu.lchf.pose import (
        evaluate_pose_recall,
        lchf_pose_hypotheses,
    )
    from sixdpose_tpu.lchf.model import make_training_patches
    from sixdpose_tpu.lchf.model import train_forest as tf

    K = np.array([[200.0, 0, 80.0], [0, 200.0, 60.0], [0, 0, 1]])
    mesh = make_models()["box"]
    views, _ = sample_views(8, radius=420.0)
    cfg = LchfConfig(num_features=6, extract_threshold=1, strong_threshold=30.0)
    feats, rpys, ts = [], [], []
    for v in views:
        rgb, depth = render(mesh, (160, 120), K, v["R"], v["t"], mode="rgb+depth")
        rgb, depth = np.asarray(rgb), np.asarray(depth).astype(np.uint16)
        mask = (depth > 0).astype(np.uint8) * 255
        p, r, t = make_training_patches(rgb, depth, mask, v["R"], cfg, patch=40, stride=12)
        feats.extend(p); rpys.extend(r); ts.extend(t)
    model_l = tf(feats, np.array(rpys), np.array(ts), cfg,
                 num_trees=2, size_thresh=2, seed=1)

    # Hypotheses decode with sane geometry on one view.
    v0 = views[0]
    rgb, depth = render(mesh, (160, 120), K, v0["R"], v0["t"], mode="rgb+depth")
    hyps = lchf_pose_hypotheses(
        model_l, np.asarray(rgb), np.asarray(depth).astype(np.uint16), K,
        train_radius=420.0, cfg=cfg, stride=8, top_k=5,
    )
    assert hyps, "no pose hypotheses decoded"
    for h in hyps:
        assert h["R"].shape == (3, 3) and h["t"].shape == (3,)
        # Orthonormal rotation, translation in front of the camera.
        np.testing.assert_allclose(h["R"] @ h["R"].T, np.eye(3), atol=1e-6)
        assert 100.0 < h["t"][2] < 2000.0, h["t"]

    res = evaluate_pose_recall(
        model_l, mesh, K, (160, 120), views[:3], train_radius=420.0,
        cfg=cfg, stride=8, top_k=5, device=False,
    )
    assert res["n_views"] == 3
    assert res["recall"] >= 1 / 3, res  # in-sample: ICP from vote seeds
    assert res["threshold_mm"] > 0
