"""Segmentation: DASP pixel stage, seeds, ALIC, convex grouping,
batched-RANSAC registration."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.seg import (
    DaspConfig,
    convex_cloud_seg,
    floyd_steinberg_seeds,
    pixel_stage,
    pose_estimation,
)


def _scene():
    """Two flat boxes on a ground plane, 160x120, f=200."""
    h, w = 120, 160
    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    depth = np.zeros((h, w), np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    # ground plane tilted in y
    depth[:] = (900 + (h - yy) * 3).astype(np.uint16)
    # box 1 (near)
    depth[40:80, 20:60] = 700
    # box 2
    depth[30:70, 95:135] = 800
    rgb = np.full((h, w, 3), 120, np.uint8)
    rgb[40:80, 20:60] = (200, 60, 60)
    rgb[30:70, 95:135] = (60, 200, 60)
    return rgb, depth, K


def test_pixel_stage():
    rgb, depth, K = _scene()
    cfg = DaspConfig(focal_px=200.0, cx=80, cy=60)
    px = pixel_stage(jnp.asarray(rgb), jnp.asarray(depth), cfg)
    world = np.asarray(px["world"])
    normal = np.asarray(px["normal"])
    density = np.asarray(px["density"])
    assert world.shape == (120, 160, 3)
    # Box-1 center backprojects to z=0.7.
    assert abs(world[60, 40, 2] - 0.7) < 1e-3
    # Flat box region -> normal ~ (0, 0, -1).
    n = normal[55:65, 30:50]
    assert np.abs(n[..., 2] + 1).mean() < 0.05
    assert (density[depth > 0] > 0).all()


def test_seeds_density_proportional():
    density = np.zeros((40, 40))
    density[:20] = 0.05   # expect ~40 seeds in the top half
    seeds = floyd_steinberg_seeds(density)
    assert 25 <= len(seeds) <= 55
    assert (seeds[:, 1] < 22).all()


def test_convex_cloud_seg_separates_boxes():
    rgb, depth, K = _scene()
    cfg = DaspConfig(focal_px=200.0, cx=80, cy=60, radius=0.03)
    seg, world, normal = convex_cloud_seg(rgb, depth, K, cfg)
    assert seg.shape == depth.shape
    assert seg.max() >= 1  # at least 2 segments
    b1 = seg[50:70, 30:50]
    b2 = seg[40:60, 105:125]
    # Each box is dominated by a single segment...
    m1 = np.bincount(b1[b1 >= 0]).argmax()
    m2 = np.bincount(b2[b2 >= 0]).argmax()
    assert (b1 == m1).mean() > 0.7
    assert (b2 == m2).mean() > 0.7
    # ...and the two boxes are different segments (depth gap -> no merge).
    assert m1 != m2


def test_pose_estimation_recovers_transform():
    rng = np.random.default_rng(0)
    # Model: box corner cloud (asymmetric L-shape for a unique fit).
    base = rng.uniform(0, 40, (400, 3))
    base[:200, 2] = 0         # plate
    base[200:, 0] = 0         # wall
    from sixdpose_tpu.geometry.transform import rotation_matrix

    R = rotation_matrix(0.6, [0.2, 1, 0.3])[:3, :3]
    t = np.array([30.0, -20.0, 55.0])
    scene = base @ R.T + t

    T, lcp = pose_estimation(scene, base, delta=2.0, num_hyp=2048, seed=1)
    assert lcp > 0.5, lcp
    err = np.abs(base @ T[:3, :3].T + T[:3, 3] - scene).max()
    assert err < 3.0, err


def test_pose_estimation_rejects_garbage():
    rng = np.random.default_rng(3)
    model = rng.uniform(0, 40, (300, 3))
    scene = rng.uniform(200, 400, (300, 3)) * np.array([1, 3, 0.2])
    T, lcp = pose_estimation(scene, model, delta=1.0, num_hyp=512, seed=2)
    if lcp <= 0.5:
        assert (T == 0).all()


def test_slic_superpixels():
    from sixdpose_tpu.seg.slic import superpixels_slic

    rng = np.random.default_rng(3)
    rgb = np.zeros((64, 96, 3), np.uint8)
    rgb[:, :48] = (220, 40, 40)
    rgb[:, 48:] = (40, 40, 220)
    rgb = np.clip(rgb.astype(np.int16) + rng.integers(-8, 8, rgb.shape), 0, 255).astype(np.uint8)
    idx, sp = superpixels_slic(rgb, num_superpixels=24)
    assert idx.shape == (64, 96)
    assigned = idx >= 0
    assert assigned.mean() > 0.98
    # Superpixels should not straddle the color boundary: every superpixel's
    # pixels are (almost) entirely one side.
    for s in np.unique(idx[assigned]):
        cols = (np.nonzero(idx == s)[1] < 48)
        assert cols.mean() < 0.05 or cols.mean() > 0.95, s


def test_asp_superpixels_density():
    from sixdpose_tpu.seg.slic import superpixels_asp

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    density = np.full((64, 64), 4.0 / (64 * 64), np.float32)
    density[:, 32:] *= 8  # denser superpixels on the right
    idx, sp = superpixels_asp(rgb, density)
    assigned = idx >= 0
    left = len(np.unique(idx[:, :32][assigned[:, :32]]))
    right = len(np.unique(idx[:, 32:][assigned[:, 32:]]))
    assert right > left


def test_pose_estimation_4pcs_occluded():
    """Planar-base 4PCS must register a heavily occluded segment (only a
    partial planar patch visible) where the method contract is explicit."""
    from sixdpose_tpu.seg.registration import pose_estimation

    rng = np.random.default_rng(5)
    # Model: a box point cloud (mm).
    xs = np.linspace(-30, 30, 12)
    ys = np.linspace(-20, 20, 9)
    zs = np.linspace(-10, 10, 5)
    faces = []
    for x in xs:
        for y in ys:
            faces += [[x, y, -10], [x, y, 10]]
    for x in xs:
        for z in zs:
            faces += [[x, -20, z], [x, 20, z]]
    for y in ys:
        for z in zs:
            faces += [[-30, y, z], [30, y, z]]
    model = np.unique(np.array(faces, np.float64), axis=0)

    # Scene: only the top face visible (heavy occlusion), rotated+shifted.
    th = 0.4
    R = np.array([
        [np.cos(th), -np.sin(th), 0],
        [np.sin(th), np.cos(th), 0],
        [0, 0, 1.0],
    ])
    t = np.array([120.0, -40.0, 500.0])
    top = model[model[:, 2] > 9.9]
    seg = top @ R.T + t + rng.normal(0, 0.3, top.shape)

    T, lcp = pose_estimation(seg, model, delta=4.0, min_lcp=0.2, method="4pcs",
                             seed=3)
    assert lcp > 0.2, lcp
    # The registered top face must land on the segment.
    top_t = top @ T[:3, :3].T + T[:3, 3]
    d = np.linalg.norm(top_t[:, None, :] - seg[None, :, :], axis=-1).min(1)
    assert np.median(d) < 5.0, np.median(d)
