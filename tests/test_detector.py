"""End-to-end detector tests.

- Synthetic: train a template on a structured patch, find it translated in
  a larger scene (validates extraction -> kernels -> pyramid match).
- Golden: the reference's case1 fixture (linemodLevelup/test.cpp:74-88)
  records a detection at x=327, y=127 with the checked-in 127-feature bank;
  importing that bank and matching the checked-in scene must localize at
  the same place.  Gated by SIXDPOSE_SLOW_TESTS=1 (minutes of XLA CPU
  compile for VGA-scale grouped convs; the TPU path compiles fast).
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
from sixdpose_tpu.models.detector import Detector

from conftest import requires_reference


def _make_object(h=48, w=48, seed=3):
    """A high-contrast blobby object with a mask."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 2 - 4) ** 2
    img[mask] = (60, 170, 230)
    img[mask & (xx > w / 2)] = (230, 90, 30)
    img[mask & (yy > h / 2) & (xx <= w / 2)] = (120, 230, 60)
    noise = rng.integers(0, 20, (h, w, 3), np.uint8)
    return np.clip(img + noise, 0, 255).astype(np.uint8), mask.astype(np.uint8) * 255


@pytest.fixture(scope="module")
def small_cfg():
    return DetectorConfig(
        t_at_level=(4, 8),
        use_depth=False,
        top_k=16,
        color=ColorGradientConfig(num_features=24),
    )


def test_train_and_detect_translated(small_cfg):
    obj, mask = _make_object()
    train = np.zeros((96, 128, 3), np.uint8)
    train[24 : 24 + 48, 40 : 40 + 48] = obj
    train_mask = np.zeros((96, 128), np.uint8)
    train_mask[24 : 24 + 48, 40 : 40 + 48] = mask

    det = Detector(small_cfg)
    tid = det.add_template("obj", train, None, train_mask)
    assert tid == 0

    scene = np.zeros((96, 128, 3), np.uint8)
    ox, oy = 64, 32
    scene[oy : oy + 48, ox : ox + 48] = obj

    matches = det.match(scene, None, threshold=60.0)
    assert matches, "object not found"
    m = matches[0]
    # Template origin is the feature bbox, offset from the paste position
    # by the same amount in train and test; compare against the shift.
    dx = ox - 40
    dy = oy - 24
    # Find where it was in the training image: feature bbox min.
    lvl0 = det.bank.templates["obj"][0][0]
    assert abs(m.x - dx) <= 8 + 48  # coarse sanity: inside pasted region
    assert m.similarity > 80.0
    # Position is reproduced within one coarse stride.
    # Recover expected origin: features were cropped to their bbox; the
    # bbox in the training image starts where the strongest edges are.
    # Just assert the detector localizes consistently: re-match the
    # training image itself and compare offsets.
    matches_train = det.match(train, None, threshold=60.0)
    assert matches_train
    mt = matches_train[0]
    assert abs((m.x - mt.x) - dx) <= 8
    assert abs((m.y - mt.y) - dy) <= 8
    assert mt.similarity > 95.0  # self-match is near-perfect


def test_match_empty_scene(small_cfg):
    obj, mask = _make_object()
    train = np.zeros((96, 128, 3), np.uint8)
    train[24:72, 40:88] = obj
    train_mask = np.zeros((96, 128), np.uint8)
    train_mask[24:72, 40:88] = mask
    det = Detector(small_cfg)
    det.add_template("obj", train, None, train_mask)
    scene = np.zeros((96, 128, 3), np.uint8)
    assert det.match(scene, None, threshold=60.0) == []


def test_bank_save_load(tmp_path, small_cfg):
    obj, mask = _make_object()
    train = np.zeros((96, 128, 3), np.uint8)
    train[24:72, 40:88] = obj
    train_mask = np.zeros((96, 128), np.uint8)
    train_mask[24:72, 40:88] = mask
    det = Detector(small_cfg)
    det.add_template("obj", train, None, train_mask, info={"radius": 600})
    path = str(tmp_path / "bank.npz")
    det.write_classes(path)
    det2 = Detector.read_classes(path, small_cfg)
    assert det2.num_templates("obj") == 1
    assert det2.bank.infos["obj"][0]["radius"] == 600
    t1 = det.bank.templates["obj"][0][0]
    t2 = det2.bank.templates["obj"][0][0]
    assert (t1.features == t2.features).all()
    assert (t1.width, t1.height) == (t2.width, t2.height)


@requires_reference
@pytest.mark.skipif(
    os.environ.get("SIXDPOSE_SLOW_TESTS") != "1",
    reason="set SIXDPOSE_SLOW_TESTS=1 (XLA CPU compile of VGA match is slow)",
)
def test_case1_golden():
    from sixdpose_tpu.data.inout import (
        load_depth,
        load_im,
        load_reference_template_bank,
    )

    cid, templates = load_reference_template_bank(
        "/root/reference/linemodLevelup/test/case1/127/06_template.yaml"
    )
    cfg = DetectorConfig(t_at_level=(5, 8), top_k=64)
    det = Detector(cfg)
    for tl in templates:
        det.bank.add_template_levels(cid, tl)
    rgb = load_im("/root/reference/linemodLevelup/test/case1/0000_rgb.png")
    dep = load_depth("/root/reference/linemodLevelup/test/case1/0000_dep.png")
    matches = det.match(rgb, dep, threshold=75.0)
    assert matches
    m = matches[0]
    # Golden: x=327, y=127 (test.cpp:76-88).  Exact on both the CPU and
    # TPU paths (verified round 2); bench.py gates every bench run on the
    # same equality through the production TPU dispatch.
    assert (m.x, m.y) == (327, 127)


def test_match_batch(small_cfg):
    import jax

    obj, mask = _make_object()
    train = np.zeros((96, 128, 3), np.uint8)
    train[24:72, 40:88] = obj
    train_mask = np.zeros((96, 128), np.uint8)
    train_mask[24:72, 40:88] = mask
    det = Detector(small_cfg)
    det.add_template("obj", train, None, train_mask)

    scenes = np.zeros((3, 96, 128, 3), np.uint8)
    positions = [(64, 32), (16, 40), (40, 8)]
    for i, (ox, oy) in enumerate(positions):
        scenes[i, oy : oy + 48, ox : ox + 48] = obj

    tid, x, y, score, keep = jax.device_get(
        det.match_batch_arrays(scenes, None, 60.0, "obj")
    )
    assert tid.shape == (3, small_cfg.top_k)
    for i in range(3):
        single = det.match(scenes[i], None, threshold=60.0)
        assert single
        assert score[i, 0] >= 0
        assert (int(x[i, 0]), int(y[i, 0])) == (single[0].x, single[0].y)
        assert abs(float(score[i, 0]) - single[0].similarity) < 1e-3


def test_colored_icp_recovers_inplane_rotation():
    """On a flat textured square, depth carries no signal about rotation
    around the plane normal; the colored-ICP term recovers it."""
    import jax.numpy as jnp

    from sixdpose_tpu.models.refine import (
        backproject, icp_point_to_plane, scene_chroma, scene_normals,
    )

    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], np.float32)
    h, w = 120, 160
    # Scene: flat plane at z=400mm with a red/green split along x=0.
    depth = np.full((h, w), 400, np.uint16)
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = (210, 40, 40)
    rgb[:, w // 2 :] = (40, 210, 40)

    # Model: grid of points on that plane (meters), colored consistently.
    xs, ys = np.meshgrid(np.linspace(-0.06, 0.06, 20), np.linspace(-0.05, 0.05, 16))
    pts = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 0.4)], 1).astype(np.float32)
    chroma = np.where(
        (pts[:, 0] < 0)[:, None],
        np.array([210, 40], np.float32) / 290.0,
        np.array([40, 210], np.float32) / 290.0,
    )
    valid = np.ones(len(pts), bool)

    # Init: rotated 8 degrees about the view axis through the plane center
    # (the colored term is annealed toward an endgame polish; very large
    # color-only errors are the verify stage's job, not ICP's).
    th = np.radians(8.0)
    Rz = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    c = np.array([0, 0, 0.4], np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3] = Rz
    T0[:3, 3] = c - Rz @ c

    sp = backproject(jnp.asarray(depth), jnp.asarray(K))
    sn = scene_normals(sp)

    def ang_err(T):
        R = np.asarray(T)[:3, :3]
        return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))

    T_geo, fit_g, _ = icp_point_to_plane(
        jnp.asarray(pts), jnp.asarray(valid), sp, sn, jnp.asarray(K),
        jnp.asarray(T0), 0.02, 20)
    T_col, fit_c, _ = icp_point_to_plane(
        jnp.asarray(pts), jnp.asarray(valid), sp, sn, jnp.asarray(K),
        jnp.asarray(T0), 0.02, 20,
        model_chroma=jnp.asarray(chroma),
        chroma_maps=scene_chroma(jnp.asarray(rgb)),
        color_weight=0.3, chroma_scale=0.05)
    e_geo, e_col = ang_err(T_geo), ang_err(T_col)
    assert e_col < 5.0, (e_geo, e_col)
    assert e_col < e_geo - 2.0, (e_geo, e_col)
