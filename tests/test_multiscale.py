"""Multi-scale matching: scale proposal + scaled-kernel detection."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.models.multiscale import MultiScaleDetector
from sixdpose_tpu.ops.scale_proposal import propose_depths


def test_propose_depths_peaks():
    depth = np.zeros((100, 100), np.uint16)
    depth[:50] = 800
    depth[50:80] = 1200
    depth[80:] = 30  # below range -> ignored
    depths, counts = propose_depths(jnp.asarray(depth), num_scales=3)
    depths = np.asarray(depths)
    counts = np.asarray(counts)
    assert abs(depths[0] - 850) <= 50  # biggest peak ~800 bin center
    assert abs(depths[1] - 1250) <= 50
    assert counts[2] == 0 and depths[2] == 0  # only two valid peaks


def test_propose_depths_min_pixels():
    depth = np.zeros((100, 100), np.uint16)
    depth[0, :50] = 900  # only 50 px, below min_pixels=200
    depths, counts = propose_depths(jnp.asarray(depth), num_scales=2)
    assert np.asarray(counts)[0] == 0


def _object(h=60, w=60):
    obj = np.zeros((h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    m = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 2 - 4) ** 2
    obj[m] = (50, 160, 220)
    obj[m & (xx > w / 2)] = (220, 100, 30)
    obj[m & (yy > h / 2)] = (120, 220, 60)
    return obj, (m * 255).astype(np.uint8)


@pytest.mark.slow
def test_multiscale_finds_rescaled_object():
    from PIL import Image

    obj, mask = _object()
    train = np.zeros((128, 160, 3), np.uint8)
    train[30:90, 50:110] = obj
    tmask = np.zeros((128, 160), np.uint8)
    tmask[30:90, 50:110] = mask

    cfg = DetectorConfig(
        t_at_level=(4, 8),
        use_depth=False,
        use_color=True,
        top_k=32,
        color=ColorGradientConfig(num_features=32),
    )
    det = Detector(cfg)
    assert det.add_template("obj", train, None, tmask) == 0

    # Scene: object shrunk to 60% (as if at 1000 mm instead of 600 mm).
    small = np.asarray(
        Image.fromarray(obj).resize((36, 36), Image.BILINEAR)
    )
    scene = np.zeros((128, 160, 3), np.uint8)
    scene[40:76, 70:106] = small
    depth = np.full((128, 160), 1000, np.uint16)

    ms = MultiScaleDetector(det, train_depth=600.0, num_scales=3)
    matches = ms.match(scene, depth, threshold=55.0, class_id="obj")
    assert matches, "rescaled object not found"
    m = matches[0]
    assert abs(m.depth_mm - 1050) <= 60  # histogram bin center near 1000
    assert abs(m.scale - 0.6) < 0.08
    # The single-scale detector at scale 1.0 must do worse on this scene.
    single = det.match(scene, None, threshold=55.0)
    if single:
        assert m.similarity > single[0].similarity


@pytest.mark.slow
def test_multiscale_multiclass_one_dispatch_parity():
    """The one-dispatch multiscale x multiclass program must reproduce the
    per-class MultiScaleDetector results (same winning template, position,
    score, scale per class) — the reference's one-call contract
    (linemodLevelup.cpp:1753-1769) extended with the scale axis."""
    from PIL import Image

    from sixdpose_tpu.models.multiscale import MultiScaleMultiClass

    obj_a, mask_a = _object()
    # Second object: a square with distinct gradients.
    obj_b = np.zeros((60, 60, 3), np.uint8)
    obj_b[10:50, 10:50] = (230, 230, 40)
    obj_b[20:40, 20:40] = (40, 60, 200)
    mask_b = np.zeros((60, 60), np.uint8)
    mask_b[10:50, 10:50] = 255

    cfg = DetectorConfig(
        t_at_level=(4, 8),
        use_depth=False,
        use_color=True,
        top_k=16,
        color=ColorGradientConfig(num_features=32),
    )
    det = Detector(cfg)
    for cid, (obj, mask) in (("a", (obj_a, mask_a)), ("b", (obj_b, mask_b))):
        train = np.zeros((128, 160, 3), np.uint8)
        train[30:90, 50:110] = obj
        tmask = np.zeros((128, 160), np.uint8)
        tmask[30:90, 50:110] = mask
        assert det.add_template(cid, train, None, tmask) == 0

    # Scene: both objects at 60% scale, different positions.
    scene = np.zeros((128, 160, 3), np.uint8)
    for obj, (y0, x0) in ((obj_a, (40, 20)), (obj_b, (60, 100))):
        small = np.asarray(
            Image.fromarray(obj).resize((36, 36), Image.BILINEAR)
        )
        scene[y0 : y0 + 36, x0 : x0 + 36] = np.where(
            small.sum(-1, keepdims=True) > 0, small,
            scene[y0 : y0 + 36, x0 : x0 + 36],
        )
    depth = np.full((128, 160), 1000, np.uint16)

    mc = MultiScaleMultiClass(det, train_depth=600.0, num_scales=3)
    fused = mc.match(scene, depth, threshold=50.0)
    assert fused, "one-dispatch multiclass multiscale found nothing"

    ref = []
    for cid in ("a", "b"):
        ms = MultiScaleDetector(det, train_depth=600.0, num_scales=3)
        ref.extend(ms.match(scene, depth, threshold=50.0, class_id=cid))

    def best_by_class(matches):
        out = {}
        for m in matches:
            if m.class_id not in out:
                out[m.class_id] = m
        return out

    fb, rb = best_by_class(fused), best_by_class(ref)
    assert set(fb) == set(rb), (set(fb), set(rb))
    for cid in rb:
        f, r = fb[cid], rb[cid]
        assert f.template_id == r.template_id, (cid, f, r)
        assert (f.x, f.y) == (r.x, r.y), (cid, f, r)
        assert abs(f.similarity - r.similarity) < 1e-3, (cid, f, r)
        assert abs(f.scale - r.scale) < 1e-6, (cid, f, r)
