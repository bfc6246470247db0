"""Single-dispatch multi-class matching (models/multiclass.py) must agree
with the per-class matcher (models/detector.py) bit-for-bit."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.models.multiclass import MultiClassMatcher


def _shape(kind: str, s: int = 48):
    o = np.zeros((s, s, 3), np.uint8)
    yy, xx = np.mgrid[0:s, 0:s]
    if kind == "disc":
        m = ((yy - s / 2) ** 2 + (xx - s / 2) ** 2) < (s / 2 - 4) ** 2
        o[m] = (40, 200, 230)
        o[m & (xx > s / 2)] = (230, 80, 40)
    elif kind == "square":
        m = (yy > 6) & (yy < s - 6) & (xx > 6) & (xx < s - 6)
        o[m] = (220, 220, 60)
        o[m & (yy > s / 2)] = (60, 120, 220)
    else:  # triangle
        m = (yy > 6) & (xx > 6) & (xx < s - 6) & (yy < xx)
        o[m] = (90, 230, 90)
        o[m & (xx > s / 2)] = (200, 60, 200)
    return o, (m * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def three_class_det():
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        use_depth=False,
        top_k=16,
        color=ColorGradientConfig(num_features=24),
    )
    det = Detector(cfg)
    for kind in ("disc", "square", "triangle"):
        o, m = _shape(kind)
        train = np.zeros((96, 128, 3), np.uint8)
        train[24:72, 40:88] = o
        tmask = np.zeros((96, 128), np.uint8)
        tmask[24:72, 40:88] = m
        assert det.add_template(kind, train, None, tmask) == 0
    return det


def _scene():
    scene = np.zeros((96, 128, 3), np.uint8)
    a, _ = _shape("disc")
    b, _ = _shape("square")
    scene[4:52, 4:52] = a
    scene[40:88, 72:120] = np.where(b > 0, b, scene[40:88, 72:120])
    return scene


def test_multiclass_matches_per_class(three_class_det):
    det = three_class_det
    scene = _scene()
    per_class = det.match(scene, None, threshold=70.0)
    mc = MultiClassMatcher(det)
    fused = mc.match(scene, None, threshold=70.0)

    key = lambda m: (m.class_id, m.template_id, m.x, m.y, round(m.similarity, 3))
    assert sorted(map(key, fused)) == sorted(map(key, per_class))
    # Both present classes found, absent class not hallucinated above thr.
    found = {m.class_id for m in fused}
    assert {"disc", "square"} <= found


def test_multiclass_empty_scene(three_class_det):
    mc = MultiClassMatcher(three_class_det)
    assert mc.match(np.zeros((96, 128, 3), np.uint8), None, 70.0) == []


def test_multiclass_single_class_consistency(three_class_det):
    """A one-class MultiClassMatcher equals the plain matcher."""
    det = three_class_det
    scene = _scene()
    mc = MultiClassMatcher(det, class_ids=["disc"])
    fused = mc.match(scene, None, threshold=70.0)
    plain = det.match(scene, None, threshold=70.0, class_ids=["disc"])
    key = lambda m: (m.template_id, m.x, m.y, round(m.similarity, 3))
    assert sorted(map(key, fused)) == sorted(map(key, plain))
