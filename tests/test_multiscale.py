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
