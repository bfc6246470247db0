"""Render-based training: render views -> template bank -> detect a render."""

import math

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.config import ColorGradientConfig, DepthNormalConfig, DetectorConfig
from sixdpose_tpu.geometry.render import render
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.models.train import render_train_templates, template_pose


def _model():
    """A colored box with unequal sides (pose-discriminative)."""
    half = np.array([30.0, 20.0, 12.0])
    pts = np.array(
        [
            [sx * half[0], sy * half[1], sz * half[2]]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )
    quads = [
        (0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5),
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    colors = np.stack(
        [
            100 + 155 * (pts[:, 0] > 0),
            100 + 155 * (pts[:, 1] > 0),
            100 + 155 * (pts[:, 2] > 0),
        ],
        1,
    ).astype(np.uint8)
    return {"pts": pts, "faces": np.array(faces), "colors": colors}


K = np.array([[160.0, 0, 80], [0, 160.0, 60], [0, 0, 1]])


@pytest.mark.slow
def test_render_train_and_detect():
    model = _model()
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        top_k=16,
        color=ColorGradientConfig(num_features=20, strong_threshold=30.0),
        depth=DepthNormalConfig(num_features=16, extract_threshold=1, focal=160.0),
    )
    det = Detector(cfg)
    stats = render_train_templates(
        det,
        "box",
        model,
        K,
        radii=[400.0],
        min_n_views=12,
        im_size=(160, 120),
        tilt_range=(0.0, 0.1),
        tilt_step=1.0,
    )
    assert stats["added"] >= 4, stats
    assert det.num_templates("box") == stats["added"]

    # Per-template pose info is recorded.
    Ki, R0, t0 = template_pose(det, "box", 0)
    assert Ki.shape == (3, 3) and R0.shape == (3, 3) and t0.shape == (3, 1)

    # Detect template 0's own render.
    rgb, depth = render(model, (160, 120), K, R0, t0, mode="rgb+depth")
    matches = det.match(
        np.asarray(rgb), np.asarray(depth).astype(np.uint16), threshold=70.0
    )
    assert matches, "training view not re-detected"
    # The best match should be the same view (or a very close one).
    assert matches[0].similarity > 85.0


@pytest.mark.slow
def test_render_train_textured_model():
    """A texture-mapped model (no meaningful vertex colors) must train an
    RGB-modality bank from textured renders and re-detect its own view
    (VERDICT item 8 / reference renderer.py:316-321 texture path)."""
    from sixdpose_tpu.benchmark import make_models

    model = make_models()["texbox"]
    K = np.array([[160.0, 0, 80], [0, 160.0, 60], [0, 0, 1]])
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        use_depth=False,
        top_k=16,
        color=ColorGradientConfig(num_features=24, strong_threshold=30.0),
    )
    det = Detector(cfg)
    stats = render_train_templates(
        det, "texbox", model, K,
        radii=[400.0], min_n_views=8, im_size=(160, 120),
        tilt_range=(0.0, 0.1), tilt_step=1.0,
    )
    assert stats["added"] >= 4, stats

    Ki, R0, t0 = template_pose(det, "texbox", 0)
    rgb, depth = render(
        model, (160, 120), K, R0, t0, mode="rgb+depth",
        texture=model["texture"],
    )
    # The checker texture must actually be visible in the render (not a
    # flat vertex-color fallback).
    rgb_np = np.asarray(rgb)
    on = np.asarray(depth) > 0
    assert rgb_np[on].std(axis=0).max() > 30.0
    matches = det.match(rgb_np, None, threshold=70.0)
    assert matches, "textured training view not re-detected"
    assert matches[0].similarity > 85.0
