"""Native C++ host kernels vs their Python references."""

import numpy as np
import pytest

from sixdpose_tpu import native_bridge


pytestmark = pytest.mark.skipif(
    not native_bridge.available(), reason="native library not built"
)


def test_select_scattered_matches_python(rng):
    from sixdpose_tpu.models import templates as T

    n = 500
    xs = rng.integers(0, 200, n)
    ys = rng.integers(0, 200, n)
    scores = np.sort(rng.random(n))[::-1].copy()
    native = native_bridge.select_scattered(xs, ys, 30, 12.0)
    # Pure python path (bypass the native shortcut).
    import unittest.mock as mock

    with mock.patch.object(native_bridge, "available", return_value=False):
        python = T.select_scattered_features(xs, ys, scores, 30, 12.0)
    assert native is not None and python is not None
    assert (native == python).all()


def test_floyd_steinberg_matches_python(rng):
    from sixdpose_tpu.seg import dasp

    density = rng.random((40, 50)) * 0.1
    native = native_bridge.floyd_steinberg(density)
    import unittest.mock as mock

    with mock.patch.object(native_bridge, "available", return_value=False):
        python = dasp.floyd_steinberg_seeds(density)
    assert native is not None
    assert len(native) == len(python)
    assert np.allclose(np.sort(native, axis=0), np.sort(python, axis=0))


def test_nms_boxes():
    boxes = np.array(
        [
            [0, 0, 10, 10],
            [1, 1, 10, 10],    # overlaps the first
            [50, 50, 10, 10],  # far away
        ],
        np.float32,
    )
    valid = np.array([1, 1, 1], np.uint8)
    keep = native_bridge.nms_boxes(boxes, valid, 0.5)
    assert keep.tolist() == [True, False, True]
