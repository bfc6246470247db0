"""TPU-only golden tests through the PRODUCTION dispatch paths.

The default (CPU) suite never executes the exact code the bench measures:
``topk_candidates`` switches to ``lax.approx_max_k`` on TPU above 128K
elements and ``similarity_local_sparse_auto`` dispatches to the Pallas DMA
kernel only on TPU (ops/topk_nms.py, ops/similarity.py).  These tests run
the real case1 workloads through those paths on the real chip and assert
the golden detections (reference linemodLevelup/test.cpp:76-88), so a
regression in either production path cannot ship silently.

Run with SIXDPOSE_TEST_TPU=1 on a machine with a TPU attached; bench.py
additionally gates every bench run on the single-scale golden.
"""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = pytest.mark.skipif(
    not os.environ.get("SIXDPOSE_TEST_TPU"),
    reason="set SIXDPOSE_TEST_TPU=1 on a TPU host",
)

CASE1 = "/root/reference/linemodLevelup/test/case1"


def _load(bank: str):
    from sixdpose_tpu.data.inout import (
        load_depth,
        load_im,
        load_reference_template_bank,
    )

    cid, templates = load_reference_template_bank(
        os.path.join(CASE1, bank, "06_template.yaml")
    )
    rgb = load_im(os.path.join(CASE1, "0000_rgb.png"))
    dep = load_depth(os.path.join(CASE1, "0000_dep.png"))
    return cid, templates, rgb, dep


@requires_reference
def test_case1_golden_tpu_single_scale():
    """Single-scale 127 bank through the production path (Pallas local
    refinement on-chip): golden position must be EXACT."""
    from sixdpose_tpu.config import DetectorConfig
    from sixdpose_tpu.models.detector import Detector

    cid, templates, rgb, dep = _load("127")
    cfg = DetectorConfig(t_at_level=(5, 8), top_k=64)
    det = Detector(cfg)
    for tl in templates:
        det.bank.add_template_levels(cid, tl)
    matches = det.match(rgb, dep, threshold=75.0)
    assert matches
    assert (matches[0].x, matches[0].y) == (327, 127)


@requires_reference
def test_case1_golden_tpu_multiscale_approx_topk():
    """600 mm bank x 1050 mm scene through the multiscale path.  The
    coarse score tensor (5 proposals x 337 templates x 30 x 40) exceeds
    the 128K-element threshold, so this exercises the approx_max_k branch
    AND the Pallas per-candidate refinement on the real chip."""
    from sixdpose_tpu.config import DetectorConfig
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.models.multiscale import MultiScaleDetector

    cid, templates, rgb, dep = _load("600")
    assert len(templates) == 337
    cfg = DetectorConfig(t_at_level=(5, 8), top_k=128)
    det = Detector(cfg)
    for tl in templates:
        det.bank.add_template_levels(cid, tl)
    ms = MultiScaleDetector(det, train_depth=600.0, num_scales=5)
    matches = ms.match(rgb, dep, threshold=70.0, class_id=cid)
    assert matches
    m = matches[0]
    # Golden recorded round 2 (TPU): x=332, y=127, depth bin 1050,
    # scale 600/1050.  approx_max_k recall 0.99 can in principle perturb
    # the candidate pool, hence the small positional tolerance; the depth
    # bin and scale are exact.
    assert abs(m.x - 332) <= 4 and abs(m.y - 127) <= 4
    assert m.depth_mm == 1050.0
    assert abs(m.scale - 600.0 / 1050.0) < 1e-3


def test_topk_exact_flag_parity():
    """topk_candidates(exact=True) must bypass approx_max_k and agree with
    the numpy top-k on a >128K-element input (the reproducible-eval
    escape hatch)."""
    import jax.numpy as jnp

    from sixdpose_tpu.ops.topk_nms import topk_candidates

    rng = np.random.default_rng(7)
    scores = rng.random((40, 80, 80), np.float32)
    tid, y, x, s = topk_candidates(jnp.asarray(scores), 0.5, 16, exact=True)
    s = np.asarray(s)
    flat = np.sort(scores.reshape(-1))[::-1]
    np.testing.assert_allclose(s, flat[:16], rtol=1e-6)
