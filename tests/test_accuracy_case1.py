"""Gated wrapper for the case1 fixture accuracy driver.

Runs tools/accuracy_case1.py in-process: every checked-in reference
fixture (banks 63/127/600, multiscale scenario, pose/ ICP pair, pose-info
sweeps) must pass its golden.  Slow on CPU (VGA XLA compiles), hence
gated like the other case1 golden.
"""

import os
import sys

import pytest

from tests.conftest import requires_reference

pytestmark = [
    requires_reference,
    pytest.mark.skipif(
        os.environ.get("SIXDPOSE_SLOW_TESTS") != "1"
        and not os.environ.get("SIXDPOSE_TEST_TPU"),
        reason="set SIXDPOSE_SLOW_TESTS=1 (or SIXDPOSE_TEST_TPU=1 on TPU)",
    ),
]


def test_accuracy_case1_all_fixtures():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.accuracy_case1 import run

    report = run()
    assert report["ok"], {
        k: v for k, v in report["fixtures"].items() if not v["ok"]
    }
