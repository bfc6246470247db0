"""Test configuration: run JAX on CPU with 8 virtual devices.

Real TPU tests are exercised by bench.py / the driver; unit tests simulate
multi-chip sharding on host CPU (SURVEY.md §4: CPU-simulated multi-device
tests stand in for pod-slice tests).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Select CPU via the config API: a plain JAX_PLATFORMS env var is not enough
# here because the TPU-tunnel sitecustomize registers its backend at
# interpreter start.  SIXDPOSE_TEST_TPU=1 opts into running the suite on
# the real accelerator (e.g. the Pallas kernel equivalence tests).
if not os.environ.get("SIXDPOSE_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference fixture tree not mounted",
)


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` is ``fast``: ``pytest -m fast`` is
    the quick gate (the full suite's XLA CPU compiles exceed 10 minutes
    on small hosts; an unrunnable default gate stops being run)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
