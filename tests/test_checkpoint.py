"""Orbax sharded checkpointing of the template bank."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.models.templates import TemplateBank, TemplateLevel


def _bank(cfg, n=6, seed=0):
    rng = np.random.default_rng(seed)
    bank = TemplateBank(cfg)
    for i in range(n):
        levels = []
        for l, size in ((0, 40), (1, 20)):
            f = 10 + i
            feats = np.stack(
                [rng.integers(0, size, f), rng.integers(0, size, f),
                 rng.integers(0, 8, f)], 1).astype(np.int64)
            levels.append(TemplateLevel(feats, size, size, l))
        bank.add_template_levels(
            "obj", levels, {"cam_R_m2c": np.eye(3).ravel(), "view": i}
        )
    return bank


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    cfg = DetectorConfig(use_depth=False)
    bank = _bank(cfg)
    bank.save_orbax(str(tmp_path / "ckpt"))
    back = TemplateBank.load_orbax(str(tmp_path / "ckpt"), cfg)
    assert back.class_ids() == ["obj"]
    assert back.num_templates("obj") == 6
    for a, b in zip(bank.templates["obj"], back.templates["obj"]):
        for la, lb in zip(a, b):
            assert (la.features == lb.features).all()
            assert (la.width, la.height, la.pyramid_level) == (
                lb.width, lb.height, lb.pyramid_level)
    assert back.infos["obj"][3]["view"] == 3


def test_orbax_sharded_restore(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = DetectorConfig(use_depth=False)
    bank = _bank(cfg, n=8)
    bank.save_orbax(str(tmp_path / "ckpt"))
    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(devs.reshape(8), ("template",))
    sh = NamedSharding(mesh, P("template"))
    back = TemplateBank.load_orbax(str(tmp_path / "ckpt"), cfg, sharding=sh)
    assert back.num_templates("obj") == 8
    # And the restored bank still drives a match.
    det = Detector(cfg)
    det.bank = back
    assert det.num_templates("obj") == 8
