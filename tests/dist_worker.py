"""Worker for the multi-process (multi-host-style) smoke test.

Run by tests/test_distributed.py in two subprocesses: initializes
jax.distributed through the framework's own glue, builds a global mesh
spanning both processes' virtual CPU devices, and runs the sharded
detection pipeline across them (SURVEY.md §7 step 6: multi-host via
jax.distributed; CPU-simulated processes stand in for hosts).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    from sixdpose_tpu.parallel.distributed import initialize, global_mesh

    initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.process_count() == nproc

    import jax.numpy as jnp

    from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.parallel import pad_templates, sharded_detect
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh(template=2)  # data axis = remaining devices
    n_data = mesh.shape["data"]

    cfg = DetectorConfig(
        t_at_level=(4, 8), use_depth=False, top_k=8,
        color=ColorGradientConfig(num_features=16),
    )
    det = Detector(cfg)
    rng = np.random.default_rng(0)
    obj = np.zeros((32, 32, 3), np.uint8)
    yy, xx = np.mgrid[0:32, 0:32]
    m = ((yy - 16) ** 2 + (xx - 16) ** 2) < 144
    obj[m] = (200, 80, 40)
    obj[m & (xx > 16)] = (40, 200, 80)
    train = np.zeros((64, 96, 3), np.uint8)
    train[16:48, 32:64] = obj
    mask = np.zeros((64, 96), np.uint8)
    mask[16:48, 32:64] = m.astype(np.uint8) * 255
    assert det.add_template("obj", train, None, mask) == 0

    kernels, nfeats, whs = det.device_bank("obj")
    kernels = pad_templates(tuple(np.asarray(k) for k in kernels), 2)
    whs_p = pad_templates(tuple(np.asarray(w) for w in whs), 2)
    nfeats_p = []
    for nf in nfeats:
        nf = np.asarray(nf)
        pad = (-len(nf)) % 2
        nfeats_p.append(np.concatenate([nf, np.ones(pad, nf.dtype)]))

    b = 2 * n_data
    scenes = np.zeros((b, 64, 96, 3), np.uint8)
    for i in range(b):
        ox, oy = 8 + 4 * (i % 8), 24 - 2 * (i % 8)
        scenes[i, oy : oy + 32, ox : ox + 32] = obj

    # Global arrays: every process contributes its slice of the batch.
    def put(a, spec):
        return jax.make_array_from_callback(
            a.shape,
            NamedSharding(mesh, spec),
            lambda idx: a[idx],
        )

    rgb_g = put(scenes, P("data"))
    kern_g = tuple(put(np.asarray(k), P("template")) for k in kernels)
    nf_g = tuple(put(np.asarray(n), P("template")) for n in nfeats_p)
    wh_g = tuple(put(np.asarray(w), P("template")) for w in whs_p)

    tid, x, y, score, keep = sharded_detect(
        mesh, rgb_g, None, kern_g, nf_g, wh_g, cfg, 60.0
    )
    # Every process holds its data shard; check local shards found the
    # object where it was pasted.
    local = [np.asarray(s.data) for s in score.addressable_shards]
    xs_l = [np.asarray(s.data) for s in x.addressable_shards]
    found = 0
    for sc in local:
        found += int((sc >= 0).any(axis=-1).sum())
    assert found > 0, "no local matches"
    print(f"proc {pid}: sharded_detect over {jax.device_count()} devices, "
          f"{found} local frames matched OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
