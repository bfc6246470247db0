#!/usr/bin/env python3
"""Data-parallel scaling-efficiency benchmark (SURVEY.md §6 north star:
>=80% scaling efficiency).

Runs the sharded detection pipeline over growing device meshes with the
per-device workload held constant (weak scaling: batch = frames_per_dev
x devices) and reports seconds/step + efficiency vs the smallest mesh.

On a CPU host this uses virtual devices (--xla_force_host_platform_
device_count); on a TPU slice it uses the real chips.  Example:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_scaling.py --sizes 1 2 4 8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--frames-per-dev", type=int, default=2)
    ap.add_argument("--hw", type=int, nargs=2, default=[128, 160])
    ap.add_argument("--templates", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.models.templates import TemplateLevel
    from sixdpose_tpu.parallel import sharded_detect
    from sixdpose_tpu.parallel.distributed import measure_scaling

    h, w = args.hw
    cfg = DetectorConfig(
        t_at_level=(4, 8), use_depth=False, top_k=16,
        color=ColorGradientConfig(num_features=24),
    )
    det = Detector(cfg)
    rng = np.random.default_rng(0)
    for _ in range(args.templates):
        levels = []
        for l, size in ((0, 32), (1, 16)):
            f = 24 >> l
            feats = np.stack(
                [rng.integers(0, size, f), rng.integers(0, size, f),
                 rng.integers(0, 8, f)], 1)
            levels.append(TemplateLevel(feats, size, size, l))
        det.bank.add_template_levels("obj", levels)
    kernels, nfeats, whs = det.device_bank("obj")
    feats, valids = det._device_feats["obj"]

    def args_for(mesh):
        b = args.frames_per_dev * mesh.shape["data"]
        rgb = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
        return (jnp.asarray(rgb),)

    compiled = {}

    def step(mesh, rgb_b):
        if mesh not in compiled:
            def f(rgb):
                return sharded_detect(
                    mesh, rgb, None, kernels, nfeats, whs, cfg, 50.0,
                    feats=feats, valids=valids,
                )
            compiled[mesh] = jax.jit(f)
        out = compiled[mesh](rgb_b)
        jax.block_until_ready(out)
        return out

    sizes = [s for s in args.sizes if s <= jax.device_count()]
    results = measure_scaling(step, args_for, sizes)
    for size, r in results.items():
        print(json.dumps({
            "devices": size,
            "s_per_step": round(r["s_per_step"], 4),
            "efficiency": round(r["efficiency"], 3),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
