#!/usr/bin/env python3
"""Data-parallel scaling-efficiency benchmark (SURVEY.md §6 north star:
>=80% scaling efficiency).

Runs the sharded detection pipeline over growing device meshes with the
per-device workload held constant (weak scaling: batch = frames_per_dev
x devices) and reports seconds/step + efficiency vs the smallest mesh.

Two timing modes:
  - default (CPU / virtual devices): wall-clock over block_until_ready,
    which is honest on host backends;
  - --chained (real TPU): K sharded steps chained inside ONE jit with a
    data dependency, slope over two chain lengths — the only methodology
    that survives the tunneled-device dispatch semantics (see bench.py).

--artifact PATH writes the round scaling record: the real-accelerator
rows (chained) plus a virtual-CPU 1/2/4/8 weak-scaling sweep run in a
subprocess (the TPU-tunnel sitecustomize registers its backend at
interpreter start, so CPU selection needs a fresh interpreter with the
config-API override).  When >=2 real-accelerator rows exist the >=80%
efficiency north star is asserted (exit 1 on failure); with one chip
only the base row is populated and the assertion arms itself for the
first multi-chip environment.

Examples:
  python tools/bench_scaling.py --artifact SCALING_r02.json
  python tools/bench_scaling.py --platform cpu --sizes 1 2 4 8
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_workload(args):
    import jax.numpy as jnp
    import numpy as np

    from sixdpose_tpu.config import ColorGradientConfig, DetectorConfig
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.models.templates import TemplateLevel

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

    return cfg, (kernels, nfeats, whs, feats, valids), args_for


def _measure_blocking(args, cfg, bank, args_for, sizes):
    """block_until_ready wall-clock (honest on CPU/host backends)."""
    import jax

    from sixdpose_tpu.parallel import sharded_detect
    from sixdpose_tpu.parallel.distributed import measure_scaling

    kernels, nfeats, whs, feats, valids = bank
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

    return measure_scaling(step, args_for, sizes)


def _measure_chained(args, cfg, bank, args_for, sizes):
    """Chained-in-program slope timing (honest on tunneled real TPUs).

    Each chain iteration perturbs the frame batch with a score-derived
    byte, so every step depends on the last and must really execute; the
    (k2 - k1) slope cancels dispatch/readback RTT."""
    import jax
    import jax.numpy as jnp

    from sixdpose_tpu.parallel import sharded_detect
    from sixdpose_tpu.parallel.distributed import make_mesh

    kernels, nfeats, whs, feats, valids = bank
    k1, k2 = 4, 20
    results, base = {}, None
    for size in sizes:
        mesh = make_mesh(data=size, devices=jax.devices()[:size])
        (rgb_b,) = args_for(mesh)

        def frame_body(r):
            tid, x, y, score, keep = sharded_detect(
                mesh, r, None, kernels, nfeats, whs, cfg, 50.0,
                feats=feats, valids=valids,
            )
            d = (score[0, 0] % 2.0).astype(jnp.uint8)
            return r ^ d

        # Chain length is a TRACED fori_loop bound: ONE compile serves
        # both chain lengths (remote compiles cost minutes per program).
        @jax.jit
        def chain(k, r):
            return jax.lax.fori_loop(0, k, lambda i, v: frame_body(v), r)

        for k in (k1, k2):
            out = chain(jnp.int32(k), rgb_b)
            _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))

        def run(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = chain(jnp.int32(k), rgb_b)
                _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
                best = min(best, time.time() - t0)
            return best

        dt = None
        for _ in range(5):
            dt = (run(k2) - run(k1)) / (k2 - k1)
            if dt > 0:
                break
        dt = max(dt, 1e-9)
        per_item = dt / size
        if base is None:
            base = per_item
        results[size] = {
            "s_per_step": dt,
            "efficiency": base / per_item if per_item > 0 else 0.0,
        }
    return results


def _rows(results, platform, method):
    """Rows for the artifact.  VIRTUAL (cpu) rows are correctness-only:
    host-simulated devices share cores, so a weak-scaling 'efficiency'
    there is meaningless (and can exceed 1.0 via cache effects) — emit no
    efficiency field at all rather than a fake number (VERDICT r02/r03)."""
    rows = []
    for size, r in sorted(results.items()):
        row = {
            "devices": size,
            "platform": platform,
            "method": method,
            "s_per_step": round(r["s_per_step"], 5),
        }
        if platform == "cpu":
            row["correctness_only"] = True
        else:
            row["efficiency"] = round(r["efficiency"], 3)
        rows.append(row)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--frames-per-dev", type=int, default=2)
    ap.add_argument("--hw", type=int, nargs=2, default=[128, 160])
    ap.add_argument("--templates", type=int, default=8)
    ap.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                    help="cpu: force the host backend with 8 virtual devices")
    ap.add_argument("--chained", action="store_true",
                    help="chained-in-program slope timing (real TPUs)")
    ap.add_argument("--artifact", default=None,
                    help="write the round scaling record (real + virtual)")
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.platform == "cpu":
        # The env var alone is not enough: the TPU-tunnel sitecustomize
        # registers its backend at interpreter start.
        jax.config.update("jax_platforms", "cpu")

    cfg, bank, args_for = _build_workload(args)
    sizes = [s for s in args.sizes if s <= jax.device_count()]
    on_tpu = jax.devices()[0].platform != "cpu"
    chained = args.chained or (args.artifact and on_tpu)
    measure = _measure_chained if chained else _measure_blocking
    results = measure(args, cfg, bank, args_for, sizes)
    platform = jax.devices()[0].platform
    method = "chained_slope" if chained else "block_until_ready"
    rows = _rows(results, platform, method)
    for row in rows:
        print(json.dumps(row))

    if not args.artifact:
        return 0

    # Virtual-CPU sweep in a fresh interpreter (backend choice is final
    # per process).
    virt = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--platform", "cpu",
         "--sizes", "1", "2", "4", "8"],
        capture_output=True, text=True, check=True,
    )
    virt_rows = [json.loads(l) for l in virt.stdout.splitlines()
                 if l.startswith("{")]

    record = {
        "workload": {
            "hw": args.hw, "templates": args.templates,
            "frames_per_dev": args.frames_per_dev,
        },
        "real": rows,
        "virtual_cpu": virt_rows,
        "note": (
            "real rows use chained-in-program slope timing (tunnel-proof); "
            "efficiency is weak-scaling vs the smallest mesh and is only "
            "reported for REAL accelerator rows — virtual-CPU rows are "
            "correctness-only (host-simulated devices share cores). The "
            ">=80% north-star assertion arms when >=2 real rows exist."
        ),
    }
    ok = True
    if len(rows) >= 2 and all("efficiency" in r for r in rows[1:]):
        worst = min(r["efficiency"] for r in rows[1:])
        record["efficiency_assertion"] = {"threshold": 0.8, "worst": worst}
        ok = worst >= 0.8
    record["ok"] = ok
    with open(args.artifact, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.artifact} (ok={ok})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
