"""Measure the multi-object multiscale sweep on one chip (VERDICT r01 #4).

Round 1's prebuilt per-depth-bin weight tables cost ~0.8 GB int8 per
337-template class — 15 LINEMOD-scale objects >> HBM.  Round 2 put the
tables under an explicit HBM budget with LRU eviction and a scatter-build
fallback (models/multiscale.py).  This tool proves the claim: it clones
the case1 600 mm bank (337 templates, the realest LINEMOD-scale bank we
can ship) into N classes, sweeps all of them multiscale on one frame
stream, and reports per-class ms/frame for both regimes (prebuilt table
vs on-device scatter build) plus peak table memory — without OOM.

Timing uses the chained-dispatch slope methodology (see bench.py): plain
async loops are not trustworthy on tunneled devices.

Usage: python tools/bench_multiscale_multiclass.py [--classes 15]
                [--out MULTISCALE_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE1 = "/root/reference/linemodLevelup/test/case1"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--classes", type=int, default=15)
    ap.add_argument("--budget-gb", type=float, default=2.0)
    ap.add_argument(
        "--fused-budget-gb", type=float, default=None,
        help="HBM budget for the fused program's global per-bin table "
        "(default: --budget-gb). The 15-class table is ~12 GB; passing "
        "~13 prebuilds it (stored as 16 per-bin buffers).",
    )
    ap.add_argument(
        "--fused-topk", type=int, default=None,
        help="per-class top_k for the one-dispatch program "
        "(default: the detector config's top_k)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sixdpose_tpu.config import DetectorConfig
    from sixdpose_tpu.data.inout import (
        load_depth,
        load_im,
        load_reference_template_bank,
    )
    from sixdpose_tpu.models.detector import Detector
    from sixdpose_tpu.models.multiscale import (
        MultiScaleDetector,
        multiscale_detect_core,
    )

    cid, templates = load_reference_template_bank(
        os.path.join(CASE1, "600", "06_template.yaml")
    )
    rgb = jnp.asarray(load_im(os.path.join(CASE1, "0000_rgb.png")))
    dep = jnp.asarray(load_depth(os.path.join(CASE1, "0000_dep.png")))

    cfg = DetectorConfig(t_at_level=(5, 8), top_k=128)
    det = Detector(cfg)
    class_ids = [f"obj{i:02d}" for i in range(args.classes)]
    for c in class_ids:
        for tl in templates:
            det.bank.add_template_levels(c, tl)

    ms = MultiScaleDetector(
        det, train_depth=600.0, num_scales=5,
        table_budget_bytes=int(args.budget_gb * (1 << 30)),
    )

    # Build all class arrays up front; count how many got prebuilt tables.
    built = {c: ms._feature_arrays(c) for c in class_ids}
    with_tables = [c for c in class_ids if built[c][5] is not None]
    print(
        f"classes: {len(class_ids)}; prebuilt weight tables: "
        f"{len(with_tables)} (budget {args.budget_gb} GB, "
        f"{sum(ms._table_bytes.values()) / (1 << 30):.2f} GB used)"
    )

    def sweep_frame(r, class_list, arrs):
        """All classes matched multiscale on one frame; returns a scalar
        data dependency."""
        acc = jnp.float32(0.0)
        for c in class_list:
            feats, valids, whs, bs, w_bins, nf_bins = arrs[c]
            kdims = built[c][4]  # static (closed over, not traced)
            _tid, _x, _y, score, _keep, _d, _s = multiscale_detect_core(
                r, dep, feats, valids, whs, bs, cfg, 70.0, 5, kdims,
                w_bins=w_bins, nf_bins=nf_bins,
            )
            acc = acc + score[0]
        return acc

    def chain(k, class_list):
        # Big arrays go in as ARGUMENTS: closure-captured device arrays
        # are baked into the HLO as literals, and 15 prebuilt weight
        # tables (~1.5 GB) blow past the remote-compile body limit.
        arrs_in = {
            c: tuple(built[c][i] for i in (0, 1, 2, 3, 5, 6))
            for c in class_list
        }

        @jax.jit
        def prog(r, arrs):
            def body(i, carry):
                r, acc = carry
                a = sweep_frame(r, class_list, arrs)
                d = (jnp.abs(a) % 2.0).astype(jnp.uint8)
                return (r ^ d, acc + a)
            r_out, acc = jax.lax.fori_loop(0, k, body, (r, jnp.float32(0)))
            return acc

        return lambda r: prog(r, arrs_in)

    def slope(class_list, k1, k2):
        p1, p2 = chain(k1, class_list), chain(k2, class_list)
        for p in (p1, p2):
            _ = float(p(rgb))
        best = None
        for _ in range(5):
            t1s, t2s = [], []
            for _ in range(3):
                t0 = time.time(); _ = float(p1(rgb)); t1s.append(time.time() - t0)
                t0 = time.time(); _ = float(p2(rgb)); t2s.append(time.time() - t0)
            dt = (min(t2s) - min(t1s)) / (k2 - k1)
            if dt > 0:
                return dt
            best = dt
        return max(best, 1e-9)

    report = {"classes": len(class_ids), "budget_gb": args.budget_gb,
              "prebuilt_tables": len(with_tables)}

    # Per-class cost in each regime.
    if with_tables:
        dt = slope([with_tables[0]], 2, 10)
        report["ms_per_frame_per_class_table"] = round(dt * 1000, 2)
        print(f"one class, prebuilt table: {dt*1000:.2f} ms/frame")
    no_table = [c for c in class_ids if built[c][5] is None]
    if no_table:
        dt = slope([no_table[0]], 2, 10)
        report["ms_per_frame_per_class_scatter"] = round(dt * 1000, 2)
        print(f"one class, scatter build:  {dt*1000:.2f} ms/frame")

    # The full sweep: all classes, one chained program.
    dt = slope(class_ids, 1, 5)
    report["ms_per_frame_all_classes"] = round(dt * 1000, 2)
    print(
        f"full {len(class_ids)}-class multiscale sweep: "
        f"{dt*1000:.2f} ms/frame ({1.0/dt:.1f} fps)"
    )

    # The ONE-dispatch multiscale x multiclass program (round 4,
    # models/multiscale.py MultiScaleMultiClass): the whole
    # (class x scale x template) sweep as one coarse matmul stack with
    # per-class selection + NMS inside the dispatch.
    from sixdpose_tpu.models.multiscale import (
        MultiScaleMultiClass, multiscale_multiclass_core,
    )

    # Release the classic sweep's per-class tables before building the
    # fused global one: both resident would double-count ~11 GB at 15
    # classes.
    del built, ms
    import gc

    gc.collect()
    fused_budget = args.fused_budget_gb
    if fused_budget is None:
        fused_budget = args.budget_gb
    mc = MultiScaleMultiClass(
        det, train_depth=600.0, num_scales=5,
        table_budget_bytes=int(fused_budget * (1 << 30)),
    )
    report["fused_global_table"] = mc.w_bins is not None
    report["fused_table_gb"] = round(mc.table_bytes / (1 << 30), 3)

    # Per-class candidate budget for the fused program.  The v5 Pallas
    # local-refine kernel streams its per-candidate tables through
    # blocked SMEM operands (O(F) SMEM), so C * top_k is unbounded —
    # rounds 2-4 had to clamp this to ~1024 total candidates because
    # v1-v4 scalar-prefetch the whole table into SMEM.  Full per-class
    # top_k makes this row apples-to-apples with the classic per-class
    # sweep above.
    fused_topk = args.fused_topk or cfg.top_k

    def fused_body(r, w_bins, nf_bins):
        tid, x, y, score, keep, d, sc = multiscale_multiclass_core(
            r, dep, mc.feats, mc.valids, mc.whs, mc.pad_map, mc.cls_kb,
            mc.bin_scales, cfg, 70.0, 5, mc.kdims, fused_topk,
            w_bins=w_bins, nf_bins=nf_bins, pad_kb=mc.pad_kb,
        )
        return score[0, 0]

    @jax.jit
    def fused_chain(k, r, w_bins, nf_bins):
        # The ~12 GB table tuple must be an ARGUMENT (closure-captured
        # device arrays bake into the HLO as literals).
        def body(i, carry):
            r_, acc = carry
            a = fused_body(r_, w_bins, nf_bins)
            dd = (jnp.abs(a) % 2.0).astype(jnp.uint8)
            return (r_ ^ dd, acc + a)
        _, acc = jax.lax.fori_loop(0, k, body, (r, jnp.float32(0)))
        return acc

    k1f, k2f = 1, 5
    for k in (k1f, k2f):
        _ = float(fused_chain(jnp.int32(k), rgb, mc.w_bins, mc.nf_bins))
    best = None
    dtf = None
    for _ in range(5):
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.time(); _ = float(fused_chain(jnp.int32(k1f), rgb, mc.w_bins, mc.nf_bins)); t1s.append(time.time() - t0)
            t0 = time.time(); _ = float(fused_chain(jnp.int32(k2f), rgb, mc.w_bins, mc.nf_bins)); t2s.append(time.time() - t0)
        dtf = (min(t2s) - min(t1s)) / (k2f - k1f)
        if dtf > 0:
            break
    dtf = max(dtf, 1e-9)
    report["ms_per_frame_one_dispatch"] = round(dtf * 1000, 2)
    report["one_dispatch_topk_per_class"] = fused_topk
    print(
        f"ONE-dispatch {len(class_ids)}-class multiscale: "
        f"{dtf*1000:.2f} ms/frame ({1.0/dtf:.1f} fps)"
    )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
