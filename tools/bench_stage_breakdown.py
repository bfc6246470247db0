#!/usr/bin/env python3
"""Per-stage device-time breakdown of the fused detection pipeline
(maps -> coarse -> topk -> refine -> sort/NMS) at case1 scale.

Each stage prefix is chained K times inside one jit (bench.py
methodology — the only honest timing on tunneled devices) and stage
costs are the differences between successive prefixes.  This is the
per-stage timing surface the reference exposes via ad-hoc chrono prints
around match() (test.cpp:125-130), done at device-time fidelity.

Usage:  python tools/bench_stage_breakdown.py [--out JSON]
"""

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
    ap.add_argument("--out", default=None)
    ap.add_argument("--k", type=int, nargs=2, default=[4, 24])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sixdpose_tpu.config import DetectorConfig
    from sixdpose_tpu.models.detector import (
        Detector,
        _build_response_pyramid_jax,
        coarse_scores,
        detect_frame_core,
        pyramid_refine,
        _offset,
    )
    from sixdpose_tpu.ops.topk_nms import topk_candidates

    if os.path.isdir(CASE1):
        from sixdpose_tpu.data.inout import (
            load_depth, load_im, load_reference_template_bank,
        )
        cid, templates = load_reference_template_bank(
            os.path.join(CASE1, "127", "06_template.yaml"))
        rgb = load_im(os.path.join(CASE1, "0000_rgb.png"))
        dep = load_depth(os.path.join(CASE1, "0000_dep.png"))
    else:
        from bench import _synthetic_bank
        cid, templates, rgb, dep = _synthetic_bank()

    cfg = DetectorConfig(t_at_level=(5, 8))
    det = Detector(cfg)
    for tl in templates:
        det.bank.add_template_levels(cid, tl)
    kernels, nfeats, whs = det.device_bank(cid)
    feats, valids = det._device_feats[cid]
    rgbj, depj = jnp.asarray(rgb), jnp.asarray(dep)
    tal = tuple(cfg.t_at_level)
    t_c = tal[-1]

    import sixdpose_tpu.ops.quantize as Q
    from sixdpose_tpu.ops.spread import (
        compute_response_maps,
        spread_orientations,
    )

    # Stage prefixes: each returns a scalar to perturb the next frame.
    def s_quantize(r):
        """Quantize-only sub-stage of the map build (both modalities,
        both pyramid levels)."""
        acc = jnp.int32(0)
        cur = r
        for l in range(cfg.pyramid_levels):
            if l > 0:
                cur = Q.pyr_down_rgb(cur)
            q, _ = Q.quantize_color_gradient(cur, cfg.color.weak_threshold)
            acc = acc + jnp.sum(q[::16, ::16].astype(jnp.int32))
        qs = Q.depth_normal_pyramid(
            depj, cfg.pyramid_levels, cfg.depth.distance_threshold,
            cfg.depth.difference_threshold, cfg.depth.focal,
            cfg.depth.lut_parity,
        )
        for q in qs:
            acc = acc + jnp.sum(q[::16, ::16].astype(jnp.int32))
        return acc % 2

    def s_spread(r):
        """Quantize + spread (no response LUT)."""
        acc = jnp.int32(0)
        cur = r
        qs = Q.depth_normal_pyramid(
            depj, cfg.pyramid_levels, cfg.depth.distance_threshold,
            cfg.depth.difference_threshold, cfg.depth.focal,
            cfg.depth.lut_parity,
        )
        for l in range(cfg.pyramid_levels):
            if l > 0:
                cur = Q.pyr_down_rgb(cur)
            q, _ = Q.quantize_color_gradient(cur, cfg.color.weak_threshold)
            t_l = cfg.t_at_level[l]
            for src in (q, qs[l]):
                sp = spread_orientations(src, t_l)
                acc = acc + jnp.sum(sp[::16, ::16].astype(jnp.int32))
        return acc % 2

    def s_maps(r):
        pyr = _build_response_pyramid_jax(r, depj, cfg)
        return jnp.sum(pyr[1][:, ::16, ::16].astype(jnp.int32)) % 2

    def s_coarse(r):
        pyr = _build_response_pyramid_jax(r, depj, cfg)
        sc = coarse_scores(pyr, kernels, nfeats, tal, feats, valids)
        return (sc[0, 0, 0] % 2.0).astype(jnp.int32)

    def s_topk(r):
        pyr = _build_response_pyramid_jax(r, depj, cfg)
        sc = coarse_scores(pyr, kernels, nfeats, tal, feats, valids)
        tid, yi, xi, score = topk_candidates(sc, 75.0, cfg.top_k)
        return (score[0] % 2.0).astype(jnp.int32)

    def s_refine(r):
        pyr = _build_response_pyramid_jax(r, depj, cfg)
        sc = coarse_scores(pyr, kernels, nfeats, tal, feats, valids)
        tid, yi, xi, score = topk_candidates(sc, 75.0, cfg.top_k)
        x = xi * t_c + _offset(t_c)
        y = yi * t_c + _offset(t_c)
        tid, x, y, score = pyramid_refine(
            pyr, kernels, nfeats, whs, tal, 75.0, tid, x, y, score,
            feats, valids,
        )
        return (score[0] % 2.0).astype(jnp.int32)

    def s_full(r):
        tid, x, y, score, keep = detect_frame_core(
            r, depj, kernels, nfeats, whs, cfg, 75.0, True, feats, valids)
        return (score[0] % 2.0).astype(jnp.int32)

    stages = [
        ("quantize", s_quantize), ("spread", s_spread),
        ("maps", s_maps), ("coarse", s_coarse), ("topk", s_topk),
        ("refine", s_refine), ("full", s_full),
    ]
    k1, k2 = args.k

    def timed(stage_fn):
        def body(r):
            d = stage_fn(r).astype(jnp.uint8)
            return r ^ d

        # Traced chain length: ONE compile per stage prefix instead of
        # two (remote compiles cost minutes per program).
        @jax.jit
        def chain(k, r):
            return jax.lax.fori_loop(0, k, lambda i, v: body(v), r)

        for k in (k1, k2):
            out = chain(jnp.int32(k), rgbj)
            _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))

        def run(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = chain(jnp.int32(k), rgbj)
                _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
                best = min(best, time.time() - t0)
            return best

        dt = None
        for _ in range(5):
            dt = (run(k2) - run(k1)) / (k2 - k1)
            if dt > 0:
                break
        return max(dt, 1e-9)

    prefix_ms = {}
    for name, fn in stages:
        prefix_ms[name] = timed(fn) * 1e3
        print(f"prefix through {name:<7s}: {prefix_ms[name]:7.3f} ms")

    names = [n for n, _ in stages]
    deltas = {names[0]: prefix_ms[names[0]]}
    for a, b in zip(names, names[1:]):
        deltas[b] = prefix_ms[b] - prefix_ms[a]
    report = {
        "prefix_ms": {k: round(v, 3) for k, v in prefix_ms.items()},
        "stage_ms": {k: round(v, 3) for k, v in deltas.items()},
        "fps_full": round(1e3 / prefix_ms["full"], 1),
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
