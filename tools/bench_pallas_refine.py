#!/usr/bin/env python3
"""Micro-benchmark + equivalence gate for the Pallas local-refine kernel
variants at the case1 production scale (K=128 candidates, F=254 features,
VGA maps, t=5).

Chained methodology (see bench.py): K kernel calls are data-dependent
inside one jit; per-call time is the slope over two chain lengths.

Usage:  python tools/bench_pallas_refine.py [--variants v1 v2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", nargs="+", default=["v1", "v2"])
    ap.add_argument("--K", type=int, default=128)
    ap.add_argument("--F", type=int, default=254)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sixdpose_tpu.ops.similarity import similarity_local_sparse
    from sixdpose_tpu.ops.pallas import local_refine as LR

    import functools

    fns = {
        "v1": LR.similarity_local_sparse_pallas,
        "v2": LR.similarity_local_sparse_pallas_v2,
        "v3": LR.similarity_local_sparse_pallas_v3,
        "v3u8": functools.partial(LR.similarity_local_sparse_pallas_v3,
                                  unroll=8),
        "v4": LR.similarity_local_sparse_pallas_v4,
        "v5": LR.similarity_local_sparse_pallas_v5,
    }

    t = 5
    rng = np.random.default_rng(0)
    rm = rng.integers(0, 5, (16, 480, 640)).astype(np.uint8)
    K, F = args.K, args.F
    feats = np.stack(
        [rng.integers(0, 120, (K, F)), rng.integers(0, 90, (K, F)),
         rng.integers(0, 16, (K, F))], -1).astype(np.int32)
    valid = rng.random((K, F)) < 0.95
    org = (rng.integers(0, 60, (K, 2)) * t).astype(np.int32)
    rmj, fj, vj, oj = map(jnp.asarray, (rm, feats, valid, org))

    # --- equivalence gate vs the XLA lowering ---------------------------
    ref_s, ref_c = similarity_local_sparse(rmj, fj, vj, oj, t)
    ref_s, ref_c = np.asarray(ref_s), np.asarray(ref_c)
    for name in args.variants:
        s, c = fns[name](rmj, fj, vj, oj, t)
        ok = np.allclose(np.asarray(s), ref_s) and (np.asarray(c) == ref_c).all()
        print(json.dumps({"variant": name, "equivalent": bool(ok)}))
        if not ok:
            bad = np.argwhere(~np.isclose(np.asarray(s), ref_s))
            print(f"  first mismatch at {bad[:3].tolist()}")
            return 1

    # --- chained timing --------------------------------------------------
    k1, k2 = 4, 24

    def chain(fn, k):
        def body(r):
            s, c = fn(r, fj, vj, oj, t)
            d = (s[0, 0, 0] % 2.0).astype(jnp.uint8)
            return r ^ d

        @jax.jit
        def prog(r):
            return jax.lax.fori_loop(0, k, lambda i, v: body(v), r)
        return prog

    for name in args.variants:
        p1, p2 = chain(fns[name], k1), chain(fns[name], k2)
        for p in (p1, p2):
            r = p(rmj)
            _ = float(jnp.sum(r[..., :1].astype(jnp.float32)))

        def run(p):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                r = p(rmj)
                _ = float(jnp.sum(r[..., :1].astype(jnp.float32)))
                best = min(best, time.time() - t0)
            return best

        dt = None
        for _ in range(5):
            dt = (run(p2) - run(p1)) / (k2 - k1)
            if dt > 0:
                break
        dt = max(dt, 1e-9)
        print(json.dumps({
            "variant": name,
            "ms_per_call": round(dt * 1e3, 3),
            "us_per_feature": round(dt * 1e6 / (K * F), 4),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
