#!/usr/bin/env python3
"""Synthetic multi-object accuracy benchmark (see sixdpose_tpu/benchmark.py).

One fused multi-class dispatch per scene; ``--max-hyps`` hypotheses per
class survive through batched ICP + verification and the published pose
is the verification-ranked winner.  Artifacts are stamped with git rev +
flags (utils/artifacts.py).

Example:
  python tools/benchmark_synthetic.py --scenes 20 --views 80 \
      --bank-cache /tmp/synth_bank.npz --out SYNTH_r03.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenes", type=int, default=20)
    ap.add_argument("--views", type=int, default=80)
    ap.add_argument("--threshold", type=float, default=55.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--objects-per-scene", type=int, default=4,
                    help="classes sampled per scene (0 = all 9 at once)")
    ap.add_argument("--objects", nargs="*", default=None,
                    help="restrict the model pool (default: all 9)")
    ap.add_argument("--host-path", action="store_true",
                    help="force the host-orchestrated serving path (A/B)")
    ap.add_argument("--bank-cache", default=None,
                    help="npz path: reuse the trained bank across runs")
    ap.add_argument("--max-hyps", type=int, default=12,
                    help="hypotheses per class kept through ICP + verify "
                         "(swept r04: 8 -> 0.545, 12 -> 0.597, see "
                         "TUNING_r04.json)")
    ap.add_argument("--icp-seeds", type=int, default=4,
                    help="in-plane ICP seed fan per hypothesis (with "
                         "--seed-flip the last slot is the 180-deg seed)")
    ap.add_argument("--no-seed-flip", action="store_true",
                    help="disable the 180-deg in-plane flip seed")
    ap.add_argument("--verify-tau", type=float, default=6.0,
                    help="verification depth-agreement tolerance (mm); "
                         "6.0 with max_hyps=12 scored 0.61 (TUNING_r04)")
    ap.add_argument("--top-k", type=int, default=32,
                    help="match candidate budget per class (inference-only; "
                         "does not invalidate the bank cache)")
    ap.add_argument("--rank-key", default="verify",
                    choices=["verify", "fitness", "similarity"])
    ap.add_argument("--color-zscore", action="store_true",
                    help="per-pixel chroma informativeness weighting in "
                         "verification (texture pixels dominate the color "
                         "fraction; separates geometric twins like "
                         "box/texbox — models/refine.py verify_poses_multi)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the tunnel sitecustomize "
                         "overrides JAX_PLATFORMS)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from sixdpose_tpu.benchmark import run_benchmark
    from sixdpose_tpu.utils.artifacts import provenance, write_artifact

    result = run_benchmark(
        num_scenes=args.scenes,
        min_n_views=args.views,
        threshold=args.threshold,
        seed=args.seed,
        max_objects_per_scene=args.objects_per_scene or None,
        prefer_fused=not args.host_path,
        object_ids=args.objects,
        bank_cache=args.bank_cache,
        max_hyps=args.max_hyps,
        rank_key=args.rank_key,
        seed_flip=not args.no_seed_flip,
        icp_seeds=args.icp_seeds,
        verify_tau=args.verify_tau,
        top_k=args.top_k,
        verify_color_zscore=args.color_zscore,
    )
    config = {k: v for k, v in vars(args).items() if k != "out"}
    if args.out:
        result = write_artifact(args.out, result, config)
    else:
        result = dict(result, provenance=provenance(config))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
