#!/usr/bin/env python3
"""Synthetic multi-object accuracy benchmark (see sixdpose_tpu/benchmark.py).

Example:
  python tools/benchmark_synthetic.py --scenes 20 --views 80
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sixdpose_tpu.benchmark import run_benchmark

    result = run_benchmark(
        num_scenes=args.scenes,
        min_n_views=args.views,
        threshold=args.threshold,
        seed=args.seed,
        max_objects_per_scene=args.objects_per_scene or None,
        prefer_fused=not args.host_path,
        object_ids=args.objects,
    )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
