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
    args = ap.parse_args()

    from sixdpose_tpu.benchmark import run_benchmark

    result = run_benchmark(
        num_scenes=args.scenes,
        min_n_views=args.views,
        threshold=args.threshold,
        seed=args.seed,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
