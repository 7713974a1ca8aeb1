"""Standalone host input-pipeline benchmark CLI.

Measures the native C++ batch data plane vs the per-sample Python path
(the reference DataLoader-worker equivalent) on realistic 640x480 JPEGs,
plus the prewarped-record fast path. See cris_tpu/data/host_bench.py.

Run: python tools/bench_input.py [--images 64] [--repeats 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--nthreads", type=int, default=None,
                    help="native thread-pool size (default: all cores)")
    args = ap.parse_args(argv)

    from cris_tpu.data.host_bench import measure_host_pipeline

    result = measure_host_pipeline(
        n_images=args.images, wh=(args.width, args.height),
        input_size=args.input_size, repeats=args.repeats,
        nthreads=args.nthreads,
    )
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
