"""In-model A/B of the fused Pallas bottleneck tails: full fold_bn eval
forward (bench.py's headline program) with CRIS_PALLAS_BOTTLENECK=0 vs 1.

The standalone microbench (tools/bench_bottleneck.py) showed XLA's fused
conv chain WINNING at every tail shape in isolation; this measures
whether the in-model fusion context changes that (the decisive number).
Round-3 result: ON 776.3 vs OFF 787.1 img/s -- NEGATIVE, kernel gated
off by default (opt-in CRIS_PALLAS_BOTTLENECK=1).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_bottleneck.py [--train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax

    import bench
    from tools._bench_common import env_ab, probe

    bench.BATCH = args.batch
    print("devices:", jax.devices(), flush=True)
    probe()

    maker = bench.make_train_bench if args.train else bench.make_eval_bench
    results = env_ab("CRIS_PALLAS_BOTTLENECK", ("0", "1"),
                     lambda: maker("RN50"), batch=args.batch)
    off, on = results["0"], results["1"]
    print(f"\nRESULT: off {off[0]:.2f}ms ({off[1]:.1f} img/s)  "
          f"on {on[0]:.2f}ms ({on[1]:.1f} img/s)  "
          f"delta {off[0] - on[0]:+.2f}ms", flush=True)


if __name__ == "__main__":
    main()
