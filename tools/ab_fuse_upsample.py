"""In-model A/B of the exact upsample2x+conv folds (ops/upsample_conv.py):
full fold_bn eval forward and/or full train step with CRIS_FUSE_UPSAMPLE=0
vs 1 (the env hook in models/layers.py:auto_fuse_upsample).

Standalone site microbenches (tools/bench_upsample_fold.py) showed the
projector's 52->104 512->256 site at 9.55 -> 7.98 ms fwd; this measures
the decisive in-model numbers at b32 bf16. Round-4 result: eval
788.7 on vs 783.0 off; train 155.31 vs 155.57 ms -- small but real,
default-on.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_fuse_upsample.py [--eval] [--train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    if not (args.eval or args.train):
        args.eval = args.train = True

    import jax

    import bench
    from tools._bench_common import env_ab, probe

    bench.BATCH = args.batch
    print("devices:", jax.devices(), flush=True)
    probe()

    modes = ([("eval", bench.make_eval_bench)] if args.eval else []) + \
            ([("train", bench.make_train_bench)] if args.train else [])
    for mode, maker in modes:
        results = env_ab("CRIS_FUSE_UPSAMPLE", ("0", "1"),
                         lambda: maker("RN50"), batch=args.batch, label=mode)
        off, on = results["0"], results["1"]
        print(f"\n{mode.upper()} RESULT: off {off[0]:.2f}ms ({off[1]:.1f} "
              f"img/s)  on {on[0]:.2f}ms ({on[1]:.1f} img/s)  "
              f"delta {off[0] - on[0]:+.2f}ms\n", flush=True)


if __name__ == "__main__":
    main()
