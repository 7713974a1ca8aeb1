"""In-model A/B of the space-to-depth stem (ops/s2d.py): full fold_bn
eval forward and/or full train step with CRIS_S2D_STEM=0 vs 1 (the env
hook in models/clip_resnet.py:_auto_s2d).

The round-4 conv audit measured the plain stem region's 208^2/104^2
low-channel convs at 1.3-13% of MXU peak (~9 ms of the ~41 ms eval
step); the s2d-resident forms are exact weight rearrangements whose
matmuls are all >=128 wide. This measures the decisive in-model numbers
at b32 bf16.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_s2d.py [--eval] [--train] [--preset RN50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--preset", default="RN50")
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

    settings = (
        {"CRIS_S2D_STEM": "0"},                          # off
        {"CRIS_S2D_STEM": "1", "CRIS_S2D_L1": "0"},      # tier 1: stem only
        {"CRIS_S2D_STEM": "1", "CRIS_S2D_L1": "1"},      # tier 2: + layer1
    )
    modes = ([("eval", bench.make_eval_bench)] if args.eval else []) + \
            ([("train", bench.make_train_bench)] if args.train else [])
    for mode, maker in modes:
        results = env_ab("CRIS_S2D_STEM", settings,
                         lambda: maker(args.preset),
                         batch=args.batch, label=f"{mode} s2d")
        line = "  ".join(f"[{k}] {ms:.2f}ms ({rate:.1f} img/s)"
                         for k, (ms, rate) in results.items())
        print(f"\n{mode.upper()} RESULT: {line}\n", flush=True)


if __name__ == "__main__":
    main()
