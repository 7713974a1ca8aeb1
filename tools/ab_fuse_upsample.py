"""In-model A/B of the exact upsample2x+conv folds (ops/upsample_conv.py):
full fold_bn eval forward and/or full train step with CRIS_FUSE_UPSAMPLE=0
vs 1 (the env hook in models/layers.py:auto_fuse_upsample).

Standalone site microbenches (tools/bench_upsample_fold.py) showed the
projector's 52->104 512->256 site at 9.55 -> 7.98 ms fwd; this measures
the decisive in-model numbers at b32 bf16.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_fuse_upsample.py [--eval] [--train]
"""

import argparse
import os
import sys
import time

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
    import jax.numpy as jnp
    import numpy as np

    import bench

    bench.BATCH = args.batch
    print("devices:", jax.devices(), flush=True)

    # probe loop: absorb relay stall (CLAUDE.md)
    rng = np.random.RandomState(0)
    for i in range(3):
        t0 = time.monotonic()
        x = jnp.asarray(rng.randn(256, 256).astype(np.float32))
        float((x @ x).sum())
        print(f"probe {i}: {time.monotonic() - t0:.1f}s", flush=True)

    modes = ([("eval", bench.make_eval_bench)] if args.eval else []) + \
            ([("train", bench.make_train_bench)] if args.train else [])
    for mode, maker in modes:
        results = {}
        for setting in ("0", "1"):
            os.environ["CRIS_FUSE_UPSAMPLE"] = setting
            timed = maker("RN50")
            t = timed(2, 100)
            print(f"[{mode} fuse_up={setting}] compile+1st 2-scan: {t:.1f}s",
                  flush=True)
            ts = {}
            for n in (2, 12):
                best = 1e9
                for rep in range(3):
                    best = min(best, timed(n, 1000 + 17 * rep + n))
                ts[n] = best
                print(f"[{mode} fuse_up={setting}] n={n}: best "
                      f"{best * 1e3:.1f}ms", flush=True)
            step_ms = (ts[12] - ts[2]) / 10 * 1e3
            rate = args.batch * 10 / (ts[12] - ts[2])
            results[setting] = (step_ms, rate)
            print(f"[{mode} fuse_up={setting}] marginal {step_ms:.2f} "
                  f"ms/step = {rate:.1f} img/s", flush=True)
        off, on = results["0"], results["1"]
        print(f"\n{mode.upper()} RESULT: off {off[0]:.2f}ms ({off[1]:.1f} "
              f"img/s)  on {on[0]:.2f}ms ({on[1]:.1f} img/s)  "
              f"delta {off[0] - on[0]:+.2f}ms\n", flush=True)
    os.environ.pop("CRIS_FUSE_UPSAMPLE", None)


if __name__ == "__main__":
    main()
