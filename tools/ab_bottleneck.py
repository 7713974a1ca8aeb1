"""In-model A/B of the fused Pallas bottleneck tails: full fold_bn eval
forward (bench.py's headline program) with CRIS_PALLAS_BOTTLENECK=0 vs 1.

The standalone microbench (tools/bench_bottleneck.py) showed XLA's fused
conv chain WINNING at every tail shape in isolation; this measures
whether the in-model fusion context changes that (the decisive number).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_bottleneck.py [--train]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

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

    results = {}
    for setting in ("0", "1"):
        os.environ["CRIS_PALLAS_BOTTLENECK"] = setting
        timed = (bench.make_train_bench if args.train
                 else bench.make_eval_bench)("RN50")
        t = timed(2, 100)
        print(f"[pallas_bn={setting}] compile+1st 2-scan: {t:.1f}s",
              flush=True)
        ts = {}
        for n in (2, 12):
            best = 1e9
            for rep in range(3):
                best = min(best, timed(n, 1000 + 17 * rep + n))
            ts[n] = best
            print(f"[pallas_bn={setting}] n={n}: best {best * 1e3:.1f}ms",
                  flush=True)
        step_ms = (ts[12] - ts[2]) / 10 * 1e3
        rate = args.batch * 10 / (ts[12] - ts[2])
        results[setting] = (step_ms, rate)
        print(f"[pallas_bn={setting}] marginal {step_ms:.2f} ms/step = "
              f"{rate:.1f} img/s", flush=True)

    off, on = results["0"], results["1"]
    print(f"\nRESULT: off {off[0]:.2f}ms ({off[1]:.1f} img/s)  "
          f"on {on[0]:.2f}ms ({on[1]:.1f} img/s)  "
          f"delta {off[0] - on[0]:+.2f}ms", flush=True)


if __name__ == "__main__":
    main()
