"""In-model A/B of the int8 serving path (ops/quant.py, CRIS_INT8 gate):
full fold_bn eval forward with CRIS_INT8=0 vs 1 at b32.

Run AFTER tools/bench_int8.py (per-shape microbench) confirms the int8
conv wins standalone; this measures the decisive end-to-end number.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/ab_int8.py [--batch 32] [--min-ch 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--min-ch", type=int, default=128)
    ap.add_argument("--settings", default="0,1,static",
                    help="comma list of arms: 0 (bf16), 1 (dynamic), "
                    "static (full static coverage), static_base (static "
                    "with the round-4 pooled/s2d-stem sites EXCLUDED -- "
                    "isolates the new-coverage win)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    bench.BATCH = args.batch
    os.environ["CRIS_INT8_MIN_CH"] = str(args.min_ch)
    print("devices:", jax.devices(), flush=True)

    rng = np.random.RandomState(0)
    for i in range(3):
        t0 = time.monotonic()
        x = jnp.asarray(rng.randn(256, 256).astype(np.float32))
        float((x @ x).sum())
        print(f"probe {i}: {time.monotonic() - t0:.1f}s", flush=True)

    results = {}
    for setting in args.settings.split(","):
        os.environ.pop("CRIS_INT8_POOLED_MIN_CH", None)
        os.environ.pop("CRIS_INT8_STEM", None)
        if setting.startswith("static"):
            os.environ["CRIS_INT8"] = "1"
            os.environ["CRIS_INT8_STATIC"] = "1"
            if setting == "static_base":
                # exclude the round-4 pooled/s2d-stem coverage: the
                # static-int8 graph exactly as first landed (min_ch-gated
                # QuantConv sites only)
                os.environ["CRIS_INT8_POOLED_MIN_CH"] = "999999"
                os.environ["CRIS_INT8_STEM"] = "0"
        else:
            os.environ["CRIS_INT8"] = setting
            os.environ.pop("CRIS_INT8_STATIC", None)
        timed = bench.make_eval_bench("RN50")
        t = timed(2, 100)
        print(f"[eval int8={setting}] compile+1st 2-scan: {t:.1f}s",
              flush=True)
        ts = {}
        for n in (2, 12):
            best = 1e9
            for rep in range(3):
                best = min(best, timed(n, 1000 + 17 * rep + n))
            ts[n] = best
            print(f"[eval int8={setting}] n={n}: best {best * 1e3:.1f}ms",
                  flush=True)
        step_ms = (ts[12] - ts[2]) / 10 * 1e3
        rate = args.batch * 10 / (ts[12] - ts[2])
        results[setting] = (step_ms, rate)
        print(f"[eval int8={setting}] marginal {step_ms:.2f} ms/step = "
              f"{rate:.1f} img/s", flush=True)
    names = {"0": "off", "1": "dyn"}
    summary = "  ".join(
        f"{names.get(k, k)} {v[0]:.2f}ms ({v[1]:.1f} img/s)"
        for k, v in results.items())
    print(f"\nEVAL INT8 RESULT (min_ch={args.min_ch}): {summary}\n",
          flush=True)
    os.environ.pop("CRIS_INT8", None)
    os.environ.pop("CRIS_INT8_STATIC", None)
    os.environ.pop("CRIS_INT8_POOLED_MIN_CH", None)
    os.environ.pop("CRIS_INT8_STEM", None)


if __name__ == "__main__":
    main()
