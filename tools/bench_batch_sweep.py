"""Batch-size sweep for the serving/eval path (VERDICT r4 task 4).

Every headline number so far is b32 -- inherited from train parity, not
chosen for serving. This sweeps the marginal-scan eval rate at
b16/32/64/128 in bf16 and int8-static (13^2 convs already measure
cache-resident at b32; a bigger batch may amortize attnpool/decoder
further), plus the train step at b64. The winner sets PredictService's
``max_batch`` default (serving.py) and documents the HBM/throughput
tradeoff.

OOM handling: each point compiles independently; a failed point prints
and the sweep continues (b128 bf16 activations at 416^2 may not fit the
15.75G budget).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_batch_sweep.py [--batches 16,32,64,128]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64,128")
    ap.add_argument("--train-batches", default="64",
                    help="train-step sweep points (b32 is the recorded "
                    "baseline; empty string skips)")
    ap.add_argument("--preset", default="RN50")
    args = ap.parse_args()

    import jax

    import bench
    from tools._bench_common import marginal, probe

    print("devices:", jax.devices(), flush=True)
    probe()

    rows = []

    def sweep(mode, batches, make, env=None):
        saved = {}
        if env:
            for k, v in env.items():
                saved[k] = os.environ.get(k)
                os.environ[k] = v
        try:
            for b in batches:
                bench.BATCH = b
                try:
                    timed = make()
                    ms, rate = marginal(timed, f"{mode} b{b}", batch=b,
                                        seed_base=1000 + 1009 * b)
                    rows.append((mode, b, ms, rate))
                except Exception as e:  # noqa: BLE001 -- keep sweeping (OOM)
                    print(f"  [{mode} b{b}] FAILED {e!r}"[:200], flush=True)
                    rows.append((mode, b, None, None))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    batches = [int(b) for b in args.batches.split(",") if b]
    sweep("eval_bf16", batches, lambda: bench.make_eval_bench(args.preset))
    sweep("eval_int8", batches, lambda: bench.make_eval_bench(args.preset),
          env={"CRIS_INT8": "1", "CRIS_INT8_STATIC": "1",
               "CRIS_INT8_MIN_CH": "64"})
    tb = [int(b) for b in args.train_batches.split(",") if b]
    if tb:
        sweep("train", tb, lambda: bench.make_train_bench(args.preset))

    print(f"\n== batch sweep ({args.preset}) ==", flush=True)
    print(f"{'mode':10s} {'batch':>5} {'ms/step':>9} {'img/s':>8}", flush=True)
    for mode, b, ms, rate in rows:
        if ms is None:
            print(f"{mode:10s} {b:5d}      OOM/FAILED", flush=True)
        else:
            print(f"{mode:10s} {b:5d} {ms:9.2f} {rate:8.1f}", flush=True)


if __name__ == "__main__":
    main()
