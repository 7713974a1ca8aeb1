"""Device-op profile of the CRIS eval forward (the bench headline program).

Runs the fold_bn eval forward (same program as bench.py's scan body) a few
times under jax.profiler, then aggregates per-op device time from the
trace.json.gz that the profiler writes. This is the measure-first tool for
kernel work: it tells you which HBM passes are worth fusing before you
write a Pallas kernel (reference has no profiler at all, SURVEY.md §5).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_eval.py \
        [--preset RN50] [--batch 32] [--train] [--outdir /tmp/cris_prof]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def build_and_run(preset, batch, outdir, train=False, steps=3):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.BATCH = batch
    if train:
        timed = bench.make_train_bench(preset)
    else:
        timed = bench.make_eval_bench(preset)
    # compile + warm
    t = timed(2, 123)
    print(f"warm (compile) 2-scan: {t:.2f}s", flush=True)
    t = timed(2, 456)
    print(f"warm 2-scan: {t:.2f}s", flush=True)
    jax.profiler.start_trace(outdir)
    for i in range(steps):
        t = timed(2, 1000 + i)
        print(f"traced 2-scan {i}: {t:.3f}s", flush=True)
    jax.profiler.stop_trace()


def aggregate(outdir, nscans):
    """Sum device-lane op durations from the newest trace.json.gz."""
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found under", outdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name metadata mentions TPU / device XLA
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if re.search(r"TPU|/device|Device", n) and "Host" not in n}
    print("processes:", {p: n for p, n in pid_names.items()})
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        # XLA op lanes; skip the "Steps" / derived lanes
        if "XLA Modules" in lane or "Steps" in lane:
            continue
        if "XLA Ops" not in lane and "TensorFlow Ops" not in lane:
            continue
        if "TensorFlow Ops" in lane and any(
            "XLA Ops" in n for n in tid_names.values()
        ):
            continue  # avoid double counting when both lanes exist
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_op[name] += dur
        total += dur

        cat = classify(name)
        by_cat[cat] += dur

    per = 1.0 / max(nscans, 1)
    print(f"\n== device op time: total {total * per:.2f} ms per scan "
          f"({nscans} scans traced) ==")
    print("\n-- by category --")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:34s} {ms * per:8.2f} ms  {100 * ms / total:5.1f}%")
    print("\n-- top 40 ops --")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms * per:8.3f} ms  {100 * ms / total:5.1f}%  {name[:110]}")


def classify(name):
    n = name.lower()
    if "conv" in n or "dot" in n or "einsum" in n:
        return "conv/matmul fusions"
    if "reduce" in n or "norm" in n or "mean" in n or "variance" in n:
        return "reduces/LN"
    if "copy" in n or "pad" in n or "transpose" in n or "reshape" in n \
            or "bitcast" in n or "slice" in n or "concat" in n:
        return "copies/pads/layout"
    if "fusion" in n or "add" in n or "max" in n or "mul" in n \
            or "sub" in n or "relu" in n or "convert" in n or "select" in n:
        return "elementwise fusions"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/cris_prof_eval")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        build_and_run(args.preset, args.batch, args.outdir, args.train,
                      args.steps)
    # each timed(2, ...) call runs a scan of 2 batches
    aggregate(args.outdir, nscans=args.steps * 2)


if __name__ == "__main__":
    main()
