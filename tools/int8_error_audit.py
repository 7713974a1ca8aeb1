"""Per-site quantization-error audit of the int8 serving mode (VERDICT
r3 task 3 quality hardening).

The recorded int8 accuracy evidence (rehearsal mIoU cost ~0.56) is an
aggregate; one outlier-prone conv site could dominate it silently. This
tool runs the BN-folded eval forward with the int8 gate on and the
CRIS_INT8_AUDIT hook engaged (models/layers.py QuantConv): every
quantized site computes BOTH the plain conv and its int8 counterpart and
sows (max|err|, rms(err), max|ref|, rms(ref)); the tool prints the
per-site relative error table sorted worst-first, for dynamic and
calibrated-static scales, plus the end-to-end mask agreement vs bf16.

Audit modes:
  local    (default) each site's input comes from the bf16 path, so the
           numbers are per-site intrinsic quantization error;
  compound sites feed downstream, so errors accumulate as in production.

Runs on CPU (XLA:CPU supports int8 conv) or TPU; production shapes via
--preset RN50 --size 416. Synthetic inputs: quantization error statistics
need realistic magnitudes, not semantics; pass --images dir/*.npz for
real calibration tensors if available.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/int8_error_audit.py [--preset RN50] [--batch 8]
        [--size 416] [--static] [--mode local|compound] [--min-ch 128]
        [--pct 99.9]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, prefix + (str(k),))
    elif isinstance(tree, (tuple, list)):
        for v in tree:
            yield from flatten(v, prefix)
    else:
        yield "/".join(prefix), np.asarray(tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--static", action="store_true",
                    help="calibrated static scales (else dynamic)")
    ap.add_argument("--pct", type=float, default=0.0,
                    help="with --static: percentile calibration (e.g. "
                    "99.9) instead of maxabs")
    ap.add_argument("--mode", choices=("local", "compound"), default="local")
    ap.add_argument("--min-ch", type=int, default=128)
    ap.add_argument("--n-batches", type=int, default=2)
    args = ap.parse_args()

    os.environ["CRIS_INT8"] = "1"
    os.environ["CRIS_INT8_MIN_CH"] = str(args.min_ch)
    if args.static:
        os.environ["CRIS_INT8_STATIC"] = "1"
        if args.pct:
            os.environ["CRIS_INT8_CALIB_PCT"] = str(args.pct)

    import jax
    import jax.numpy as jnp

    import bench
    from tools._bench_common import probe

    bench.BATCH = args.batch
    print("devices:", jax.devices(), flush=True)
    if jax.devices()[0].platform != "cpu":
        probe()

    # build_model handles fold_bn and (under CRIS_INT8_STATIC) calibration
    model, variables = bench.build_model(args.preset, fold_bn=True)
    model_q = dataclasses.replace(model, quant_int8=True)

    def batches(n):
        for i in range(n):
            k = jax.random.PRNGKey(500 + i)
            ki, kw = jax.random.split(k)
            yield (
                jax.random.normal(ki, (args.batch, args.size, args.size, 3),
                                  jnp.float32),
                jax.random.randint(kw, (args.batch, 17), 1, 49000, jnp.int32),
            )

    os.environ["CRIS_INT8_AUDIT"] = args.mode

    @jax.jit
    def audit_apply(variables, img, word):
        return model_q.apply(
            variables, img, word, train=False, mutable=["quant_audit"]
        )

    @jax.jit
    def bf16_apply(variables, img, word):
        return model.apply(variables, img, word, train=False)

    stats = None
    agree = []
    for img, word in batches(args.n_batches):
        pred_q, mutated = audit_apply(variables, img, word)
        tree = mutated.get("quant_audit", {})
        if not tree:
            raise SystemExit("no QuantConv site engaged the audit hook -- "
                             "is models/layers.py's CRIS_INT8_AUDIT gate "
                             "present and min-ch low enough?")
        t = {k: v for k, v in flatten(tree)}
        if stats is None:
            stats = t
        else:
            stats = {k: np.maximum(stats[k], v) for k, v in t.items()}
        if args.mode == "compound":
            # in local mode every site returns the bf16 result downstream,
            # so pred_q == bf16 trivially; agreement only means something
            # when errors propagate
            pred_b = bf16_apply(variables, img, word)
            mq = np.asarray(jax.nn.sigmoid(
                pred_q[..., 0].astype(jnp.float32))) > 0.35
            mb = np.asarray(jax.nn.sigmoid(
                pred_b[..., 0].astype(jnp.float32))) > 0.35
            agree.append((mq == mb).mean())
    os.environ.pop("CRIS_INT8_AUDIT", None)

    tag = ("static" + (f"-p{args.pct}" if args.pct else "-maxabs")
           ) if args.static else "dynamic"
    print(f"\n== per-site int8 error ({args.preset} {args.size}px "
          f"b{args.batch}, {tag} scales, mode={args.mode}; worst over "
          f"{args.n_batches} batches) ==", flush=True)
    rows = []
    for site, v in stats.items():
        # scanned stage tails sow per-layer stats stacked on a leading
        # axis; expand to one row per layer
        arr = np.asarray(v).reshape(-1, 4)
        for i in range(arr.shape[0]):
            max_err, rms_err, ref_max, ref_rms = arr[i]
            name = site if arr.shape[0] == 1 else f"{site}[{i}]"
            rows.append((name, max_err / (ref_max + 1e-12),
                         rms_err / (ref_rms + 1e-12)))
    rows.sort(key=lambda r: -r[2])
    print(f"{'site':64s} {'max_err/max_ref':>15} {'rms_err/rms_ref':>15}",
          flush=True)
    for site, rel_max, rel_rms in rows:
        print(f"{site:64s} {rel_max:15.4f} {rel_rms:15.4f}", flush=True)
    print(f"\n{len(rows)} quantized sites; worst rms {rows[0][2]:.4f} "
          f"({rows[0][0]}); median rms "
          f"{sorted(r[2] for r in rows)[len(rows) // 2]:.4f}", flush=True)
    if args.mode == "compound":
        print(f"mask agreement vs bf16 at threshold 0.35 (compound): "
              f"{np.mean(agree):.4f}", flush=True)


if __name__ == "__main__":
    main()
