"""Per-conv MXU-efficiency audit of the production eval forward (VERDICT
r3 task 4).

"Remaining eval headroom is conv MXU efficiency" has so far been an
inference from negatives (epilogue-fusion kernels lose; profile
attribution overcounts). This tool turns it into a table:

1. Trace the EXACT production program (fold_bn eval forward, b32 bf16,
   all graph-transform gates at their defaults) and walk its jaxpr,
   collecting every `conv_general_dilated` with its full signature,
   multiplying counts through `scan` bodies (the nn.scan'd stage tails).
2. Microbench each distinct conv signature standalone with the marginal
   scan methodology (n=2/12 difference cancels the relay dispatch cost;
   distinct inputs per iteration -- value-cache-safe).
3. Emit: per signature -- count, ms (each / total), GFLOPs, achieved
   TFLOP/s, % of the v5e bf16 peak (197 TFLOP/s), % of the summed conv
   time; plus the sum vs the measured whole-forward marginal time (the
   non-conv residual).

The nominal-MAC FLOP count for lhs_dilated convs (the upsample folds)
counts inserted zeros as work, matching what the MXU actually executes.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/conv_audit.py [--preset RN50] [--batch 32] [--top 0]
"""

import argparse
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16_TFLOPS = 197.0  # v5e MXU bf16 peak
PEAK_INT8_TOPS = 394.0


PRIMS = ("conv_general_dilated", "dot_general")


def collect_convs(jaxpr, mult=1, out=None):
    """Walk a jaxpr, yielding (eqn, multiplicity) for every conv AND
    dot_general (the decoder/attnpool matmuls and the bwd's transposed
    dots); recurses through scan (x length), pjit/remat/custom_* (x1),
    cond branches (x1 each, upper bound)."""
    from jax._src import core

    if out is None:
        out = []
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in PRIMS:
            out.append((eqn, mult))
            continue
        if name == "pallas_call":
            # in-kernel dots operate on VMEM blocks, not XLA arrays --
            # benching them as standalone XLA ops would be meaningless
            continue
        if name == "scan":
            collect_convs(eqn.params["jaxpr"].jaxpr,
                          mult * eqn.params["length"], out)
            continue
        if name == "while":
            collect_convs(eqn.params["body_jaxpr"].jaxpr, mult, out)
            continue
        if name == "cond":
            for br in eqn.params["branches"]:
                collect_convs(br.jaxpr, mult, out)
            continue
        for v in eqn.params.values():
            if isinstance(v, core.ClosedJaxpr):
                collect_convs(v.jaxpr, mult, out)
            elif isinstance(v, core.Jaxpr):
                collect_convs(v, mult, out)
            elif isinstance(v, (tuple, list)):
                for u in v:
                    if isinstance(u, core.ClosedJaxpr):
                        collect_convs(u.jaxpr, mult, out)
                    elif isinstance(u, core.Jaxpr):
                        collect_convs(u, mult, out)
    return out


def conv_signature(eqn):
    """Hashable full signature of a conv or dot_general eqn
    (shapes+dtypes+params), tagged by kind in slot 0.

    For convs, dimension_numbers is kept as the real ConvDimensionNumbers
    (a NamedTuple of int tuples, hashable): the bwd wgrad convs permute
    batch/feature roles, so NHWC must not be assumed.
    """
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    outv = eqn.outvars[0].aval
    p = eqn.params
    pet = p.get("preferred_element_type")
    if eqn.primitive.name == "dot_general":
        (lc, rc), (lb, rb) = p["dimension_numbers"]
        return (
            "dot",
            tuple(lhs.shape), str(lhs.dtype), tuple(rhs.shape),
            str(rhs.dtype), tuple(outv.shape), str(outv.dtype),
            (tuple(lc), tuple(rc)), (tuple(lb), tuple(rb)),
            None if pet is None else str(pet),
        )
    return (
        "conv",
        tuple(lhs.shape), str(lhs.dtype), tuple(rhs.shape), str(rhs.dtype),
        tuple(outv.shape), str(outv.dtype),
        tuple(p["window_strides"]), tuple(map(tuple, p["padding"])),
        tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
        p["feature_group_count"], p["dimension_numbers"],
        None if pet is None else str(pet),
    )


def sig_flops(sig):
    """Nominal MACs x2: out_elems * (contracted elems per output)."""
    out_elems = 1
    for d in sig[5]:
        out_elems *= d
    if sig[0] == "dot":
        k_elems = 1
        for i in sig[7][0]:  # lhs contracting dims
            k_elems *= sig[1][i]
        return 2 * out_elems * k_elems
    rhs_shape, dn = sig[3], sig[12]
    cout = rhs_shape[dn.rhs_spec[0]]
    k_elems = 1
    for d in rhs_shape:
        k_elems *= d
    k_elems //= cout
    return 2 * out_elems * k_elems


def sig_label(sig):
    if sig[0] == "dot":
        lhs_shape, lhs_dt, rhs_shape = sig[1], sig[2], sig[3]
        (lc, rc), (lb, rb) = sig[7], sig[8]
        dt = "bf16" if lhs_dt == "bfloat16" else lhs_dt
        sl = "x".join(str(d) for d in lhs_shape)
        sr = "x".join(str(d) for d in rhs_shape)
        extras = f" bd{len(lb)}" if lb else ""
        return (f"dot {sl}@{sr} c{list(lc)}:{list(rc)}{extras} {dt}")
    lhs_shape, lhs_dt, rhs_shape = sig[1], sig[2], sig[3]
    strides, padding, lhs_dil, rhs_dil, fgc, dn = (
        sig[7], sig[8], sig[9], sig[10], sig[11], sig[12])
    n = lhs_shape[dn.lhs_spec[0]]
    cin = lhs_shape[dn.lhs_spec[1]]
    spatial = [lhs_shape[i] for i in dn.lhs_spec[2:]]
    cout = rhs_shape[dn.rhs_spec[0]]
    ks = [rhs_shape[i] for i in dn.rhs_spec[2:]]
    extras = []
    if any(s != 1 for s in strides):
        extras.append(f"s{strides[0]}")
    if any(d != 1 for d in lhs_dil):
        extras.append(f"ld{lhs_dil[0]}")
    if any(d != 1 for d in rhs_dil):
        extras.append(f"rd{rhs_dil[0]}")
    if fgc != 1:
        extras.append(f"g{fgc}")
    if dn.lhs_spec != (0, 3, 1, 2):
        extras.append("wg")  # batch/feature roles permuted: bwd wgrad
    elif dn.rhs_spec != (3, 2, 0, 1):
        extras.append("dg")  # kernel in/out transposed: bwd dgrad
    dt = "bf16" if lhs_dt == "bfloat16" else lhs_dt
    sp = "x".join(str(s) for s in spatial)
    kk = "x".join(str(k) for k in ks)
    return (f"b{n} {sp} {cin}->{cout} k{kk}"
            + (" " + ",".join(extras) if extras else "") + f" {dt}")


def bench_one(sig, n_short=8, n_long=88, trials=3):
    """Marginal ms of one conv signature.

    Span is 80 iterations, not bench.py's 10: relay timing jitter is
    ~2-4 ms/dispatch, which drowns a 10-iteration marginal for sub-ms
    convs (the first round-4 audit run produced negative marginals and
    >1000 TF/s rows). Memory stays bounded by stacking only 8 distinct
    inputs and striding them with a fori_loop (device-side reuse is
    fine -- the relay value-cache is per-DISPATCH, and the sequential
    loop carry prevents cross-iteration CSE).
    """
    import jax
    import jax.numpy as jnp

    kind, lhs_shape, lhs_dt, rhs_shape, rhs_dt = sig[:5]
    pet = sig[-1]
    lhs_dtype = jnp.dtype(lhs_dt)
    rhs_dtype = jnp.dtype(rhs_dt)
    if pet in ("None", None):
        pref = None
    else:
        # str() of a np.dtype is "int32"; of a class, "<class 'jax...int32'>"
        name = pet.split("'")[1].rsplit(".", 1)[-1] if "'" in pet else pet
        pref = jnp.dtype(name)

    if kind == "dot":
        dot_dn = (sig[7], sig[8])

        def conv(x, k):
            return jax.lax.dot_general(
                x, k, dimension_numbers=dot_dn,
                preferred_element_type=pref)
    else:
        strides, padding, lhs_dil, rhs_dil, fgc, dn = sig[7:13]

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, strides, list(padding),
                lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
                dimension_numbers=dn,
                feature_group_count=fgc,
                preferred_element_type=pref)

    n_stack = min(8, n_short)

    @jax.jit
    def make_inputs(seed):
        def gen(i):
            return jax.random.normal(
                jax.random.PRNGKey(seed + i), lhs_shape, jnp.float32
            ).astype(lhs_dtype)
        return jax.vmap(gen)(jnp.arange(n_stack))

    @partial(jax.jit, static_argnames=("n",))
    def run(xs, k, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(
                xs, i % n_stack, 0, keepdims=False)
            y = conv(x, k)
            return acc + y.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, 0.0)

    r = np.random.RandomState(0)
    k = jnp.asarray(
        (r.randn(*rhs_shape) * (np.prod(rhs_shape[:-1]) ** -0.5)
         ).astype(np.float32)).astype(rhs_dtype)

    ts = {}
    for n in (n_short, n_long):
        xs = make_inputs(11 + n)
        jax.block_until_ready(xs)
        t0 = time.monotonic()
        float(run(xs, k, n))
        tc = time.monotonic() - t0
        best = 1e9
        for rep in range(trials):
            xs = make_inputs(1000 + 31 * rep + n)
            jax.block_until_ready(xs)
            t0 = time.monotonic()
            float(run(xs, k, n))
            best = min(best, time.monotonic() - t0)
        ts[n] = best
        del xs
    return (ts[n_long] - ts[n_short]) / (n_long - n_short) * 1e3, tc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mode", choices=("eval", "train"), default="eval",
                    help="eval: fold_bn forward; train: full train_step "
                    "(enumerates the bwd dgrad/wgrad convs too)")
    ap.add_argument("--top", type=int, default=0,
                    help="bench only the top-N signatures by FLOPs (0=all)")
    ap.add_argument("--no-model", action="store_true",
                    help="skip the whole-program marginal reference")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from tools._bench_common import marginal, probe

    bench.BATCH = args.batch
    print("devices:", jax.devices(), flush=True)
    probe()

    img = jnp.zeros((args.batch, 416, 416, 3), jnp.float32)
    word = jnp.ones((args.batch, 17), jnp.int32)
    if args.mode == "eval":
        model, variables = bench.build_model(args.preset, fold_bn=True)

        def traced(variables, img, word):
            return model.apply(variables, img, word, train=False)

        jaxpr = jax.make_jaxpr(traced)(variables, img, word)
    else:
        from cris_tpu.engine.trainer import (
            create_train_state, make_optimizer, train_step,
        )
        from cris_tpu.utils import root_key
        from cris_tpu.utils.config import CfgNode

        model, variables = bench.build_model(args.preset, fold_bn=False)
        cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                       "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})
        state = create_train_state(model, variables, make_optimizer(cfg, 1000))
        batch = {"image": img, "word": word,
                 "mask": jnp.zeros((args.batch, 416, 416, 1), jnp.float32)}
        jaxpr = jax.make_jaxpr(train_step)(state, batch, root_key(42))
    convs = collect_convs(jaxpr.jaxpr)
    sigs = {}
    for eqn, mult in convs:
        s = conv_signature(eqn)
        sigs[s] = sigs.get(s, 0) + mult
    total_flops = sum(sig_flops(s) * c for s, c in sigs.items())
    print(f"\n{len(convs)} conv eqns, {len(sigs)} distinct signatures, "
          f"{total_flops / 1e9:.1f} GFLOP total (batch {args.batch})",
          flush=True)

    order = sorted(sigs.items(), key=lambda kv: -sig_flops(kv[0]) * kv[1])
    if args.top:
        order = order[: args.top]

    rows = []
    for s, count in order:
        label = sig_label(s)
        try:
            ms, tcompile = bench_one(s)
        except Exception as e:  # noqa: BLE001 -- keep auditing
            print(f"  {label}: BENCH FAILED {e!r}", flush=True)
            continue
        gflops = sig_flops(s) / 1e9
        tflops = gflops / ms if ms > 0 else float("nan")
        rows.append((label, count, ms, gflops, tflops))
        print(f"  {label:42s} x{count:2d}  {ms:7.3f} ms  {gflops:7.1f} GF  "
              f"{tflops:6.1f} TF/s  {100 * tflops / PEAK_BF16_TFLOPS:5.1f}% pk"
              f"  (compile {tcompile:.1f}s)", flush=True)

    conv_total = sum(r[2] * r[1] for r in rows)
    print(f"\n== audit table ({args.preset} b{args.batch} {args.mode}; "
          f"peak {PEAK_BF16_TFLOPS:.0f} TF/s bf16) ==", flush=True)
    print(f"{'signature':42s} {'cnt':>3} {'ms/one':>8} {'ms*cnt':>8} "
          f"{'GF':>7} {'TF/s':>6} {'%peak':>6} {'%convs':>7}", flush=True)
    for label, count, ms, gflops, tflops in sorted(
            rows, key=lambda r: -r[2] * r[1]):
        print(f"{label:42s} {count:3d} {ms:8.3f} {ms * count:8.2f} "
              f"{gflops:7.1f} {tflops:6.1f} "
              f"{100 * tflops / PEAK_BF16_TFLOPS:6.1f} "
              f"{100 * ms * count / conv_total:7.1f}", flush=True)
    print(f"\nsummed standalone conv time: {conv_total:.2f} ms "
          f"({total_flops / conv_total / 1e9:.1f} TF/s aggregate, "
          f"{100 * total_flops / conv_total / 1e9 / PEAK_BF16_TFLOPS:.1f}% "
          f"of peak)", flush=True)

    if not args.no_model:
        maker = (bench.make_eval_bench if args.mode == "eval"
                 else bench.make_train_bench)
        timed = maker(args.preset)
        step_ms, rate = marginal(timed, f"{args.preset} {args.mode}",
                                 batch=args.batch)
        print(f"\nwhole-program marginal: {step_ms:.2f} ms = {rate:.1f} "
              f"img/s; non-conv residual {step_ms - conv_total:.2f} ms "
              f"({100 * (step_ms - conv_total) / step_ms:.1f}% of step; "
              f"attention/resize/elementwise/optimizer/fusion effects)",
              flush=True)


if __name__ == "__main__":
    main()
