"""Standalone TPU microbench: int8 convs vs bf16 at the R50 model shapes.

The v5e MXU has 2x int8 peak over bf16 (394 vs 197 TOPS). Eval is
conv-MXU-bound after the round-3 epilogue-fusion negative (CLAUDE.md), so
int8 inference is the one remaining lever of that size. Microbench-first
discipline: measure (a) the pure int8 conv ceiling (pre-quantized input),
(b) int8 + dynamic per-tensor activation quant + per-channel dequant
epilogue (the realistic in-model formulation), against the bf16 conv,
BEFORE integrating a quantized eval mode.

Marginal-scan methodology as in tools/bench_bottleneck.py.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_int8.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (h, w, cin, cout, ksize, n_sites) -- R50 @ 416 b32 conv population:
# 3x3 mid convs per stage and the widest 1x1s (expansion/reduction).
SHAPES = [
    (104, 104, 64, 64, 3, 3),      # layer1 mid
    (52, 52, 128, 128, 3, 4),      # layer2 mid
    (26, 26, 256, 256, 3, 6),      # layer3 mid
    (13, 13, 512, 512, 3, 3),      # layer4 mid
    (52, 52, 512, 128, 1, 3),      # layer2 reduce
    (26, 26, 1024, 256, 1, 5),     # layer3 reduce
    (13, 13, 2048, 512, 1, 2),     # layer4 reduce
    (26, 26, 256, 1024, 1, 6),     # layer3 expand
]
BATCH = 32


def main():
    import jax
    import jax.numpy as jnp

    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    def conv(x, k, out_dtype):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    def bf16_block(x, k, b):
        y = conv(x, k, jnp.float32)
        return jax.nn.relu(y + b).astype(x.dtype)

    def int8_core(xq, kq, scale, b):
        # int8 x int8 -> int32 conv, per-channel dequant in the epilogue
        y = conv(xq, kq, jnp.int32)
        return jax.nn.relu(y.astype(jnp.float32) * scale + b)

    def int8_dyn_block(x, kq, w_scale, b):
        # dynamic per-tensor activation quant: one maxabs reduce + cast
        s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        return int8_core(xq, kq, s * w_scale, b).astype(jnp.bfloat16)

    def make_int8_static_block(s_const):
        # calibrated (static) activation scale: no reduce; the
        # round/clip/cast pass is free to fuse into the producer epilogue
        inv = 1.0 / s_const

        def block(x, kq, w_scale, b):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                          -127, 127).astype(jnp.int8)
            return int8_core(xq, kq, s_const * w_scale, b
                             ).astype(jnp.bfloat16)
        return block

    def scan_of(block):
        # scan over PRE-GENERATED distinct inputs: chaining the output
        # back as carry breaks when cout != cin (the round-4 backlog run
        # crashed on 52x52 512->128), and distinct inputs per iteration
        # are required anyway (relay value-cache)
        @jax.jit
        def run(xs, *w):
            def body(acc, x):
                y = block(x, *w)
                return acc + y.astype(jnp.float32).mean(), None
            acc, _ = jax.lax.scan(body, 0.0, xs)
            return acc
        return run

    summary = []
    for h, w, cin, cout, ks, nsites in SHAPES:
        r = np.random.RandomState(1)
        x_f = (r.randn(BATCH, h, w, cin) * 0.5).astype(np.float32)
        k_f = (r.randn(ks, ks, cin, cout) * (cin ** -0.5)).astype(np.float32)
        b = jnp.asarray(r.randn(cout).astype(np.float32) * 0.1)

        x_bf = jnp.asarray(x_f, jnp.bfloat16)
        k_bf = jnp.asarray(k_f, jnp.bfloat16)
        # per-output-channel symmetric weight quant
        w_s = np.abs(k_f).max(axis=(0, 1, 2)) / 127.0 + 1e-12
        kq = jnp.asarray(
            np.clip(np.round(k_f / w_s), -127, 127).astype(np.int8))
        w_scale = jnp.asarray(w_s.astype(np.float32))
        tag = f"{h}x{w} {cin}->{cout} k{ks}"
        # correctness: int8 dynamic vs bf16 (quantization error bound)
        try:
            got = int8_dyn_block(x_bf, kq, w_scale, b)
            ref = bf16_block(x_bf, k_bf, b)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
            print(f"[{tag}] int8 rel err {err / sc:.4f}", flush=True)
        except Exception as e:  # int8 conv may be unsupported
            print(f"[{tag}] int8 conv FAILED: {e}", flush=True)
            continue

        s_static = float(np.abs(x_f).max() / 127.0)
        variants = [
            ("bf16", bf16_block, (x_bf, k_bf, b)),
            ("int8_dyn", int8_dyn_block, (x_bf, kq, w_scale, b)),
            ("int8_static", make_int8_static_block(s_static),
             (x_bf, kq, w_scale, b)),
        ]
        @functools.partial(jax.jit, static_argnames=("n",))
        def make_inputs(seed, n):
            def gen(i):
                return 0.5 * jax.random.normal(
                    jax.random.PRNGKey(seed + i),
                    (BATCH, h, w, cin), jnp.float32).astype(jnp.bfloat16)
            return jax.vmap(gen)(jnp.arange(n))

        # relay timing jitter is ~2-4 ms/dispatch; at sub-ms-per-iter
        # shapes a 10-iteration marginal drowns in it (the round-4 run's
        # negative marginals) -- use an 80-iteration span instead
        N_SHORT, N_LONG = 8, 88
        per_ms = {}
        for name, block, args in variants:
            run = scan_of(block)
            ts = {}
            for n in (N_SHORT, N_LONG):
                xs = make_inputs(11 + n, n)
                jax.block_until_ready(xs)
                t0 = time.monotonic()
                float(run(xs, *args[1:]))
                tc = time.monotonic() - t0
                best = 1e9
                for rep in range(1, 4):
                    xs = make_inputs(1000 + 31 * rep + n, n)
                    jax.block_until_ready(xs)
                    t0 = time.monotonic()
                    float(run(xs, *args[1:]))
                    best = min(best, time.monotonic() - t0)
                ts[n] = best
                del xs
                print(f"  {name} n={n}: compile+1st {tc:.1f}s, "
                      f"best {best * 1e3:.1f}ms", flush=True)
            per = (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
            per_ms[name] = per
            flops = 2 * BATCH * h * w * cin * cout * ks * ks
            print(f"  {name} [{tag}] marginal {per:.3f} ms "
                  f"({flops / per / 1e9:.1f} TFLOP/s eq, "
                  f"x{nsites} sites -> {per * nsites:.2f} ms)", flush=True)
        if "bf16" in per_ms:
            summary.append((tag, nsites, per_ms["bf16"],
                            per_ms.get("int8_dyn", float("nan")),
                            per_ms.get("int8_static", float("nan"))))

    print("\n== summary (ms marginal, b32) ==", flush=True)
    tot_bf = tot_dyn = tot_st = 0.0
    for tag, nsites, tb, td, ts_ in summary:
        tot_bf += tb * nsites
        tot_dyn += td * nsites
        tot_st += ts_ * nsites
        print(f"  {tag:24s} bf16 {tb:7.3f}  dyn {td:7.3f} "
              f"({tb / max(td, 1e-9):.2f}x)  static {ts_:7.3f} "
              f"({tb / max(ts_, 1e-9):.2f}x)  x{nsites}", flush=True)
    print(f"  model-population total: bf16 {tot_bf:.2f} ms vs "
          f"dyn {tot_dyn:.2f} ms vs static {tot_st:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
