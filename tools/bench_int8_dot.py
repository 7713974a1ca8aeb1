"""int8 dot_general microbench at the decoder/attnpool shapes (VERDICT
r4 task 8).

The eval step's non-conv residual is ~4.0 ms and is now ~12% of the int8
step (growing as convs quantize). The matmul part of it is the decoder's
attention projections + FFN dots and the attnpool projections. v5e int8
MXU peak is 2x bf16 -- this measures whether XLA's int8 dot_general
path realizes it at these (M, K, N), including the quantize/dequant
passes a real static-scale site would pay.

Rows (b32, S=676=26^2 decoder tokens, E=512, FFN=2048; attnpool
S=170=13^2+1, E=2048):
    matches /root/reference/model/layers.py:87-250 (attnpool + decoder
    linears).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_int8_dot.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SHORT, N_LONG = 8, 56


def main():
    import jax
    import jax.numpy as jnp

    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    r = np.random.RandomState(0)

    def bf16_form(x, k, _s):
        return jnp.dot(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))

    def int8_form(x, k, scale):
        # static-scale PTQ semantics: per-tensor act scale (calibrated),
        # per-column weight scales; int32 accumulation
        kf = k.astype(jnp.float32)
        ks = jnp.max(jnp.abs(kf), axis=0) / 127.0 + 1e-12
        kq = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, kq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (scale * ks)).astype(jnp.bfloat16)

    @partial(jax.jit, static_argnames=("n", "form"))
    def run(xb, k, n, form):
        fn = {"bf16": bf16_form, "int8": int8_form}[form]

        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xb, i % 4, 0, keepdims=False)
            return acc + fn(x, k, 0.02).astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, n, body, 0.0)

    def bench(label, m, kk, nn):
        k = jnp.asarray((r.randn(kk, nn) * kk ** -0.5).astype(np.float32)
                        ).astype(jnp.bfloat16)
        gflops = 2 * m * kk * nn / 1e9
        out = {}
        for form in ("bf16", "int8"):
            def make_x(seed):
                def gen(i):
                    return jax.random.normal(
                        jax.random.PRNGKey(seed + i), (m, kk),
                        jnp.float32).astype(jnp.bfloat16)
                return jax.vmap(gen)(jnp.arange(4))

            ts = {}
            for n in (N_SHORT, N_LONG):
                xb = make_x(11 + n)
                jax.block_until_ready(xb)
                t0 = time.monotonic()
                float(run(xb, k, n, form))
                tc = time.monotonic() - t0
                best = 1e9
                for rep in range(3):
                    xb = make_x(1000 + 31 * rep + n)
                    jax.block_until_ready(xb)
                    t0 = time.monotonic()
                    float(run(xb, k, n, form))
                    best = min(best, time.monotonic() - t0)
                ts[n] = best
            ms = (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
            out[form] = ms
            print(f"  {label:40s} {form}: {ms:7.3f} ms "
                  f"{gflops / ms:6.1f} TF/s (compile {tc:.1f}s)", flush=True)
        if out["bf16"] > 0:
            print(f"  {label:40s} int8/bf16 = "
                  f"{out['int8'] / out['bf16']:.2f}x", flush=True)

    B, S, E, F = 32, 676, 512, 2048
    bench(f"dec FFN up   ({B * S}x{E}x{F})", B * S, E, F)
    bench(f"dec FFN down ({B * S}x{F}x{E})", B * S, F, E)
    bench(f"dec attn proj ({B * S}x{E}x{E})", B * S, E, E)
    bench(f"attnpool proj ({B * 170}x2048x512)", B * 170, 2048, 512)
    bench(f"attnpool in   ({B * 170}x2048x2048)", B * 170, 2048, 2048)


if __name__ == "__main__":
    main()
