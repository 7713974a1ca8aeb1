"""Standalone TPU microbench: Pallas fused bottleneck vs the XLA chain.

Microbench-first discipline (CLAUDE.md attribution caveat): measure the
kernel in isolation at the real model stage shapes BEFORE wiring it into
clip_resnet. Marginal-scan methodology: one jitted lax.scan over n
device-resident iterations, timed at n_lo and n_hi; the difference
cancels the relay's fixed dispatch cost. Inputs are perturbed per
iteration (carry feedback) so the terminal's value-cache can't fire.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_bottleneck.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# (h, w, c, mid, n_blocks_in_model) -- R50 @ 416: layer2 has 3 stride-1
# tails, layer3 has 5, layer4 has 2. layer1 (mid 64) stays on XLA.
SHAPES = [
    (52, 52, 512, 128, 3),
    (26, 26, 1024, 256, 5),
    (13, 13, 2048, 512, 2),
]
BATCH = 32


def main():
    import jax
    import jax.numpy as jnp
    from cris_tpu.ops.pallas.bottleneck import fused_bottleneck

    print("devices:", jax.devices(), flush=True)

    from tools._bench_common import probe

    probe()

    def xla_block(x, w1, b1, w2, b2, w3, b3):
        h1 = jax.nn.relu(jnp.einsum("bhwc,cm->bhwm", x, w1) + b1).astype(x.dtype)
        k = w2.reshape(3, 3, w2.shape[1], w2.shape[2])
        h2 = jax.lax.conv_general_dilated(
            h1, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h2 = jax.nn.relu(h2 + b2).astype(x.dtype)
        h3 = jnp.einsum("bhwm,mc->bhwc", h2, w3,
                        preferred_element_type=jnp.float32) + b3
        return jax.nn.relu(h3 + x.astype(jnp.float32)).astype(x.dtype)

    for h, w, c, mid, nblk in SHAPES:
        r = np.random.RandomState(1)
        bf = lambda a: jnp.asarray(a.astype(np.float32), jnp.bfloat16)
        x0 = bf(r.randn(BATCH, h, w, c) * 0.5)
        w1 = bf(r.randn(c, mid) * (c ** -0.5))
        b1 = jnp.asarray(r.randn(mid).astype(np.float32) * 0.1)
        w2 = bf(r.randn(9, mid, mid) * (mid ** -0.5) * 0.33)
        b2 = jnp.asarray(r.randn(mid).astype(np.float32) * 0.1)
        w3 = bf(r.randn(mid, c) * (mid ** -0.5))
        b3 = jnp.asarray(r.randn(c).astype(np.float32) * 0.1)
        args = (w1, b1, w2, b2, w3, b3)

        def scan_of(block):
            import functools

            @functools.partial(jax.jit, static_argnums=0)
            def run(n_iters, x, *wts):
                def body(carry, _):
                    y = block(carry, *wts)
                    # perturb so iterations differ & can't be value-cached
                    return (0.9 * y + 0.1 * x).astype(x.dtype), y.mean()
                _, ms = jax.lax.scan(body, x, None, length=n_iters)
                return ms.sum()
            return run

        # correctness cross-check on-device first
        got = fused_bottleneck(x0, *args)
        ref = xla_block(x0, *args)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
        print(f"[{h}x{w}x{c} mid={mid}] max-abs-err {err:.4f} "
              f"(rel {err / scale:.5f})", flush=True)

        for name, block in (("xla", xla_block),
                            ("pallas", lambda xx, *a: fused_bottleneck(xx, *a))):
            run = scan_of(block)
            ts = {}
            for n in (2, 12):
                t0 = time.monotonic()
                float(run(n, x0, *args))
                t_compile = time.monotonic() - t0
                best = 1e9
                for rep in range(3):
                    # rolled input per dispatch: the relay value-caches
                    # identical dispatches (CLAUDE.md)
                    xv = jnp.roll(x0, rep, axis=1)
                    jax.block_until_ready(xv)
                    t0 = time.monotonic()
                    float(run(n, xv, *args))
                    best = min(best, time.monotonic() - t0)
                ts[n] = best
                print(f"  {name} n={n}: compile+1st {t_compile:.1f}s, "
                      f"best {best * 1e3:.1f}ms", flush=True)
            per = (ts[12] - ts[2]) / 10 * 1e3
            print(f"  {name} [{h}x{w}x{c} mid={mid}] marginal "
                  f"{per:.3f} ms/block  (model site: {nblk} blocks -> "
                  f"{per * nblk:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
