"""Microbench dynamic_conv2d fwd and fwd+bwd at the projector head shape.

The contract-first rewrite took the fwd from 5.5 to 3.5 ms standalone
(round 2); its BWD was never measured. dw = correlate(x, dy) and
dx = scatter of per-tap planes may both re-read the 177 MB activation.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_dynconv.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32


def main():
    import jax
    import jax.numpy as jnp

    from cris_tpu.ops.dynamic_conv import dynamic_conv2d
    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()
    r = np.random.RandomState(0)

    bf = lambda a: jnp.asarray(a.astype(np.float32), jnp.bfloat16)
    x0 = bf(r.randn(BATCH, 104, 104, 256) * 0.5)
    w0 = bf(r.randn(BATCH, 256, 3, 3) * 0.06)
    b0 = jnp.asarray(r.randn(BATCH).astype(np.float32))

    @partial(jax.jit, static_argnums=0)
    def run_fwd(n, x, w, b):
        def body(carry, _):
            y = dynamic_conv2d(carry, w, b)
            return (carry * 0.999 + y.astype(carry.dtype) * 1e-3), y.mean()
        _, ms = jax.lax.scan(body, x, None, length=n)
        return ms.sum()

    @partial(jax.jit, static_argnums=0)
    def run_grad(n, x, w, b):
        def loss(xx, ww):
            return dynamic_conv2d(xx, ww, b).astype(jnp.float32).sum()

        def body(carry, _):
            l, (gx, gw) = jax.value_and_grad(
                lambda xx, ww: loss(xx, ww), argnums=(0, 1))(carry, w)
            return (carry * 0.999 + gx * 1e-6).astype(carry.dtype), \
                l + gw.astype(jnp.float32).sum() * 1e-9
        _, ms = jax.lax.scan(body, x, None, length=n)
        return ms.sum()

    for label, run in (("fwd", run_fwd), ("fwd+bwd", run_grad)):
        ts = {}
        for n in (2, 12):
            float(run(n, x0, w0, b0))
            best = 1e9
            for rep in range(3):
                # rolled input per dispatch: the relay value-caches
                # identical dispatches (CLAUDE.md)
                xv = jnp.roll(x0, rep, axis=1)
                jax.block_until_ready(xv)
                t0 = time.monotonic()
                float(run(n, xv, w0, b0))
                best = min(best, time.monotonic() - t0)
            ts[n] = best
        print(f"  dynamic_conv {label}: "
              f"{(ts[12] - ts[2]) / 10 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
