"""Validate the persistent XLA compilation cache on the live backend.

VERDICT r2 task 7: every train-program run pays 80-240 s of remote
compile; jax's compilation-cache directory should let a second process
skip it. This tool measures "time to first result" for the same
nontrivial program in this process, to be run twice in a row:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/cache_check.py cold
    PYTHONPATH=/root/repo:/root/.axon_site python tools/cache_check.py warm

Pass = the warm run's compile+first-dispatch is a small fraction of the
cold run's. Uses the same cache setup as train.py/test.py
(cris_tpu.cli.setup_compilation_cache).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    os.environ.setdefault("CRIS_COMPILE_CACHE",
                          "/tmp/cris_cache_check")  # isolated from ~/.cache

    from cris_tpu import cli

    cli.setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"[{label}] devices: {jax.devices()}", flush=True)

    # probe: trivial dispatch to absorb any relay stall before timing
    t0 = time.monotonic()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8).astype(np.float32))
    float((x @ x).sum())
    print(f"[{label}] probe dispatch: {time.monotonic() - t0:.1f}s", flush=True)

    # a distinctive mid-size program: conv stack + matmul chain, shapes
    # chosen to be unique to this tool so no other run pre-warms it
    def prog(a, w1, w2, k):
        y = jax.lax.conv_general_dilated(
            a, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y)
        for _ in range(6):
            y = jnp.einsum("bhwc,cd->bhwd", y, w1)
            y = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", y, w2))
        return y.mean()

    rng = np.random.RandomState(1)
    bf16 = lambda x: jnp.asarray(x.astype(np.float32), jnp.bfloat16)
    a = bf16(rng.randn(4, 24, 24, 192))
    w1 = bf16(rng.randn(192, 384))
    w2 = bf16(rng.randn(384, 192))
    k = bf16(rng.randn(3, 3, 192, 192))

    t0 = time.monotonic()
    fn = jax.jit(prog)
    v = float(fn(a, w1, w2, k))
    t_first = time.monotonic() - t0
    t0 = time.monotonic()
    float(fn(a, w1, w2, k))
    t_again = time.monotonic() - t0
    print(f"[{label}] first-call (compile+dispatch): {t_first:.2f}s, "
          f"steady dispatch: {t_again:.2f}s, value={v:.4f}", flush=True)


if __name__ == "__main__":
    main()
