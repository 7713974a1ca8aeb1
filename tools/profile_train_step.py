"""Device-op profile of ONE train_step dispatch (not the scan bench).

tools/profile_eval.py --train profiles the bench's lax.scan-over-batches
program, where the whole train step hides inside one opaque `while` op
(the TPU op lane does not expand loop bodies) -- its category table is
useless for train. This tool jits a SINGLE train_step dispatch (the
nn.scan stage/decoder loops are fully unrolled at the production
scan_unroll=0 default, so every op is visible) and reuses
profile_eval's trace aggregation.

Target: the round-4 train50 conv audit puts the non-conv residual at
~60-70 ms of the ~146 ms step -- this tool says where it goes.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/profile_train_step.py [--batch 32] [--steps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="RN50")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/cris_prof_train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from cris_tpu.engine.trainer import (
        create_train_state,
        make_optimizer,
        train_step,
    )
    from cris_tpu.utils import root_key
    from cris_tpu.utils.config import CfgNode
    from tools._bench_common import probe
    from tools.profile_eval import aggregate

    print("devices:", jax.devices(), flush=True)
    probe()

    model, variables = bench.build_model(args.preset, fold_bn=False)
    cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                   "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})
    state = create_train_state(model, variables, make_optimizer(cfg, 1000))
    state = jax.device_put(state)
    rng = root_key(42)

    step = jax.jit(train_step, donate_argnums=(0,))

    def batch(seed):
        k = jax.random.PRNGKey(seed)
        ki, kw, km = jax.random.split(k, 3)
        b = args.batch
        return {
            "image": jax.random.normal(ki, (b, 416, 416, 3), jnp.float32),
            "word": jax.random.randint(kw, (b, 17), 1, 49000, jnp.int32),
            "mask": (jax.random.uniform(km, (b, 416, 416, 1)) > 0.5
                     ).astype(jnp.float32),
        }

    t0 = time.monotonic()
    state, m = step(state, batch(0), rng)
    float(m["loss"])
    print(f"compile+1st: {time.monotonic() - t0:.1f}s", flush=True)
    t0 = time.monotonic()
    state, m = step(state, batch(1), rng)
    float(m["loss"])
    print(f"warm step: {time.monotonic() - t0 :.3f}s", flush=True)

    jax.profiler.start_trace(args.outdir)
    for i in range(args.steps):
        t0 = time.monotonic()
        state, m = step(state, batch(100 + i), rng)
        float(m["loss"])
        print(f"traced step {i}: {time.monotonic() - t0:.3f}s", flush=True)
    jax.profiler.stop_trace()

    aggregate(args.outdir, args.steps)


if __name__ == "__main__":
    main()
