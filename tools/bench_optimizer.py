"""Microbench the optimizer update in isolation (R50 param tree, b32).

The round-3 decomposition pegged optimizer+metrics at 8.2 ms/step
(full - grad); the earlier adam-only scan returned st.step and was
dead-code-eliminated, so this one forces the updated params live.
Variants: the production multi_transform two-group Adam, plain
optax.adam, Adam with bf16 first moment (mu_dtype), and train_metrics
alone.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_optimizer.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32


def main():
    from cris_tpu import cli

    cli.setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from cris_tpu.engine.metrics import train_metrics
    from cris_tpu.engine.trainer import create_train_state, make_optimizer
    from cris_tpu.utils.config import CfgNode

    from tools._bench_common import marginal, probe

    print("devices:", jax.devices(), flush=True)
    probe()

    model, variables = bench.build_model("RN50", fold_bn=False)
    cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                   "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})

    nparam = sum(np.prod(l.shape) for l in
                 jax.tree_util.tree_leaves(variables["params"]))
    print(f"params: {nparam / 1e6:.1f}M", flush=True)

    def bench_tx(label, tx):
        state = jax.device_put(create_train_state(model, variables, tx))

        @partial(jax.jit, static_argnames=("n",))
        def run(state0, seeds, n):
            def body(st, s):
                scale = (s.astype(jnp.float32) + 1.0) * 1e-9
                grads = jax.tree_util.tree_map(
                    lambda p: (p * scale).astype(p.dtype), st.params)
                st = st.apply_gradients(grads=grads,
                                        batch_stats=st.batch_stats)
                return st, None
            st, _ = jax.lax.scan(body, state0, seeds)
            # keep the whole update live
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(st.params))

        def timed(n, seed):
            seeds = jnp.arange(seed, seed + n)
            t0 = time.monotonic()
            float(run(state, seeds, n=n))
            return time.monotonic() - t0

        return marginal(timed, label)

    bench_tx("multi_transform (production)", make_optimizer(cfg, 1000))
    bench_tx("plain adam", optax.adam(1e-4))
    bench_tx("adam mu_dtype=bf16",
             optax.adam(1e-4, mu_dtype=jnp.bfloat16))

    # metrics alone
    @partial(jax.jit, static_argnames=("n",))
    def run_metrics(seeds, n):
        def body(acc, s):
            k = jax.random.PRNGKey(s)
            pred = jax.random.normal(k, (BATCH, 104, 104, 1))
            tgt = (jax.random.uniform(k, (BATCH, 104, 104, 1)) > 0.5)
            iou, pr5 = train_metrics(pred, tgt.astype(jnp.float32))
            return acc + iou + pr5, None
        acc, _ = jax.lax.scan(body, 0.0, seeds)
        return acc

    def timed_metrics(n, seed):
        t0 = time.monotonic()
        float(run_metrics(jnp.arange(seed, seed + n), n=n))
        return time.monotonic() - t0

    marginal(timed_metrics, "train_metrics")


if __name__ == "__main__":
    main()
