"""Decompose the train step's `full - grad` = 8.2 ms optimizer-side gap.

tools/bench_train_parts.py showed full(180.5) - grad(172.3) = 8.24 ms,
while an adam-only scan measured ~0 (invalid: XLA folded the synthetic
grads into the update). This tool A/Bs REAL full train-step programs that
differ only in the optimizer/metrics tail, so every variant pays the same
fwd+bwd and the differences isolate:

  full          current production step (multi_transform Adam + metrics)
  nometrics     drop the per-step IoU/Pr@50 computation
  sgd           tx = sgd(1e-9): no m/v traffic (isolates Adam state IO)
  single_adam   one scale_by_adam + per-leaf group-lr scale (identical
                math to the two-group multi_transform; tests whether the
                masked double-chain costs runtime)

Marginal methodology as bench.py (scan n=2/12, difference), rbg dropout.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_opt_variants.py
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

    bench.BATCH = BATCH
    print("devices:", jax.devices(), flush=True)
    probe()

    model, variables = bench.build_model("RN50", fold_bn=False)
    cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                   "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})

    def single_adam_tx():
        # the PRODUCTION single-chain implementation
        # (cris_tpu/engine/trainer.py make_optimizer, opt_impl='single'),
        # not a re-implementation -- the A/B measures the real code path
        prev = os.environ.get("CRIS_OPT_IMPL")
        os.environ["CRIS_OPT_IMPL"] = "single"
        try:
            return make_optimizer(cfg, 1000)
        finally:
            if prev is None:
                os.environ.pop("CRIS_OPT_IMPL", None)
            else:
                os.environ["CRIS_OPT_IMPL"] = prev

    txs = {
        "full": make_optimizer(cfg, 1000),
        "nometrics": make_optimizer(cfg, 1000),
        "sgd": optax.sgd(1e-9),
        "single_adam": single_adam_tx(),
    }

    @partial(jax.jit, static_argnames=("n",))
    def make_batches(seed, n):
        def gen(i):
            k = jax.random.PRNGKey(seed + i)
            ki, kw, km = jax.random.split(k, 3)
            return (
                jax.random.normal(ki, (BATCH, 416, 416, 3), jnp.float32),
                jax.random.randint(kw, (BATCH, 17), 1, 49000, jnp.int32),
                (jax.random.uniform(km, (BATCH, 416, 416, 1)) > 0.5)
                .astype(jnp.float32),
            )
        return jax.vmap(gen)(jnp.arange(n))

    results = {}
    for name, tx in txs.items():
        state = jax.device_put(create_train_state(model, variables, tx))
        with_metrics = name != "nometrics"

        @partial(jax.jit, static_argnames=("n",))
        def run(state0, key, imgs, words, masks, n, _wm=with_metrics):
            def step(st, batch, k):
                def loss_fn(params):
                    (pred, tgt, loss), mutated = st.apply_fn(
                        {"params": params, "batch_stats": st.batch_stats},
                        batch["image"], batch["word"], batch["mask"],
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": k})
                    return loss, (pred, tgt, mutated["batch_stats"])

                (loss, (pred, tgt, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                st = st.apply_gradients(grads=grads, batch_stats=new_stats)
                if _wm:
                    iou, pr5 = train_metrics(pred, tgt)
                    return st, loss + iou * 0 + pr5 * 0
                return st, loss

            def body(st, batch):
                img, word, mask = batch
                st, out = step(
                    st, {"image": img, "word": word, "mask": mask},
                    jax.random.fold_in(key, st.step))
                return st, out

            st, losses = jax.lax.scan(body, state0, (imgs, words, masks))
            return losses.sum()

        def timed(n, seed, _run=run, _state=state):
            batches = make_batches(seed, n)
            jax.block_until_ready(batches)
            t0 = time.monotonic()
            out = _run(_state, jax.random.key(seed, impl="rbg"), *batches,
                       n=n)
            np.asarray(out)
            return time.monotonic() - t0

        results[name] = marginal(timed, name)

    print("\n== optimizer-variant decomposition (ms/iter) ==", flush=True)
    for k, v in results.items():
        print(f"  {k:12s} {v:8.2f}", flush=True)
    print(f"\n  metrics cost        = "
          f"{results['full'] - results['nometrics']:.2f}")
    print(f"  adam m/v traffic    = {results['full'] - results['sgd']:.2f}")
    print(f"  multi_transform tax = "
          f"{results['full'] - results['single_adam']:.2f}")


if __name__ == "__main__":
    main()
