"""Decompose the R50 train step cost with standalone marginal scans.

The train-step device profile hides ~50% of the time inside an opaque
`while` op (the nn.scan'd layer stacks), and round-2 proved per-fusion
attribution untrustworthy. This measures component programs directly:

  full      train_step (fwd+bwd+Adam+metrics)   -- the 183 ms baseline
  fwd_eval  fwd, train=False (no BN stats, no dropout)
  fwd_train fwd, train=True (BN batch stats + dropout)
  grad      fwd+bwd only (no optimizer)
  grad_nd   fwd+bwd with dropout=0.0            -- isolates dropout cost
  text_grad text-encoder-only fwd+bwd           -- the 12 scanned resblocks
  adam      optimizer update only (fixed-structure grads)

Marginal methodology as bench.py: jitted lax.scan over n device-resident
iterations at n=2/12, difference cancels dispatch cost; inputs vary per
iteration.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_train_parts.py
"""

import dataclasses
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

    import bench
    from cris_tpu.engine.trainer import (
        create_train_state, make_optimizer, train_step,
    )
    from cris_tpu.utils.config import CfgNode
    from tools._bench_common import marginal, probe

    bench.BATCH = BATCH
    print("devices:", jax.devices(), flush=True)
    probe()

    model, variables = bench.build_model("RN50", fold_bn=False)
    model_nd = dataclasses.replace(model, dropout=0.0)
    cfg = CfgNode({"base_lr": 1e-4, "lr_multi": 0.1, "milestones": [35],
                   "lr_decay": 0.1, "weight_decay": 0.0, "max_norm": 0.0})
    state = jax.device_put(
        create_train_state(model, variables, make_optimizer(cfg, 1000)))

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

    def timed_scan(jitted, keyfn=None):
        keyfn = keyfn or jax.random.PRNGKey

        def timed(n, seed):
            batches = make_batches(seed, n)
            jax.block_until_ready(batches)
            t0 = time.monotonic()
            out = jitted(state, keyfn(seed), *batches, n=n)
            jax.tree_util.tree_map(
                lambda a: np.asarray(a) if hasattr(a, "shape") else a,
                out)  # force real D2H sync
            return time.monotonic() - t0
        return timed

    results = {}

    # ---- full train step
    @partial(jax.jit, static_argnames=("n",), donate_argnums=())
    def run_full(state0, key, imgs, words, masks, n):
        def body(st, batch):
            img, word, mask = batch
            st, metrics = train_step(st, {"image": img, "word": word,
                                          "mask": mask}, key)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state0, (imgs, words, masks))
        return losses.sum()

    results["full"] = marginal(timed_scan(run_full), "full")

    # ---- forward only, eval semantics (no BN-stat update, no dropout)
    def fwd_only(train, mdl):
        @partial(jax.jit, static_argnames=("n",))
        def run(state0, key, imgs, words, masks, n):
            def body(acc, batch):
                img, word, mask, i = batch
                if train:
                    (pred, tgt, loss), _ = mdl.apply(
                        {"params": state0.params,
                         "batch_stats": state0.batch_stats},
                        img, word, mask, train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.fold_in(key, i)})
                else:
                    pred, tgt, loss = mdl.apply(
                        {"params": state0.params,
                         "batch_stats": state0.batch_stats},
                        img, word, mask, train=False)
                return acc + loss, None
            acc, _ = jax.lax.scan(body, 0.0,
                                  (imgs, words, masks, jnp.arange(n)))
            return acc
        return run

    results["fwd_eval"] = marginal(timed_scan(fwd_only(False, model)),
                                   "fwd_eval")
    results["fwd_train"] = marginal(timed_scan(fwd_only(True, model)),
                                    "fwd_train")

    # ---- fwd+bwd without the optimizer
    def grad_only(mdl):
        @partial(jax.jit, static_argnames=("n",))
        def run(state0, key, imgs, words, masks, n):
            def loss_fn(params, img, word, mask, k):
                (pred, tgt, loss), _ = mdl.apply(
                    {"params": params, "batch_stats": state0.batch_stats},
                    img, word, mask, train=True,
                    mutable=["batch_stats"], rngs={"dropout": k})
                return loss

            def body(acc, batch):
                img, word, mask, i = batch
                loss, grads = jax.value_and_grad(loss_fn)(
                    state0.params, img, word, mask,
                    jax.random.fold_in(key, i))
                gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return acc + loss + gsum * 1e-12, None
            acc, _ = jax.lax.scan(body, 0.0,
                                  (imgs, words, masks, jnp.arange(n)))
            return acc
        return run

    results["grad"] = marginal(timed_scan(grad_only(model)), "grad")
    results["grad_nodrop"] = marginal(timed_scan(grad_only(model_nd)),
                                      "grad_nodrop")
    # same program, rbg PRNG for the dropout bits (threefry bit-gen is the
    # suspected dropout cost; rbg generates bits ~10x cheaper on TPU)
    results["grad_rbg"] = marginal(
        timed_scan(grad_only(model), lambda s_: jax.random.key(s_, impl="rbg")),
        "grad_rbg")

    # ---- text encoder only, fwd+bwd (encode_text lives on the CLIP
    # submodule; reach it through CRIS.apply's method hook)
    @partial(jax.jit, static_argnames=("n",))
    def run_text(state0, key, imgs, words, masks, n):
        def loss_fn(params, word):
            def call_text(mdl, w):
                return mdl.backbone.encode_text(w)

            out = model.apply(
                {"params": params, "batch_stats": state0.batch_stats},
                word, method=call_text)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in jax.tree_util.tree_leaves(out))

        def body(acc, batch):
            _, word, _ = batch
            loss, grads = jax.value_and_grad(loss_fn)(state0.params, word)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return acc + loss + gsum * 1e-12, None
        acc, _ = jax.lax.scan(body, 0.0, (imgs, words, masks))
        return acc

    results["text_grad"] = marginal(timed_scan(run_text), "text_grad")

    # ---- optimizer update only
    @partial(jax.jit, static_argnames=("n",))
    def run_adam(state0, key, imgs, words, masks, n):
        def body(st, batch):
            img, _, _ = batch
            scale = img[0, 0, 0, 0] * 1e-6  # varies per iteration
            grads = jax.tree_util.tree_map(
                lambda p: (p * scale).astype(p.dtype), st.params)
            st = st.apply_gradients(grads=grads,
                                    batch_stats=st.batch_stats)
            return st, None
        st, _ = jax.lax.scan(body, state0, (imgs, words, masks))
        return st.step

    results["adam"] = marginal(timed_scan(run_adam), "adam")

    print("\n== decomposition (ms/iter) ==", flush=True)
    for k, v in results.items():
        print(f"  {k:12s} {v:8.2f}", flush=True)
    print(f"\n  bwd  = grad - fwd_train       = "
          f"{results['grad'] - results['fwd_train']:.2f}")
    print(f"  dropout cost (fwd+bwd)        = "
          f"{results['grad'] - results['grad_nodrop']:.2f}")
    print(f"  rbg-PRNG dropout saving       = "
          f"{results['grad'] - results['grad_rbg']:.2f}")
    print(f"  BN-stats+dropout fwd overhead = "
          f"{results['fwd_train'] - results['fwd_eval']:.2f}")
    print(f"  optimizer (full - grad)       = "
          f"{results['full'] - results['grad']:.2f}  (adam-only scan: "
          f"{results['adam']:.2f})")


if __name__ == "__main__":
    main()
