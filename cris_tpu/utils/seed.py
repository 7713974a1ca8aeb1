"""Reproducibility helpers: a single JAX PRNG key tree per run.

The reference broadcasts a random seed across ranks and derives per-worker
seeds (/root/reference/utils/misc.py:14-43,61-66). Single-controller JAX
needs no broadcast -- every process derives the same key from the config
seed; data-loader workers fold in their worker id.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init_random_seed(seed: Optional[int] = None) -> int:
    """Return the configured seed, or draw one and broadcast it from process
    0 so every host shares it (the reference's dist.broadcast at
    utils/misc.py:26-31; a host-varying seed would shuffle different
    permutations per host and diverge the jitted computation)."""
    if seed is not None:
        return int(seed)
    seed = int(np.random.randint(2**31))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        seed = int(
            multihost_utils.broadcast_one_to_all(np.asarray(seed, np.int32))
        )
    return seed


def root_key(seed: int) -> jax.Array:
    """The run's root PRNG key.

    Defaults to the 'rbg' generator: threefry bit-generation for the
    decoder's dropout masks costs ~25 ms of the 180 ms R50 b32 train step
    on v5e (tools/bench_train_parts.py round-3 measurement); rbg lowers
    to the TPU's native PRNG and removes essentially all of it. Dropout
    masks are reproducible per (seed, step) under either impl but differ
    between impls; set CRIS_PRNG_IMPL=threefry2x32 to get JAX's default
    stream back."""
    import os

    impl = os.environ.get("CRIS_PRNG_IMPL", "rbg")
    return jax.random.key(seed, impl=impl)


def epoch_key(seed: int, epoch: int) -> jax.Array:
    """A deterministic per-epoch key (replaces DistributedSampler.set_epoch)."""
    return jax.random.fold_in(root_key(seed), epoch)


def worker_seed(seed: int, num_workers: int, process_index: int, worker_id: int) -> int:
    """Per-dataloader-worker numpy seed, same derivation as the reference
    (num_workers * rank + worker_id + seed)."""
    return num_workers * process_index + worker_id + seed
