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
    return jax.random.PRNGKey(seed)


def epoch_key(seed: int, epoch: int) -> jax.Array:
    """A deterministic per-epoch key (replaces DistributedSampler.set_epoch)."""
    return jax.random.fold_in(root_key(seed), epoch)


def worker_seed(seed: int, num_workers: int, process_index: int, worker_id: int) -> int:
    """Per-dataloader-worker numpy seed, same derivation as the reference
    (num_workers * rank + worker_id + seed)."""
    return num_workers * process_index + worker_id + seed
