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
    """Return the configured seed, or draw one (shared implicitly because all
    processes run the same program under single-controller JAX)."""
    if seed is not None:
        return int(seed)
    return int(np.random.randint(2**31))


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def epoch_key(seed: int, epoch: int) -> jax.Array:
    """A deterministic per-epoch key (replaces DistributedSampler.set_epoch)."""
    return jax.random.fold_in(root_key(seed), epoch)


def worker_seed(seed: int, num_workers: int, process_index: int, worker_id: int) -> int:
    """Per-dataloader-worker numpy seed, same derivation as the reference
    (num_workers * rank + worker_id + seed)."""
    return num_workers * process_index + worker_id + seed
