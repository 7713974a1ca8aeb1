"""Orbax-backed training checkpoints.

Same contract as the reference's torch.save checkpoints
(/root/reference/train.py:159-207): every epoch write last_model, copy to
best_model on a new best IoU, and resume restores epoch / best IoU /
model / optimizer / scheduler state (the schedule here is pure step math,
so restoring the step count restores the LR).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

LAST_NAME = "last_model"
BEST_NAME = "best_model"


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(output_dir: str, name: str, tree: Dict[str, Any]):
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore a checkpoint; ``target`` (a matching pytree of arrays) guides
    structure/dtype restoration when provided."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


def checkpoint_exists(output_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(output_dir, name))


def promote_best(output_dir: str):
    """Copy last_model -> best_model (train.py:204-207)."""
    import shutil

    src = os.path.join(output_dir, LAST_NAME)
    dst = os.path.join(output_dir, BEST_NAME)
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
