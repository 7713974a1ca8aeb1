"""Orbax-backed training checkpoints.

Same contract as the reference's torch.save checkpoints
(/root/reference/train.py:159-207): every epoch write last_model, copy to
best_model on a new best IoU; resume restores epoch / best IoU / model /
optimizer state (the LR schedule is pure step math, so restoring the step
count restores the LR).

Each checkpoint directory holds two orbax items:
  <name>/model -- {params, batch_stats}           (all eval needs)
  <name>/train -- {opt_state, step, epoch, best_iou, cur_iou, prec}
so evaluation never has to reconstruct optimizer structure, and resume
restores the optimizer state *typed* by passing the live opt_state as the
abstract target.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

LAST_NAME = "last_model"
BEST_NAME = "best_model"
MODEL_ITEM = "model"
TRAIN_ITEM = "train"


def _save_item(path: str, tree):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def _restore_item(path: str, target=None):
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


def save_checkpoint(
    output_dir: str,
    name: str,
    model_tree: Dict[str, Any],
    train_tree: Optional[Dict[str, Any]] = None,
) -> str:
    base = os.path.abspath(os.path.join(output_dir, name))
    _save_item(os.path.join(base, MODEL_ITEM), model_tree)
    if train_tree is not None:
        _save_item(os.path.join(base, TRAIN_ITEM), train_tree)
    return base


def restore_model(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore {params, batch_stats} from a checkpoint directory.

    Model trees are plain nested dicts of arrays, so this restores raw and
    merges into ``target``: leaves present in the checkpoint win; leaves
    missing from it (e.g. params added to the code after the checkpoint was
    written) keep the target's values, with a warning.
    """
    raw = _restore_item(os.path.join(os.path.abspath(path), MODEL_ITEM), None)
    if target is None:
        return raw

    from ..utils.logging import logger

    missing = []

    def merge(tgt, src, prefix=""):
        if not isinstance(tgt, dict):
            return tgt if src is None else src
        out = {}
        for k, v in tgt.items():
            sub = src.get(k) if isinstance(src, dict) else None
            if sub is None and not isinstance(v, dict):
                missing.append(prefix + str(k))
                out[k] = v
            else:
                out[k] = merge(v, sub, prefix + str(k) + "/")
        return out

    merged = merge(target, raw)
    if missing:
        logger.warning(
            f"checkpoint missing {len(missing)} leaves (kept init values): "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''}"
        )
    return merged


def restore_train(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore optimizer/progress state; pass the live train tree as target
    so optax structures come back typed."""
    return _restore_item(os.path.join(os.path.abspath(path), TRAIN_ITEM), target)


def checkpoint_exists(output_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(output_dir, name, MODEL_ITEM))


def promote_best(output_dir: str):
    """Copy last_model -> best_model (train.py:204-207)."""
    import shutil

    src = os.path.join(output_dir, LAST_NAME)
    dst = os.path.join(output_dir, BEST_NAME)
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
