"""Segmentation metrics, device- and host-side.

Device: per-batch train IoU / Pr@50 on the 104x104 prediction grid
(/root/reference/utils/misc.py:114-129 -- sigmoid, 0.35 binarization,
union + 1e-6). Host: eval IoU at original image resolution after the
inverse warp, plus Pr@{50..90} (/root/reference/engine/engine.py:117-139).
Under global-batch jit the device means are already global -- the
reference's explicit dist.all_reduce (engine.py:61-66) disappears.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

EVAL_THRESHOLD = 0.35
UNION_EPS = 1e-6


def train_metrics(
    pred_logits: jnp.ndarray, target: jnp.ndarray,
    threshold: float = EVAL_THRESHOLD, pr_iou: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(batch mean IoU x100, Pr@pr_iou x100), computed in fp32 on device."""
    b = pred_logits.shape[0]
    probs = jnp.reshape(
        jnp.asarray(pred_logits, jnp.float32), (b, -1)
    )
    probs = 1.0 / (1.0 + jnp.exp(-probs))
    pred = probs >= threshold
    # reference uses target.bool(): ANY nonzero value is foreground (matters
    # for linearly-warped masks with fractional boundary pixels)
    tgt = jnp.reshape(target, (b, -1)) > 0
    inter = jnp.sum(pred & tgt, axis=1).astype(jnp.float32)
    union = jnp.sum(pred | tgt, axis=1).astype(jnp.float32)
    ious = inter / (union + UNION_EPS)
    return 100.0 * jnp.mean(ious), 100.0 * jnp.mean((ious > pr_iou).astype(jnp.float32))


def val_metric(
    pred_logits: jnp.ndarray, target: jnp.ndarray, threshold: float = EVAL_THRESHOLD
) -> jnp.ndarray:
    """Per-sample IoUs at prediction resolution (reference ValMetricGPU,
    utils/misc.py:132-143 -- kept for API completeness)."""
    b = pred_logits.shape[0]
    probs = 1.0 / (1.0 + jnp.exp(-jnp.reshape(
        jnp.asarray(pred_logits, jnp.float32), (b, -1)
    )))
    pred = probs >= threshold
    tgt = jnp.reshape(target, (b, -1)) > 0  # target.bool() semantics
    inter = jnp.sum(pred & tgt, axis=1).astype(jnp.float32)
    union = jnp.sum(pred | tgt, axis=1).astype(jnp.float32)
    return inter / (union + UNION_EPS)


def intersection_and_union(
    pred_logits: jnp.ndarray, target: jnp.ndarray, threshold: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Foreground intersection/union areas (reference
    intersectionAndUnionGPU, utils/misc.py:146-165 -- histogram semantics
    reduced to the binary case it is used for)."""
    probs = 1.0 / (1.0 + jnp.exp(-jnp.asarray(pred_logits, jnp.float32)))
    pred = (probs >= threshold).reshape(-1)
    tgt = (jnp.asarray(target, jnp.float32) > 0).reshape(-1)
    inter = jnp.sum(pred & tgt).astype(jnp.float32)
    union = jnp.sum(pred).astype(jnp.float32) + jnp.sum(tgt).astype(jnp.float32) - inter
    return inter, union


def mask_iou(pred_bool: np.ndarray, mask: np.ndarray) -> float:
    """Host-side IoU between a binarized prediction and a {0,1} GT mask
    (engine.py:121-123)."""
    inter = np.logical_and(pred_bool, mask)
    union = np.logical_or(pred_bool, mask)
    return float(np.sum(inter) / (np.sum(union) + UNION_EPS))


def mask_inter_union(pred_bool: np.ndarray, mask: np.ndarray):
    """(intersection, union) pixel counts -- accumulated across the dataset
    they yield overall IoU (oIoU), the second headline metric of the
    referring-segmentation literature."""
    inter = int(np.logical_and(pred_bool, mask).sum())
    union = int(np.logical_or(pred_bool, mask).sum())
    return inter, union


def summarize_ious(iou_list: Sequence[float]) -> Tuple[float, Dict[str, float]]:
    """(mean IoU, {Pr@50..Pr@90}) over per-sample IoUs (engine.py:127-139)."""
    ious = np.asarray(iou_list, np.float64)
    prec = {}
    for i, thres in enumerate(np.arange(0.5, 1.0, 0.1)):
        prec[f"Pr@{(i + 5) * 10}"] = float((ious > thres).mean())
    return float(ious.mean()), prec
