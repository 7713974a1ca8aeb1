from .evaluator import Evaluator
from .metrics import (
    EVAL_THRESHOLD,
    intersection_and_union,
    mask_iou,
    summarize_ious,
    train_metrics,
    val_metric,
)
from .trainer import (
    TrainState,
    create_train_state,
    lr_at_epoch,
    make_jitted_train_step,
    make_optimizer,
    multistep_schedule,
    train_epoch,
    train_step,
)

__all__ = [
    "Evaluator",
    "EVAL_THRESHOLD",
    "mask_iou",
    "val_metric",
    "intersection_and_union",
    "summarize_ious",
    "train_metrics",
    "TrainState",
    "create_train_state",
    "lr_at_epoch",
    "make_jitted_train_step",
    "make_optimizer",
    "multistep_schedule",
    "train_epoch",
    "train_step",
]
