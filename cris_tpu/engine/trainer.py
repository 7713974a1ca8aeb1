"""Training state, optimizer, and the jitted global-batch train step.

TPU-native equivalents of the reference training stack
(/root/reference/train.py:96-111, engine/engine.py:17-87):
- Adam with two LR groups (CLIP backbone at lr_multi x base_lr, head at
  base_lr, positional embeddings counted as head) via optax.multi_transform;
- MultiStepLR epoch-milestone decay as a step schedule;
  (reference quirk, not replicated: the reference passes 'initial_lr' --
  not 'lr' -- in its param groups (model/__init__.py:42-48), so torch Adam
  runs BOTH groups at base_lr for epoch 1; the closed-form MultiStepLR
  then resets LRs from initial_lr at the first scheduler.step(epoch)
  (train.py:210). Here the backbone group is at lr_multi x base_lr from
  step 0, which is the documented intent.)
- optional global-norm gradient clipping (max_norm);
- bf16 compute with fp32 params -- no GradScaler: bf16 keeps the fp32
  exponent range so loss scaling is unnecessary on TPU;
- one jitted train_step over the global batch: gradient and BN-statistic
  reductions become GSPMD collectives, replacing DDP all-reduce + SyncBN.
"""

from __future__ import annotations

import bisect
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..models import param_group_label
from .metrics import train_metrics


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def multistep_schedule(
    base_lr: float, milestones: Sequence[int], gamma: float, steps_per_epoch: int
):
    """lr(step) = base_lr * gamma^(#milestone epochs passed)
    (torch MultiStepLR semantics, train.py:108-110)."""
    boundaries = sorted(int(m) * steps_per_epoch for m in milestones)

    def schedule(step):
        factor = jnp.ones((), jnp.float32)
        for b in boundaries:
            factor = factor * jnp.where(step >= b, gamma, 1.0)
        return base_lr * factor

    return schedule


def lr_at_epoch(base_lr, milestones, gamma, epoch) -> float:
    """Host-side mirror of the schedule for logging."""
    return base_lr * gamma ** bisect.bisect_right(sorted(milestones), epoch - 1)


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Two-LR-group Adam (backbone at lr_multi x base_lr, head at base_lr).

    Two implementations with IDENTICAL math (Adam's per-leaf m/v state is
    independent of grouping, and both groups share b1/b2/eps/wd, so the
    group split only scales the final update):

    - 'multi' (default): optax.multi_transform of two Adam chains -- the
      direct torch-param-groups analogue;
    - 'single': ONE scale_by_adam chain + a per-leaf group-LR scale --
      half the optimizer-state bookkeeping in the train program. Select
      with cfg `opt_impl: single` / env CRIS_OPT_IMPL=single.
      Round-4 TPU A/B (tools/bench_opt_variants.py, b32 marginal):
      single 155.66 vs multi 155.64 ms/step -- the multi_transform tax
      is ZERO inside the scanned train program, so 'multi' (the direct
      torch-param-groups analogue) stays the default. The whole
      optimizer tail is ~2.9 ms of Adam m/v traffic (sgd A/B); per-step
      train metrics are free.

    Equivalence is pinned by tests/test_engine.py
    (test_single_and_multi_optimizers_identical).
    """
    import os

    def adam_parts():
        parts = []
        if cfg.get("weight_decay", 0.0):
            # torch Adam adds wd*p to the gradient *before* the moment
            # update (L2, not AdamW) -- replicate that ordering
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        return parts

    def schedule_for(lr_scale: float):
        return multistep_schedule(
            cfg.base_lr * lr_scale,
            cfg.get("milestones", []),
            cfg.get("lr_decay", 0.1),
            steps_per_epoch,
        )

    impl = os.environ.get("CRIS_OPT_IMPL", cfg.get("opt_impl", "multi"))
    lr_multi = cfg.get("lr_multi", 1.0)
    if impl == "single":
        # the same two schedules the 'multi' groups use (bit-identical
        # lr values, including float association of base_lr * lr_multi)
        schedules = {"backbone": schedule_for(lr_multi),
                     "head": schedule_for(1.0)}

        def init(params):
            return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

        def update(updates, state, params=None):
            lrs = {k: s(state.count) for k, s in schedules.items()}
            upd = jax.tree_util.tree_map_with_path(
                lambda path, u: u * (
                    -lrs[param_group_label(path)]).astype(u.dtype),
                updates,
            )
            return upd, optax.ScaleByScheduleState(count=state.count + 1)

        tx = optax.chain(
            *adam_parts(), optax.GradientTransformation(init, update)
        )
    else:
        def group(lr_scale: float) -> optax.GradientTransformation:
            return optax.chain(
                *adam_parts(),
                optax.scale_by_learning_rate(schedule_for(lr_scale)),
            )

        tx = optax.multi_transform(
            {"backbone": group(lr_multi), "head": group(1.0)},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: param_group_label(path), params
            ),
        )
    if cfg.get("max_norm", 0.0):
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_norm), tx)
    return tx


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def train_step(
    state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One global-batch optimization step. jit this (donate state)."""
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        (pred, tgt, loss), mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"],
            batch["word"],
            batch["mask"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": step_rng},
        )
        return loss, (pred, tgt, mutated["batch_stats"])

    (loss, (pred, tgt, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
    iou, pr5 = train_metrics(pred, tgt)
    metrics = {"loss": loss, "iou": iou, "prec@50": pr5}
    return new_state, metrics


def make_jitted_train_step(donate: bool = True):
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def train_epoch(
    state: TrainState,
    loader,
    jit_step,
    rng: jax.Array,
    epoch: int,
    cfg,
    batch_sharding=None,
    tracker=None,
) -> TrainState:
    """One epoch of the reference train loop (engine/engine.py:17-87):
    meters, print_freq progress lines, optional experiment tracking."""
    import time

    from ..utils.logging import AverageMeter, ProgressMeter
    from ..utils.profiling import StepTimer

    # device trace of steps 10-15 of epoch 1 when cfg.profile_dir is set
    timer = StepTimer(cfg.get("profile_dir") if epoch == 1 else None)

    batch_time = AverageMeter("Batch", ":2.2f")
    data_time = AverageMeter("Data", ":2.2f")
    lr_meter = AverageMeter("Lr", ":1.6f")
    loss_meter = AverageMeter("Loss", ":2.4f")
    iou_meter = AverageMeter("IoU", ":2.2f")
    pr_meter = AverageMeter("Prec@50", ":2.2f")
    progress = ProgressMeter(
        len(loader),
        [batch_time, data_time, lr_meter, loss_meter, iou_meter, pr_meter],
        prefix=f"Training: Epoch=[{epoch}/{cfg.epochs}] ",
    )
    cur_lr = lr_at_epoch(
        cfg.base_lr, cfg.get("milestones", []), cfg.get("lr_decay", 0.1), epoch
    )

    # Per-step metrics stay ON DEVICE between progress lines: a float()
    # fetch every step would block the host on the device each iteration
    # (capping dispatch pipelining); instead the device arrays queue up and
    # one device_get drains them every print_freq steps / at epoch end.
    pending = []  # [(batch_size, device metrics dict), ...]

    def drain():
        if not pending:
            return
        for n, vals in zip(
            [n for n, _ in pending],
            jax.device_get([m for _, m in pending]),
        ):
            loss_meter.update(float(vals["loss"]), n)
            iou_meter.update(float(vals["iou"]), n)
            pr_meter.update(float(vals["prec@50"]), n)
        pending.clear()

    end = time.time()
    for i, batch in enumerate(loader):
        timer.step(i)
        data_time.update(time.time() - end)
        if batch_sharding is not None:
            from ..parallel import put_global

            device_batch = put_global(
                {k: batch[k] for k in ("image", "word", "mask")},
                batch_sharding,
            )
        else:
            device_batch = {k: batch[k] for k in ("image", "word", "mask")}
        state, metrics = jit_step(state, device_batch, rng)

        pending.append((batch["image"].shape[0], metrics))
        lr_meter.update(cur_lr)
        batch_time.update(time.time() - end)
        end = time.time()

        if (i + 1) % cfg.get("print_freq", 100) == 0:
            drain()
            progress.display(i + 1)
            if tracker is not None:
                tracker.log(
                    {
                        "time/batch": batch_time.val,
                        "time/data": data_time.val,
                        "training/lr": lr_meter.val,
                        "training/loss": loss_meter.val,
                        "training/iou": iou_meter.val,
                        "training/prec@50": pr_meter.val,
                    },
                    step=epoch * len(loader) + (i + 1),
                )
    drain()
    timer.close()
    return state
