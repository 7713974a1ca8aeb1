"""Training entry point.

Same CLI as the reference trainer (/root/reference/train.py:34-51):
    python train.py --config config/refcoco/cris_r50.yaml [--opts K V ...]

Single-controller JAX replaces the reference's mp.spawn + NCCL DDP
(train.py:54-102): one process drives a Mesh(('data','model')), the global
batch is sharded over 'data', and XLA inserts every collective. bf16
compute replaces AMP+GradScaler; orbax replaces torch.save.
"""

import datetime
import os
import time

import jax
import numpy as np

from cris_tpu import cli
from cris_tpu.checkpoint import (
    LAST_NAME,
    promote_best,
    restore_model,
    restore_train,
    save_checkpoint,
)
from cris_tpu.data import RefDataLoader, RefDataset
from cris_tpu.engine import (
    Evaluator,
    create_train_state,
    make_jitted_train_step,
    make_optimizer,
    train_epoch,
)
from cris_tpu.parallel import batch_sharding, make_param_shardings, put_global
from cris_tpu.utils import ExperimentTracker, init_random_seed, root_key, setup_logger
from cris_tpu.utils.logging import log_exceptions, logger


@log_exceptions
def main():
    cli.maybe_init_distributed()
    cli.setup_compilation_cache()
    cfg = cli.get_parser("CRIS-TPU training")
    cfg.manual_seed = init_random_seed(cfg.get("manual_seed"))
    cfg.output_dir = os.path.join(cfg.output_folder, cfg.exp_name)

    setup_logger(
        cfg.output_dir,
        process_index=jax.process_index(),
        filename="train.log",
        mode="a",
    )
    logger.info(f"devices: {jax.devices()}")

    tracker = ExperimentTracker(
        enabled=cfg.get("wandb", False),
        job_type="training",
        config=dict(cfg),
        project="CRIS",
        name=cfg.exp_name,
        tags=[cfg.dataset, cfg.clip_pretrain],
    )

    # model + mesh + sharded state
    mesh = cli.make_mesh_from_cfg(cfg)
    logger.info(f"mesh: {dict(mesh.shape)}")
    model, variables = cli.build_model_and_variables(cfg)
    variables = cli.load_initial_weight(cfg, variables)
    logger.info(model)

    shardings = make_param_shardings(mesh, variables)
    variables = put_global(variables, shardings)
    bsh = batch_sharding(mesh)

    # batch_size is the GLOBAL batch (reference splits it per GPU,
    # train.py:114-117); each host loads its 1/process_count slice and
    # put_global concatenates the host slices into the global batch
    nproc = jax.process_count()
    if cfg.batch_size % nproc or cfg.batch_size_val % nproc:
        raise ValueError(
            f"batch sizes ({cfg.batch_size}/{cfg.batch_size_val}) must "
            f"divide evenly over {nproc} processes"
        )

    # data
    train_data = RefDataset(
        cfg.train_lmdb, cfg.mask_root, cfg.dataset, cfg.train_split,
        "train", cfg.input_size, cfg.word_len,
    )
    val_data = RefDataset(
        cfg.val_lmdb, cfg.mask_root, cfg.dataset, cfg.val_split,
        "val", cfg.input_size, cfg.word_len,
    )
    train_loader = RefDataLoader(
        train_data,
        batch_size=cfg.batch_size // nproc,
        shuffle=True,
        seed=cfg.manual_seed,
        drop_last=True,
        num_workers=cfg.get("workers", 8),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    val_loader = RefDataLoader(
        val_data,
        batch_size=cfg.batch_size_val // nproc,
        shuffle=False,
        num_workers=cfg.get("workers_val", 4),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    # optimizer + state
    steps_per_epoch = len(train_loader)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = create_train_state(model, variables, tx)
    del variables
    jit_step = make_jitted_train_step(donate=True)
    evaluator = Evaluator(model, cfg.input_size, mesh, cfg.batch_size_val)
    rng = root_key(cfg.manual_seed)

    # resume
    best_iou = 0.0
    start_epoch = cfg.get("start_epoch", 0)
    if cfg.get("resume"):
        if not os.path.isdir(cfg.resume):
            raise ValueError(
                f"=> resume failed! no checkpoint found at '{cfg.resume}'"
            )
        logger.info(f"=> loading checkpoint '{cfg.resume}'")
        model_ckpt = restore_model(
            cfg.resume,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        train_ckpt = restore_train(
            cfg.resume,
            {
                "opt_state": state.opt_state,
                "step": np.asarray(0),
                "epoch": np.asarray(0),
                "best_iou": np.asarray(0.0),
                "cur_iou": np.asarray(0.0),
                "prec": {
                    **{f"Pr@{t}": np.asarray(0.0) for t in (50, 60, 70, 80, 90)},
                    "oIoU": np.asarray(0.0),
                },
            },
        )
        # re-place restored leaves with the live state's mesh shardings
        # (scalars like Adam's step count were created uncommitted -> they
        # get the replicated mesh sharding)
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())

        def put_like(restored, reference):
            return jax.tree_util.tree_map(
                lambda r, ref: put_global(
                    r,
                    ref.sharding
                    if isinstance(getattr(ref, "sharding", None), NamedSharding)
                    else repl,
                ),
                restored,
                reference,
            )

        state = state.replace(
            params=put_like(model_ckpt["params"], state.params),
            batch_stats=put_like(model_ckpt["batch_stats"], state.batch_stats),
            opt_state=put_like(train_ckpt["opt_state"], state.opt_state),
            step=int(train_ckpt["step"]),
        )
        start_epoch = int(train_ckpt["epoch"])
        best_iou = float(train_ckpt["best_iou"])
        logger.info(f"=> loaded checkpoint '{cfg.resume}' (epoch {start_epoch})")

    # train
    start_time = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        epoch_log = epoch + 1
        train_loader.set_epoch(epoch_log)
        state = train_epoch(
            state, train_loader, jit_step, rng, epoch_log, cfg, bsh, tracker
        )

        iou, prec = evaluator.validate(
            val_loader,
            {"params": state.params, "batch_stats": state.batch_stats},
            epoch_log,
            cfg.epochs,
        )

        if jax.process_index() == 0:
            # update best BEFORE saving so a resume restores the true best
            # (the reference saves the stale value, train.py:192-207 there,
            # which lets a worse post-resume epoch overwrite best_model)
            is_best = iou >= best_iou
            best_iou = max(best_iou, iou)
            save_checkpoint(
                cfg.output_dir,
                LAST_NAME,
                model_tree={
                    "params": jax.tree_util.tree_map(np.asarray, state.params),
                    "batch_stats": jax.tree_util.tree_map(
                        np.asarray, state.batch_stats
                    ),
                },
                train_tree={
                    "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
                    "step": np.asarray(int(state.step)),
                    "epoch": np.asarray(epoch_log),
                    "best_iou": np.asarray(best_iou),
                    "cur_iou": np.asarray(iou),
                    "prec": {k: np.asarray(v) for k, v in prec.items()},
                },
            )
            if is_best:
                promote_best(cfg.output_dir)

    tracker.finish()
    logger.info(f"* Best IoU={best_iou} *")
    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f"* Training time {total} *")


if __name__ == "__main__":
    main()
