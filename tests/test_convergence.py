"""System test: the full training loop (loader -> jitted train step ->
optimizer) actually learns — training loss falls by well over half on a
small synthetic set. Guards against silent optimizer/labeling/BN-wiring
regressions that per-step parity tests can't see."""

import numpy as np

import jax

from conftest import tiny_cris, tiny_train_cfg


def test_training_reduces_loss_over_epochs():
    from cris_tpu.data import RefDataLoader, RefDataset
    from cris_tpu.engine import (
        create_train_state,
        make_jitted_train_step,
        make_optimizer,
    )

    model = tiny_cris(dropout=0.1)
    ds = RefDataset("synthetic://16?seed=77", None, "synthetic", "train",
                    "train", 64, 17)
    loader = RefDataLoader(ds, batch_size=8, shuffle=True, seed=0,
                           drop_last=True, num_workers=2)

    batch0 = next(iter(loader))
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch0["image"]),
        jnp.asarray(batch0["word"]),
        jnp.asarray(batch0["mask"]),
        train=False,
    )
    cfg = tiny_train_cfg(base_lr=1e-3, milestones=[100], epochs=8)
    state = create_train_state(model, variables, make_optimizer(cfg, 2))
    step = make_jitted_train_step(donate=False)
    rng = jax.random.PRNGKey(1)

    epoch_losses = []
    for epoch in range(8):
        loader.set_epoch(epoch)
        losses = []
        for batch in loader:
            device_batch = {k: jnp.asarray(batch[k])
                            for k in ("image", "word", "mask")}
            state, metrics = step(state, device_batch, rng)
            losses.append(float(metrics["loss"]))
        epoch_losses.append(float(np.mean(losses)))

    assert np.isfinite(epoch_losses).all()
    assert epoch_losses[-1] < 0.5 * epoch_losses[0], epoch_losses
    assert epoch_losses[-1] < 0.8, epoch_losses
