"""Trainer/optimizer/metrics/checkpoint tests on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import tiny_cris, tiny_train_cfg


def _batch(b=8, size=64, length=17, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.randn(b, size, size, 3).astype(np.float32),
        "word": np.concatenate(
            [
                np.full((b, 1), 49406, np.int32),
                rng.randint(1, 49000, (b, length - 2)).astype(np.int32),
                np.full((b, 1), 49407, np.int32),
            ],
            axis=1,
        ),
        "mask": (rng.rand(b, size, size, 1) > 0.5).astype(np.float32),
    }


def test_multistep_schedule_matches_torch():
    import torch

    from cris_tpu.engine import multistep_schedule

    steps_per_epoch = 10
    sched = multistep_schedule(1e-3, [2, 4], 0.1, steps_per_epoch)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2, 4], gamma=0.1)
    for epoch in range(6):
        ref_lr = opt.param_groups[0]["lr"]
        got = float(sched(epoch * steps_per_epoch))
        assert got == pytest.approx(ref_lr, rel=1e-6), f"epoch {epoch}"
        tsched.step()


def test_param_group_labels():
    from cris_tpu.models import param_group_label

    assert param_group_label(("backbone", "visual", "conv1", "kernel")) == "backbone"
    assert (
        param_group_label(("backbone", "text", "positional_embedding")) == "head"
    )
    assert (
        param_group_label(
            ("backbone", "visual", "attnpool", "positional_embedding")
        )
        == "head"
    )
    assert param_group_label(("neck", "aggr", "conv", "kernel")) == "head"


def test_train_metrics_match_reference_math():
    import torch

    from cris_tpu.engine import train_metrics

    rng = np.random.RandomState(1)
    logits = rng.randn(4, 16, 16, 1).astype(np.float32)
    # fractional boundary values (linear-warped masks): the reference's
    # target.bool() counts ANY nonzero as foreground
    target = rng.rand(4, 16, 16, 1).astype(np.float32)
    target[target < 0.6] = 0.0

    # reference trainMetricGPU (utils/misc.py:114-129)
    out = torch.sigmoid(torch.from_numpy(logits).reshape(4, -1))
    out = (out >= 0.35).float()
    tgt = torch.from_numpy(target).reshape(4, -1)
    inter = (out.bool() & tgt.bool()).sum(dim=1)
    union = (out.bool() | tgt.bool()).sum(dim=1)
    ious = inter / (union + 1e-6)
    ref_iou, ref_pr = 100.0 * ious.mean(), 100.0 * (ious > 0.5).float().mean()

    iou, pr5 = train_metrics(jnp.asarray(logits), jnp.asarray(target))
    assert float(iou) == pytest.approx(float(ref_iou), abs=1e-3)
    assert float(pr5) == pytest.approx(float(ref_pr), abs=1e-3)


@pytest.fixture(scope="module")
def trained_bits():
    from cris_tpu.engine import create_train_state, make_jitted_train_step, make_optimizer

    model = tiny_cris()
    batch = _batch()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
        jnp.asarray(batch["word"]), jnp.asarray(batch["mask"]), train=False,
    )
    tx = make_optimizer(tiny_train_cfg(), steps_per_epoch=2)
    state = create_train_state(model, variables, tx)
    step = make_jitted_train_step(donate=False)
    return model, state, step, batch


def test_train_step_reduces_loss(trained_bits):
    model, state, step, batch = trained_bits
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(metrics["iou"]) <= 100.0
    assert int(state.step) == 6


def test_batch_stats_update(trained_bits):
    model, state, step, batch = trained_bits
    before = jax.tree_util.tree_leaves(state.batch_stats)[0]
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    after = jax.tree_util.tree_leaves(new_state.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_checkpoint_roundtrip(tmp_path, trained_bits):
    from cris_tpu.checkpoint import restore_model, restore_train, save_checkpoint

    model, state, step, batch = trained_bits
    model_tree = {"params": state.params, "batch_stats": state.batch_stats}
    train_tree = {
        "opt_state": state.opt_state,
        "step": np.asarray(int(state.step)),
        "epoch": np.asarray(3),
        "best_iou": np.asarray(0.5),
        "cur_iou": np.asarray(0.4),
        "prec": {f"Pr@{t}": np.asarray(0.1) for t in (50, 60, 70, 80, 90)},
    }
    save_checkpoint(str(tmp_path), "last_model", model_tree, train_tree)

    restored_m = restore_model(str(tmp_path / "last_model"), model_tree)
    restored_t = restore_train(str(tmp_path / "last_model"), train_tree)
    assert int(restored_t["epoch"]) == 3
    # optax structure restored typed (tuples/namedtuples preserved)
    assert jax.tree_util.tree_structure(
        restored_t["opt_state"]
    ) == jax.tree_util.tree_structure(state.opt_state)
    before = jax.tree_util.tree_leaves(model_tree["params"])
    after = jax.tree_util.tree_leaves(restored_m["params"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_and_multi_optimizers_identical(monkeypatch):
    """opt_impl 'single' (one Adam chain + per-leaf group-LR scale) must
    produce bit-level-identical parameter trajectories to the default
    two-group multi_transform Adam."""
    import jax
    import optax

    from cris_tpu.engine.trainer import make_optimizer
    from cris_tpu.utils.config import CfgNode

    cfg = dict(base_lr=1e-3, lr_multi=0.1, milestones=[2], lr_decay=0.1,
               weight_decay=0.0, max_norm=0.0)
    r = np.random.RandomState(0)
    params = {
        "backbone": {"w": jnp.asarray(r.randn(4, 3).astype(np.float32)),
                     "positional_embedding":
                         jnp.asarray(r.randn(5).astype(np.float32))},
        "neck": {"w": jnp.asarray(r.randn(3).astype(np.float32))},
    }

    def run(impl):
        monkeypatch.setenv("CRIS_OPT_IMPL", impl)
        tx = make_optimizer(CfgNode(dict(cfg)), steps_per_epoch=1)
        p = jax.tree_util.tree_map(lambda a: a, params)
        st = tx.init(p)
        outs = []
        for i in range(4):  # crosses the milestone boundary
            g = jax.tree_util.tree_map(
                lambda a: jnp.sin(a * (i + 1)), p)
            upd, st = tx.update(g, st, p)
            p = optax.apply_updates(p, upd)
            outs.append(p)
        return outs

    for a, b in zip(run("multi"), run("single")):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)), a, b)
