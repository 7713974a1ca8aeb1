"""Golden regression: fixed-seed tiny-CRIS programs must stay numerically
stable across refactors, independently of the torch parity suite.

Covers the PRODUCTION paths, not just a bare forward (VERDICT r2 task 8):
the fold_bn eval forward (what test.py/bench.py run) and one full train
step (fwd + bwd + two-group Adam + BN stats, digested per-leaf).

Regeneration policy (see goldens/regen.py): only for an INTENTIONAL,
explained numerics change, in a commit that states the cause and has the
parity suite green.
"""

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from conftest import param_digest, tiny_cris, tiny_train_cfg

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _load(name):
    return np.load(os.path.join(GOLDEN_DIR, name))


def _inputs(data):
    return jnp.asarray(data["img"]), jnp.asarray(data["word"])


def test_forward_matches_golden():
    data = _load("tiny_forward.npz")
    img, word = _inputs(data)
    model = tiny_cris(dropout=0.0, dtype=None)
    variables = model.init(jax.random.PRNGKey(42), img, word)
    pred = np.asarray(model.apply(variables, img, word))
    np.testing.assert_allclose(pred, data["pred"], rtol=1e-4, atol=1e-4)


def test_fold_bn_eval_matches_golden():
    """BN fold + pos-embed pre-resize + fold_bn apply: the eval production
    path must both match its golden AND stay equivalent to the unfolded
    forward (the fold is an exact graph rewrite)."""
    from cris_tpu.checkpoint import fold_batchnorm

    fwd = _load("tiny_forward.npz")
    gold = _load("tiny_fold_eval.npz")
    img, word = _inputs(fwd)
    model = tiny_cris(dropout=0.0, dtype=None)
    variables = model.init(jax.random.PRNGKey(42), img, word)
    folded = fold_batchnorm(
        jax.tree_util.tree_map(np.asarray, variables), input_resolution=64
    )
    folded_model = dataclasses.replace(model, fold_bn=True, pos_grid=64 // 32)
    pred = np.asarray(folded_model.apply(folded, img, word))
    np.testing.assert_allclose(pred, gold["pred"], rtol=1e-4, atol=1e-4)
    # exactness of the rewrite, against the sibling golden
    np.testing.assert_allclose(pred, fwd["pred"], rtol=1e-3, atol=1e-3)


def test_train_step_matches_golden():
    from cris_tpu.engine import create_train_state, make_optimizer, train_step

    fwd = _load("tiny_forward.npz")
    gold = _load("tiny_train_step.npz")
    img, word = _inputs(fwd)
    mask = jnp.asarray(gold["mask"])

    model = tiny_cris(dropout=0.0, dtype=None)
    variables = model.init(
        jax.random.PRNGKey(42), img, word, mask, train=False
    )
    state = create_train_state(
        model, variables, make_optimizer(tiny_train_cfg(), steps_per_epoch=2)
    )
    state, metrics = jax.jit(train_step)(
        state, {"image": img, "word": word, "mask": mask}, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(float(metrics["loss"]), gold["loss"], rtol=1e-4)
    np.testing.assert_allclose(float(metrics["iou"]), gold["iou"], atol=1e-3)

    paths, digest = param_digest(state.params)
    np.testing.assert_array_equal(paths, gold["paths"])
    np.testing.assert_allclose(digest, gold["digest"], rtol=1e-4, atol=1e-7)
