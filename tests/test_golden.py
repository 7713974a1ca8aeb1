"""Golden regression: a fixed-seed tiny-CRIS forward must stay numerically
stable across refactors (guards against silent numerics drift; regenerate
goldens deliberately if an intentional change shifts them)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from conftest import tiny_cris

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "goldens", "tiny_forward.npz")


def test_forward_matches_golden():
    data = np.load(GOLDEN)
    model = tiny_cris(dropout=0.0, dtype=None)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.asarray(data["img"]), jnp.asarray(data["word"])
    )
    pred = np.asarray(
        model.apply(variables, jnp.asarray(data["img"]), jnp.asarray(data["word"]))
    )
    np.testing.assert_allclose(pred, data["pred"], rtol=1e-4, atol=1e-4)
