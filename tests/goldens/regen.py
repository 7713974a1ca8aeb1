"""Regenerate golden files. Run deliberately after an INTENTIONAL change
to init/arch numerics (e.g. the nn.scan stacking changed how per-layer
init RNGs fold), never to paper over an unexplained diff:

    cd tests && JAX_PLATFORMS=cpu python goldens/regen.py

History of deliberate regens:
- round 2: nn.scan over resblocks/decoder layers/resnet stage tails
  changed the *init* rng stream (split per scan step); trained-weight
  parity is covered by test_model_parity / test_train_parity.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from conftest import tiny_cris  # noqa: E402


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tiny_forward.npz")
    if os.path.exists(out):  # keep the original fixed inputs
        d = np.load(out)
        img, word = d["img"], d["word"]
    else:
        rng = np.random.RandomState(7)
        img = rng.randn(2, 64, 64, 3).astype(np.float32)
        word = rng.randint(1, 100, (2, 17)).astype(np.int32)

    model = tiny_cris(dropout=0.0, dtype=None)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.asarray(img), jnp.asarray(word)
    )
    pred = np.asarray(model.apply(variables, jnp.asarray(img), jnp.asarray(word)))
    np.savez(out, img=img, word=word, pred=pred)
    print(f"wrote {out}: pred {pred.shape} mean={pred.mean():.6f}")


if __name__ == "__main__":
    main()
