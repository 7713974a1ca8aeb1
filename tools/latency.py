"""Forward-pass latency microbenchmark.

Same contract as /root/reference/tools/latency.py:38-72: 500 forward
passes of a (1, 416, 416, 3) image + random tokens (first 100 warmup),
reporting parameter count (M), FPS, and device memory (GB).

Extra: --opts TEST.visualize unchanged; pass env CRIS_LATENCY_TRAIN=1 to
time the full training step (fwd+bwd+optimizer) instead, and
CRIS_LATENCY_BATCH=N to change the batch size (default 1).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cris_tpu import cli


def count_parameters(params) -> float:
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)) * 1e-6


def device_memory_gb() -> float:
    try:
        stats = jax.devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1.073742e9
    except Exception:
        return float("nan")


def main():
    cfg = cli.get_parser("CRIS-TPU latency")
    model, variables = cli.build_model_and_variables(cfg)
    variables = jax.device_put(variables)
    train_mode = os.environ.get("CRIS_LATENCY_TRAIN") == "1"
    batch = int(os.environ.get("CRIS_LATENCY_BATCH", "1"))

    rng = np.random.RandomState(0)
    size = cfg.input_size
    image = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(0, 4096, (batch, cfg.word_len)).astype(np.int32))

    if train_mode:
        from cris_tpu.engine import create_train_state, make_optimizer, train_step

        mask = jnp.asarray(
            (rng.rand(batch, size, size, 1) > 0.5).astype(np.float32)
        )
        state = create_train_state(model, variables, make_optimizer(cfg, 100))
        jit_step = jax.jit(train_step)
        key = jax.random.PRNGKey(0)

        def run():
            nonlocal state
            state, metrics = jit_step(
                state, {"image": image, "word": word, "mask": mask}, key
            )
            return metrics["loss"]

        step_fn = lambda: float(run())
        n_iters, warmup = 30, 5
    else:

        @jax.jit
        def forward(variables, image, word):
            return model.apply(variables, image, word, train=False)

        step_fn = lambda: forward(variables, image, word).block_until_ready()
        n_iters, warmup = 500, 100

    avg_time = 0.0
    for i in range(n_iters):
        start = time.time()
        step_fn()
        if (i + 1) >= warmup:
            avg_time += time.time() - start
    timed = n_iters - warmup

    print("#########################################")
    print("Average Parameters : {:.2f} M".format(count_parameters(variables["params"])))
    print("Average FPS: {:.2f}".format(timed / avg_time))
    print("Average Device Memory: {:.2f} GB".format(device_memory_gb()))
    print("#########################################")


if __name__ == "__main__":
    main()
