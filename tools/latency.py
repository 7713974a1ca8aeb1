"""Forward-pass latency microbenchmark.

Same contract as /root/reference/tools/latency.py:38-72: 500 forward
passes of a (1, 416, 416, 3) image + random tokens (first 100 warmup),
reporting parameter count (M), FPS, and device memory (GB).
"""

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

    @jax.jit
    def forward(variables, image, word):
        return model.apply(variables, image, word, train=False)

    rng = np.random.RandomState(0)
    size = cfg.input_size
    image = jnp.asarray(rng.randn(1, size, size, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(0, 4096, (1, cfg.word_len)).astype(np.int32))

    n_iters, warmup = 500, 100
    avg_time = 0.0
    for i in range(n_iters):
        start = time.time()
        forward(variables, image, word).block_until_ready()
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
