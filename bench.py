"""Headline benchmark: CRIS-R50 eval throughput (images/sec/chip).

Measures the device eval path exactly as test.py uses it -- bf16 forward at
416x416 + sigmoid + bicubic align_corners=True upsample to input size --
at batch 32, including H2D transfer, on whatever accelerator is attached.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

vs_baseline is value / 100.0: the reference publishes no throughput
(SURVEY.md §6), so 100 img/s is our recorded estimate of the reference's
batched A100 eval throughput for CRIS-R50 (tools/latency.py-style forward,
fp16, batch 32); the driver target is >=5x (BASELINE.md).
"""

import json
import time

import numpy as np

A100_REFERENCE_IMG_PER_SEC = 100.0
BATCH = 32
ITERS = 30
WARMUP = 5


def main():
    import jax
    import jax.numpy as jnp

    from cris_tpu.engine import Evaluator
    from cris_tpu.models import CLIP_PRESETS, CRIS

    model = CRIS(
        clip_config=CLIP_PRESETS["RN50"],
        fpn_in=(512, 1024, 1024),
        fpn_out=(256, 512, 1024),
        vis_dim=512,
        num_layers=3,
        num_head=8,
        dim_ffn=2048,
        dropout=0.1,
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    image = rng.randn(BATCH, 416, 416, 3).astype(np.float32)
    word = rng.randint(1, 49000, (BATCH, 17)).astype(np.int32)

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.asarray(image[:1]),
        jnp.asarray(word[:1]),
        train=False,
    )

    ev = Evaluator(model, input_size=416, batch_size=BATCH)
    # compile + warmup
    for _ in range(WARMUP):
        ev.predict_probs(variables, image, word)

    start = time.perf_counter()
    for _ in range(ITERS):
        ev.predict_probs(variables, image, word)
    elapsed = time.perf_counter() - start

    n_chips = max(1, len(jax.devices()))
    img_per_sec = BATCH * ITERS / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": "cris_r50_eval_throughput_416px_b32",
                "value": round(img_per_sec, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / A100_REFERENCE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
