"""Headline benchmark: CRIS-R50 eval throughput (images/sec/chip).

Measures the device eval path exactly as test.py uses it -- bf16 forward at
416x416 + sigmoid + bicubic align_corners=True upsample -- at batch 32,
over device-resident data.

Methodology: the eval loop runs as ONE jitted lax.scan over n pre-generated
batches (how a production eval loop feeds a TPU), timed at two scan lengths;
the throughput is the *marginal* rate B*(n2-n1)/(T2-T1). The subtraction
cancels the fixed per-dispatch cost, which on this development machine is a
~30 ms relay-tunnel round trip rather than anything a TPU host would pay.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

vs_baseline is value / 100.0: the reference publishes no throughput
(SURVEY.md §6), so 100 img/s is our recorded estimate of the reference's
batched A100 eval throughput for CRIS-R50 (fp16, batch 32); the driver
target is >=5x that (BASELINE.md).
"""

import json
import time
from functools import partial

BATCH = 32
N_SHORT = 2
N_LONG = 12
TRIALS = 3
A100_REFERENCE_IMG_PER_SEC = 100.0


def main():
    import jax
    import jax.numpy as jnp

    from cris_tpu.models import CLIP_PRESETS, CRIS
    from cris_tpu.ops.resize import resize2d

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

    @partial(jax.jit, static_argnames=("n",))
    def make_batches(seed, n):
        def gen(i):
            k = jax.random.PRNGKey(seed + i)
            ki, kw = jax.random.split(k)
            return (
                jax.random.normal(ki, (BATCH, 416, 416, 3), jnp.float32),
                jax.random.randint(kw, (BATCH, 17), 1, 49000, jnp.int32),
            )
        return jax.vmap(gen)(jnp.arange(n))

    @jax.jit
    def scan_eval(variables, imgs, words):
        def body(acc, batch):
            img, word = batch
            pred = model.apply(variables, img, word, train=False)
            probs = jax.nn.sigmoid(pred[..., 0].astype(jnp.float32))
            probs = resize2d(probs[..., None], (416, 416), "bicubic", True)
            return acc + probs.sum(), None
        acc, _ = jax.lax.scan(body, 0.0, (imgs, words))
        return acc

    key = jax.random.PRNGKey(0)
    img1, word1 = make_batches(0, 1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        key, img1[0, :1], word1[0, :1], train=False
    )

    # production eval path: BN folded into conv weights (exact rewrite)
    import dataclasses

    import numpy as np

    from cris_tpu.checkpoint import fold_batchnorm

    model = dataclasses.replace(model, fold_bn=True)
    variables = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))

    def timed(n, seed):
        imgs, words = make_batches(seed, n)
        jax.block_until_ready((imgs, words))
        t0 = time.perf_counter()
        float(scan_eval(variables, imgs, words))
        return time.perf_counter() - t0

    # compile both scan lengths
    timed(N_SHORT, 10_000)
    timed(N_LONG, 20_000)

    # this dev machine reaches the TPU through a relay that can stall for
    # seconds at a time; retry until the marginal step time is physically
    # sane (between the bf16 roofline and an obviously-stalled bound)
    SANE_MS = (5.0, 5000.0)
    step_ms = None
    for attempt in range(4):
        base = 50_000 * (attempt + 1)
        t_short = min(timed(N_SHORT, base + i) for i in range(TRIALS))
        t_long = min(timed(N_LONG, base + 10_000 + i * 100) for i in range(TRIALS))
        marginal = (t_long - t_short) / (N_LONG - N_SHORT) * 1000.0
        if SANE_MS[0] <= marginal <= SANE_MS[1]:
            step_ms = marginal
            break
        time.sleep(20)
    if step_ms is None:
        # conservative fallback: amortized long-scan rate (includes the
        # fixed dispatch cost, so it understates the chip)
        step_ms = t_long / N_LONG * 1000.0

    img_per_sec = BATCH / (step_ms / 1000.0)
    img_per_sec /= max(1, jax.device_count())
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
