"""Headline benchmark: CRIS-R50 eval throughput (images/sec/chip).

Measures the device eval path exactly as test.py uses it -- bf16 forward at
416x416 (BN folded into conv weights) + sigmoid + bicubic
align_corners=True upsample -- at batch 32, over device-resident data.

Methodology: the eval loop runs as ONE jitted lax.scan over n pre-generated
batches (how a production eval loop feeds a TPU), timed at two scan
lengths; throughput is the *marginal* rate B*(n2-n1)/(T2-T1). The
subtraction cancels the fixed per-dispatch cost, which on this development
machine is a ~30 ms relay-tunnel round trip rather than anything a TPU
host would pay.

Robustness: the relay can stall for minutes; the benchmark works under a
wall-clock deadline and ALWAYS prints one JSON line -- a deadline-degraded
amortized number if the marginal measurement could not complete.

vs_baseline is value / 100.0: the reference publishes no throughput
(SURVEY.md §6), so 100 img/s is our recorded estimate of the reference's
batched A100 eval throughput for CRIS-R50 (fp16, batch 32); the driver
target is >=5x that (BASELINE.md).
"""

import json
import time
from functools import partial

import os

BATCH = 32
N_SHORT = 2
N_LONG = 12
TRIALS = 3
DEADLINE_S = float(os.environ.get("CRIS_BENCH_DEADLINE", "480"))
STALL_S = 30.0  # a 2-step scan normally returns in <1s; >30s = relay stall
A100_REFERENCE_IMG_PER_SEC = 100.0
START = time.monotonic()


def emit(step_ms, note=""):
    import jax

    img_per_sec = BATCH / (step_ms / 1000.0) / max(1, jax.device_count())
    result = {
        "metric": "cris_r50_eval_throughput_416px_b32",
        "value": round(img_per_sec, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / A100_REFERENCE_IMG_PER_SEC, 3),
    }
    if note:
        result["note"] = note
    print(json.dumps(result))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cris_tpu.checkpoint import fold_batchnorm
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

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 416, 416, 3), jnp.float32),
        jnp.ones((1, 17), jnp.int32),
        train=False,
    )
    # production eval path: BN folded into conv weights (exact rewrite)
    model = dataclasses.replace(model, fold_bn=True)
    variables = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    variables = jax.device_put(variables)

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

    def timed(n, seed):
        imgs, words = make_batches(seed, n)
        jax.block_until_ready((imgs, words))
        t0 = time.perf_counter()
        float(scan_eval(variables, imgs, words))
        return time.perf_counter() - t0

    def time_left():
        return DEADLINE_S - (time.monotonic() - START)

    # compile both scan lengths
    t_short_best = timed(N_SHORT, 10_000)
    t_long_best = timed(N_LONG, 20_000)

    # the relay can stall for seconds; retry until the marginal step time is
    # physically sane (between the bf16 roofline and a stalled bound)
    SANE_MS = (5.0, 5000.0)
    step_ms = None
    for attempt in range(8):
        if time_left() < 60:
            break
        base = 50_000 * (attempt + 1)
        # probe: if even a short scan stalls, let the relay recover before
        # burning trials on garbage timings
        probe = timed(N_SHORT, base - 1)
        if probe > STALL_S:
            if time_left() > 120:
                time.sleep(min(60, time_left() - 90))
            continue
        t_short = min(timed(N_SHORT, base + i) for i in range(TRIALS))
        t_long = min(timed(N_LONG, base + 10_000 + i * 100) for i in range(TRIALS))
        t_short_best = min(t_short_best, t_short)
        t_long_best = min(t_long_best, t_long)
        marginal = (t_long - t_short) / (N_LONG - N_SHORT) * 1000.0
        if SANE_MS[0] <= marginal <= SANE_MS[1]:
            step_ms = marginal
            break
        if time_left() > 90:
            time.sleep(20)

    if step_ms is not None:
        emit(step_ms)
    else:
        # conservative fallback: amortized long-scan rate (includes fixed
        # dispatch cost, so it understates the chip)
        emit(
            t_long_best / N_LONG * 1000.0,
            note="deadline-degraded: amortized rate incl. dispatch overhead",
        )


if __name__ == "__main__":
    main()
