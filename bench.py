"""Headline benchmark: CRIS-R50 eval throughput (images/sec/chip).

Measures the device eval path exactly as test.py uses it -- bf16 forward at
416x416 + sigmoid + bicubic align_corners=True upsample to input size --
at batch 32. Inputs are generated on device and outputs consumed on device
(one scalar checksum leaves the chip): this machine reaches the TPU through
a ~30 MB/s relay tunnel, which would otherwise dominate, whereas production
TPU hosts feed chips over local DMA with an async input pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

vs_baseline is value / 100.0: the reference publishes no throughput
(SURVEY.md §6), so 100 img/s is our recorded estimate of the reference's
batched A100 eval throughput for CRIS-R50 (fp16, batch 32); the driver
target is >=5x that (BASELINE.md).
"""

import json
import time

BATCH = 32
ITERS = 20
WARMUP = 3
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

    @jax.jit
    def eval_step(variables, seed):
        # batch generated on device from the seed: every call is a distinct
        # computation (defeats any value-level result caching) with zero
        # host->device traffic
        key = jax.random.PRNGKey(seed)
        kimg, kword = jax.random.split(key)
        image = jax.random.normal(kimg, (BATCH, 416, 416, 3), jnp.float32)
        word = jax.random.randint(kword, (BATCH, 17), 1, 49000, jnp.int32)
        pred = model.apply(variables, image, word, train=False)
        probs = jax.nn.sigmoid(pred[..., 0].astype(jnp.float32))
        probs = resize2d(probs[..., None], (416, 416), "bicubic", True)[..., 0]
        return probs.sum()  # consume on device; one scalar leaves the chip

    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (1, 416, 416, 3), jnp.float32)
    word = jax.random.randint(key, (1, 17), 1, 49000, jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        key, image, word, train=False
    )

    for i in range(WARMUP):
        float(eval_step(variables, i))

    # per-call blocking (forcing the scalar to host) gives the honest
    # serial per-chip rate; fire-and-forget dispatch over this relay can
    # fan out across a pool and report completion optimistically
    start = time.perf_counter()
    for i in range(ITERS):
        float(eval_step(variables, 1000 + i))
    elapsed = time.perf_counter() - start

    n_chips = max(1, jax.device_count())
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
