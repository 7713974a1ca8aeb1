"""Region-level s2d microbench: stem -> layer1 -> layer2_0 wirings.

The tier-2 in-model A/B (tools/ab_s2d.py) came back NEGATIVE (eval
887.9 -> 829.6 img/s) even though every s2d-RESIDENT replacement conv
wins standalone (tools/bench_s2d.py). The untested pieces are the
region's ENTRY/EXIT crossing convs: pool2_conv1x1_s2d_to_s2d embeds a
(2, 2, 4C, 4D) kernel whose phase structure is 3/4 zeros (4x nominal
FLOPs) and the EXIT pays a d2s transpose. This tool times the WHOLE
region (B, 416, 416, 3) -> (B, 52, 52, 512) under each wiring with the
same weights, checking exactness against the tier-1 output:

  t1   tier 1 (current default): s2d stem; layer1/layer2_0 at 104^2 in
       normal layout, s2d consumed by layer1_0's pooled 1x1s.
  t2   tier 2 as landed (commit "s2d tier 2"): entry emits s2d via
       pool2-to-s2d kernels, resident tail, exit via conv1-s2d + d2s.
  t2b  tier-1 entry (normal-layout layer1_0) + ONE explicit s2d
       transpose into the resident tail + the t2 exit.
  t3   t2b with a fully s2d-resident exit (conv2 as a dense 52^2 512ch
       k3; conv3/downsample consume s2d directly -- no d2s transpose).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_s2d_region.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
N_SHORT, N_LONG = 8, 48


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true",
                    help="exactness checks only (CPU-friendly)")
    ap.add_argument("--res", type=int, default=416)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cris_tpu.ops.s2d import (
        conv1x1_s2d,
        conv3x3_s2d,
        depth_to_space,
        embed_pool2_conv1x1_s2d,
        pool2_conv1x1_s2d_to_s2d,
        space_to_depth,
        stem_conv1_s2d,
    )
    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    dt = jnp.bfloat16
    r = np.random.RandomState(0)

    def kern(*shape):
        return jnp.asarray(
            (r.randn(*shape) * (np.prod(shape[:-1]) ** -0.5)).astype(
                np.float32))

    W = {
        "stem1": kern(3, 3, 3, 32),
        "stem2": kern(3, 3, 32, 32),
        "stem3": kern(3, 3, 32, 64),
        # layer1: 3 bottlenecks (64 mid, 256 out)
        "b0c1": kern(1, 1, 64, 64),
        "b0c2": kern(3, 3, 64, 64),
        "b0c3": kern(1, 1, 64, 256),
        "b0ds": kern(1, 1, 64, 256),
        "b1c1": kern(1, 1, 256, 64),
        "b1c2": kern(3, 3, 64, 64),
        "b1c3": kern(1, 1, 64, 256),
        "b2c1": kern(1, 1, 256, 64),
        "b2c2": kern(3, 3, 64, 64),
        "b2c3": kern(1, 1, 64, 256),
        # layer2_0 (128 mid, 512 out, stride 2 as pool-fold)
        "l2c1": kern(1, 1, 256, 128),
        "l2c2": kern(3, 3, 128, 128),
        "l2c3": kern(1, 1, 128, 512),
        "l2ds": kern(1, 1, 256, 512),
    }

    relu = jax.nn.relu

    def conv(x, k, s=1, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, k.astype(dt), (s, s), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def consume_s2d_pooled(x, k):
        # avg over the s2d cell (== avg_pool2 of the base grid) + 1x1
        return conv(x, embed_pool2_conv1x1_s2d(k))

    def pool2_conv(x, k):
        # avg_pool2 + 1x1 as one k2s2 conv (PooledConv1x1 form)
        c, d = k.shape[2], k.shape[3]
        k2 = jnp.broadcast_to(k[0, 0] * 0.25, (2, 2, c, d))
        return conv(x, k2, 2, "VALID")

    def stem(x):
        x = relu(stem_conv1_s2d(x, W["stem1"], None, dt))
        x = relu(conv3x3_s2d(x, W["stem2"], None, dt))
        return relu(conv3x3_s2d(x, W["stem3"], None, dt))
        # -> (B, 104, 104, 256) == s2d of 208^2 x 64

    def block_plain(x, c1, c2, c3, ds=None):
        out = relu(conv(x, W[c1]))
        out = relu(conv(out, W[c2]))
        out = conv(out, W[c3])
        idn = conv(x, W[ds]) if ds else x
        return relu(out + idn)

    def block_resident(x, c1, c2, c3, ds=None):
        out = relu(conv1x1_s2d(x, W[c1], None, dt))
        out = relu(conv3x3_s2d(out, W[c2], None, dt))
        out = conv1x1_s2d(out, W[c3], None, dt)
        idn = conv1x1_s2d(x, W[ds], None, dt) if ds else x
        return relu(out + idn)

    def layer1_0_t1(xs):
        # tier 1: pooled convs consume s2d exactly; normal-layout output
        out = relu(consume_s2d_pooled(xs, W["b0c1"]))
        out = relu(conv(out, W["b0c2"]))
        out = conv(out, W["b0c3"])
        idn = consume_s2d_pooled(xs, W["b0ds"])
        return relu(out + idn)  # (B, 104, 104, 256)

    def layer1_0_t2(xs):
        # tier 2 entry: pooled convs emit s2d one cell level down
        def pc(x, k):
            return pool2_conv1x1_s2d_to_s2d(x, k, None, dt)
        out = relu(pc(xs, W["b0c1"]))
        out = relu(conv3x3_s2d(out, W["b0c2"], None, dt))
        out = conv1x1_s2d(out, W["b0c3"], None, dt)
        idn = pc(xs, W["b0ds"])
        return relu(out + idn)  # (B, 52, 52, 1024) == s2d of 104^2 x 256

    def layer2_0_plain(x):
        out = relu(conv(x, W["l2c1"]))
        out = relu(conv(out, W["l2c2"]))
        out = pool2_conv(out, W["l2c3"])
        idn = pool2_conv(x, W["l2ds"])
        return relu(out + idn)  # (B, 52, 52, 512)

    def layer2_0_exit(xs):
        # t2 exit: conv1 consumes s2d, d2s, normal conv2/conv3
        out = relu(conv1x1_s2d(xs, W["l2c1"], None, dt))
        out = depth_to_space(out)
        out = relu(conv(out, W["l2c2"]))
        out = pool2_conv(out, W["l2c3"])
        idn = consume_s2d_pooled(xs, W["l2ds"])
        return relu(out + idn)

    def layer2_0_exit_s2d(xs):
        # t3 exit: conv2 stays resident; conv3/downsample consume s2d
        out = relu(conv1x1_s2d(xs, W["l2c1"], None, dt))
        out = relu(conv3x3_s2d(out, W["l2c2"], None, dt))
        out = consume_s2d_pooled(out, W["l2c3"])
        idn = consume_s2d_pooled(xs, W["l2ds"])
        return relu(out + idn)

    def region_t1(x):
        h = layer1_0_t1(stem(x))
        h = block_plain(h, "b1c1", "b1c2", "b1c3")
        h = block_plain(h, "b2c1", "b2c2", "b2c3")
        return layer2_0_plain(h)

    def region_t2(x):
        h = layer1_0_t2(stem(x))
        h = block_resident(h, "b1c1", "b1c2", "b1c3")
        h = block_resident(h, "b2c1", "b2c2", "b2c3")
        return layer2_0_exit(h)

    def region_t2b(x):
        h = space_to_depth(layer1_0_t1(stem(x)))
        h = block_resident(h, "b1c1", "b1c2", "b1c3")
        h = block_resident(h, "b2c1", "b2c2", "b2c3")
        return layer2_0_exit(h)

    def region_t3(x):
        h = space_to_depth(layer1_0_t1(stem(x)))
        h = block_resident(h, "b1c1", "b1c2", "b1c3")
        h = block_resident(h, "b2c1", "b2c2", "b2c3")
        return layer2_0_exit_s2d(h)

    variants = [("t1", region_t1), ("t2", region_t2),
                ("t2b", region_t2b), ("t3", region_t3)]

    # -- exactness vs t1 (bf16: expect small relative deviations) -------
    R = args.res
    xs = jnp.asarray(r.randn(2, R, R, 3).astype(np.float32)).astype(dt)
    ref = np.asarray(region_t1(xs), np.float32)
    scale = np.abs(ref).mean()
    for name, fn in variants[1:]:
        got = np.asarray(fn(xs), np.float32)
        err = np.abs(got - ref).max() / scale
        print(f"  check {name}: max rel err {err:.4f}", flush=True)
        assert err < 0.15, (name, err)

    if args.check_only:
        print("  checks ok", flush=True)
        return

    # -- marginal timing -------------------------------------------------
    @partial(jax.jit, static_argnames=("n", "idx"))
    def run(xb, n, idx):
        fn = variants[idx][1]

        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xb, i % 4, 0, keepdims=False)
            return acc + fn(x).astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, n, body, 0.0)

    def make_x(seed):
        def gen(i):
            return jax.random.normal(
                jax.random.PRNGKey(seed + i), (BATCH, R, R, 3),
                jnp.float32).astype(dt)
        return jax.vmap(gen)(jnp.arange(4))

    print(f"\n== region marginal (b{BATCH}, n {N_SHORT}->{N_LONG}) ==",
          flush=True)
    for idx, (name, _) in enumerate(variants):
        ts = {}
        for n in (N_SHORT, N_LONG):
            xb = make_x(37 + n)
            jax.block_until_ready(xb)
            t0 = time.monotonic()
            float(run(xb, n, idx))
            tc = time.monotonic() - t0
            best = 1e9
            for rep in range(3):
                xb = make_x(1000 + 31 * rep + n + idx * 7)
                jax.block_until_ready(xb)
                t0 = time.monotonic()
                float(run(xb, n, idx))
                best = min(best, time.monotonic() - t0)
            ts[n] = best
        ms = (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
        print(f"  {name:4s} {ms:8.3f} ms/region  (compile {tc:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
