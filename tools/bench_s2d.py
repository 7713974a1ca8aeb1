"""Space-to-depth reformulation microbench for the stem/layer1 shapes.

The round-4 conv audit (tools/conv_audit.py) shows the R50 eval forward
spends ~17 of 40 ms in the stem + layer1 region (208^2/104^2 spatial,
32-256 channels) at 5-30 TF/s -- the small channel counts waste the
MXU's 128-wide K/N tiles and XLA's large-spatial lowering is poor. All
of these ops have exact wide-channel reformulations in a space-to-depth
(s2d) layout:

  A. a k2x2/s2 conv IS s2d + 1x1 matmul (non-overlapping windows);
  B. a 3x3/s1 conv at HxW/C == a k2x2/s1 conv at (H/2)x(W/2)/4C in s2d
     layout whose dense kernel embeds the 3x3 taps (16/9 nominal-FLOP
     overcount, but every matmul is >=128 wide);
  C. a 1x1 conv in s2d layout == the SAME matmul (per-phase); a dense
     cross-phase matmul with a block-diagonal kernel is exact at 4x
     nominal FLOPs but full MXU width.

Round-3's negative ("s2d of conv3 lost: the transpose dominates") did
the transpose PER CONV; the open question this tool answers is whether
each piece wins once the whole region stays resident in s2d layout
(transpose paid once at entry/exit), and what the transposes cost.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_s2d.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
N_SHORT, N_LONG = 8, 88


def timed_loop(fn_body, make_x, weights):
    """Marginal ms of fn_body(x, *weights) with the fori_loop-over-
    stacked-inputs methodology (see tools/conv_audit.py bench_one)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(xs, n, *w):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xs, i % 8, 0, keepdims=False)
            y = fn_body(x, *w)
            return acc + y.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, 0.0)

    ts = {}
    for n in (N_SHORT, N_LONG):
        xs = make_x(11 + n)
        jax.block_until_ready(xs)
        t0 = time.monotonic()
        float(run(xs, n, *weights))
        tc = time.monotonic() - t0
        best = 1e9
        for rep in range(3):
            xs = make_x(1000 + 31 * rep + n)
            jax.block_until_ready(xs)
            t0 = time.monotonic()
            float(run(xs, n, *weights))
            best = min(best, time.monotonic() - t0)
        ts[n] = best
        del xs
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT) * 1e3, tc


def main():
    import jax
    import jax.numpy as jnp

    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    def make_x_of(shape):
        # shape EXCLUDES batch; the stacked buffer is (8, BATCH, *shape)
        # (the first audit run passed 3-D arrays into 4-D convs)
        def make_x(seed):
            def gen(i):
                return jax.random.normal(
                    jax.random.PRNGKey(seed + i), (BATCH,) + shape,
                    jnp.float32).astype(jnp.bfloat16)
            return jax.vmap(gen)(jnp.arange(8))
        return make_x

    def kern(*shape):
        r = np.random.RandomState(0)
        return jnp.asarray(
            (r.randn(*shape) * (np.prod(shape[:-1]) ** -0.5)
             ).astype(np.float32)).astype(jnp.bfloat16)

    def conv(x, k, s=1):
        return jax.lax.conv_general_dilated(
            x, k, (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def s2d(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // 2, w // 2, 4 * c)

    def d2s(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, 2, 2, c // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, 2 * h, 2 * w, c // 4)

    results = {}

    def bench(label, fn, make_x, weights, gflops):
        try:
            ms, tc = timed_loop(fn, make_x, weights)
        except Exception as e:  # noqa: BLE001
            print(f"  {label}: FAILED {e!r}", flush=True)
            return
        results[label] = ms
        print(f"  {label:52s} {ms:7.3f} ms  {gflops / ms:6.1f} TF/s  "
              f"(compile {tc:.1f}s)", flush=True)

    B = BATCH

    # --- A. the k2x2/s2 pool-fold convs (stem tail / shortcut) ---------
    for h, cin, cout in ((208, 64, 64), (208, 64, 256)):
        g = 2 * B * (h // 2) ** 2 * cout * 4 * cin / 1e9
        mk = make_x_of((h, h, cin))
        bench(f"{h}^2 {cin}->{cout} k2s2 conv",
              lambda x, k: conv(x, k, 2), mk, (kern(2, 2, cin, cout),), g)
        bench(f"{h}^2 {cin}->{cout} s2d+matmul",
              lambda x, k: jnp.einsum("bhwc,cd->bhwd", s2d(x), k),
              mk, (kern(4 * cin, cout),), g)
        bench(f"{h}^2 {cin}->{cout} s2d+1x1conv",
              lambda x, k: conv(s2d(x), k),
              mk, (kern(1, 1, 4 * cin, cout),), g)
        # input ALREADY s2d-resident: the in-region formulation
        mk2 = make_x_of((h // 2, h // 2, 4 * cin))
        bench(f"  [s2d-res] {h // 2}^2 {4 * cin}->{cout} 1x1",
              lambda x, k: conv(x, k), mk2, (kern(1, 1, 4 * cin, cout),), g)

    # --- B. 3x3/s1 convs in s2d layout ---------------------------------
    # the TRUE equivalent of a 3x3/s1 conv on the original grid is a
    # k3x3 dense conv over s2d cells (odd-kernel phase alignment spans
    # cells i-1..i+1): 4x nominal FLOPs, but every matmul >=128 wide.
    # k2x2 is benched too as the even-kernel / lower bound shape.
    for h, c in ((208, 32), (104, 64)):
        g_orig = 2 * B * h * h * c * 9 * c / 1e9
        bench(f"{h}^2 {c}ch 3x3 conv", lambda x, k: conv(x, k),
              make_x_of((h, h, c)), (kern(3, 3, c, c),), g_orig)
        mk2 = make_x_of((h // 2, h // 2, 4 * c))
        bench(f"  [s2d-res] {h // 2}^2 {4 * c}ch k3x3 (==3x3, 4x fl)",
              lambda x, k: conv(x, k), mk2,
              (kern(3, 3, 4 * c, 4 * c),),
              2 * B * (h // 2) ** 2 * 9 * 4 * c * 4 * c / 1e9)
        bench(f"  [s2d-res] {h // 2}^2 {4 * c}ch k2x2 (lower bd)",
              lambda x, k: conv(x, k), mk2,
              (kern(2, 2, 4 * c, 4 * c),),
              2 * B * (h // 2) ** 2 * 4 * 4 * c * 4 * c / 1e9)

    # --- C. 1x1 convs: per-phase (same matmul) vs dense cross-phase ----
    for h, cin, cout in ((104, 64, 256), (104, 256, 64)):
        g = 2 * B * h * h * cout * cin / 1e9
        bench(f"{h}^2 {cin}->{cout} 1x1 conv", lambda x, k: conv(x, k),
              make_x_of((h, h, cin)), (kern(1, 1, cin, cout),), g)
        # dense cross-phase in s2d layout: 4x nominal FLOPs, full width
        mk3 = make_x_of((h // 2, h // 2, 4 * cin))
        bench(f"  [s2d-res] {h // 2}^2 dense {4 * cin}->{4 * cout} 1x1",
              lambda x, k: conv(x, k), mk3,
              (kern(1, 1, 4 * cin, 4 * cout),), 4 * g)
        # per-phase (exact-FLOP) as a grouped 1x1 conv, groups=4
        bench(f"  [s2d-res] {h // 2}^2 grp4 {4 * cin}->{4 * cout} 1x1",
              lambda x, k: jax.lax.conv_general_dilated(
                  x, k, (1, 1), "SAME",
                  dimension_numbers=("NHWC", "HWIO", "NHWC"),
                  feature_group_count=4),
              mk3, (kern(1, 1, cin, 4 * cout),), g)

    # --- D. the layout transposes themselves ---------------------------
    for h, c in ((208, 64), (104, 256)):
        g = 0.0
        bench(f"{h}^2 {c}ch s2d transpose", lambda x: s2d(x) * 1.0,
              make_x_of((h, h, c)), (), 1e-9)
        bench(f"{h // 2}^2 {4 * c}ch d2s transpose", lambda x: d2s(x) * 1.0,
              make_x_of((h // 2, h // 2, 4 * c)), (), 1e-9)

    # --- E. stem conv1 at s2d output layout ----------------------------
    # current: 416^2 3->32 k3 s2 -> 208^2x32. s2d-direct: k5(pad to 6)
    # s4 3->128 -> 104^2x128 (embeds the 2x2 phases)
    g1 = 2 * B * 208 * 208 * 32 * 9 * 3 / 1e9
    bench("416^2 3->32 k3s2 conv (stem conv1)",
          lambda x, k: conv(x, k, 2), make_x_of((416, 416, 3)),
          (kern(3, 3, 3, 32),), g1)
    g1b = 2 * B * 104 * 104 * 128 * 25 * 3 / 1e9
    bench("416^2 3->128 k5s4 conv (conv1 s2d-direct)",
          lambda x, k: jax.lax.conv_general_dilated(
              x, k, (4, 4), [(2, 2), (2, 2)],
              dimension_numbers=("NHWC", "HWIO", "NHWC")),
          make_x_of((416, 416, 3)), (kern(5, 5, 3, 128),), g1b)

    print("\n== summary (ms) ==", flush=True)
    for k, v in results.items():
        print(f"  {k:56s} {v:7.3f}", flush=True)


if __name__ == "__main__":
    main()
