"""int8 microbench for the conv families NOT covered by QuantConv.

After min_ch=64 the remaining bf16 convs on the int8 eval path are the
upsample-fold lhs_dilated convs (~7.6 ms, running at ~95% of bf16 peak
on useful FLOPs -- int8's 2x peak could halve them), the pooled k2s2
convs (~3.1 ms), and the s2d stem convs (~2.7 ms). Each row compares
the production bf16 form against a static-scale int8 form (quantize
with a fixed scalar scale -> int8 conv w/ int32 accumulation ->
dequant). The open question for the ld2 rows is whether XLA's TPU int8
conv path supports lhs_dilation at MXU rate at all.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_int8_more.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
N_SHORT, N_LONG = 8, 56


def main():
    import jax
    import jax.numpy as jnp

    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    r = np.random.RandomState(0)

    def kern(*shape):
        return jnp.asarray(
            (r.randn(*shape) * (np.prod(shape[:-1]) ** -0.5)).astype(
                np.float32))

    def conv(x, k, s=1, pad="SAME", ld=1, acc=None):
        p = pad
        if ld > 1:
            kh = k.shape[0]
            p = [(kh // 2, kh // 2)] * 2
        return jax.lax.conv_general_dilated(
            x, k, (s, s), p,
            lhs_dilation=(ld, ld),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            **({"preferred_element_type": acc} if acc else {}))

    def q8(v, scale):
        return jnp.clip(jnp.round(v.astype(jnp.float32) / scale),
                        -127, 127).astype(jnp.int8)

    def bf16_form(x, k, **kw):
        return conv(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), **kw)

    def int8_form(x, k, **kw):
        kq, ks = _quant_k(k)
        y = conv(q8(x, 0.02), kq, acc=jnp.int32, **kw)
        return (y.astype(jnp.float32) * (0.02 * ks)).astype(jnp.bfloat16)

    def _quant_k(k):
        kf = k.astype(jnp.float32)
        axes = tuple(range(kf.ndim - 1))
        ks = jnp.max(jnp.abs(kf), axis=axes) / 127.0 + 1e-12
        return jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8), ks

    @partial(jax.jit, static_argnames=("n", "form", "kw"))
    def run(xb, k, n, form, kw):
        fn = {"bf16": bf16_form, "int8": int8_form}[form]

        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xb, i % 4, 0, keepdims=False)
            return acc + fn(x, k, **dict(kw)).astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, n, body, 0.0)

    def bench(label, shape, k, gflops_useful, **kw):
        kw_t = tuple(sorted(kw.items()))
        for form in ("bf16", "int8"):
            def make_x(seed):
                def gen(i):
                    return jax.random.normal(
                        jax.random.PRNGKey(seed + i), (BATCH,) + shape,
                        jnp.float32).astype(jnp.bfloat16)
                return jax.vmap(gen)(jnp.arange(4))

            try:
                ts = {}
                for n in (N_SHORT, N_LONG):
                    xb = make_x(11 + n)
                    jax.block_until_ready(xb)
                    t0 = time.monotonic()
                    float(run(xb, k, n, form, kw_t))
                    tc = time.monotonic() - t0
                    best = 1e9
                    for rep in range(3):
                        xb = make_x(1000 + 31 * rep + n)
                        jax.block_until_ready(xb)
                        t0 = time.monotonic()
                        float(run(xb, k, n, form, kw_t))
                        best = min(best, time.monotonic() - t0)
                    ts[n] = best
                ms = (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
                print(f"  {label:44s} {form}: {ms:7.3f} ms "
                      f"{gflops_useful / ms:6.1f} TF/s useful "
                      f"(compile {tc:.1f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:44s} {form}: FAILED {e!r}"[:140], flush=True)

    B = BATCH

    # upsample-fold lhs_dilated convs (projector vis_conv1/vis_conv2)
    from cris_tpu.ops.upsample_conv import fold_kernel6

    for h, ci, co in ((52, 512, 256), (26, 512, 512)):
        g = 2 * B * (2 * h) ** 2 * 9 * ci * co / 1e9  # useful flops
        bench(f"{h}^2 {ci}->{co} k6 ld2 (up-fold)", (h, h, ci),
              fold_kernel6(kern(3, 3, ci, co)), g, ld=2)

    # pooled k2s2 convs (PooledConv1x1 sites)
    for h, ci, co in ((104, 256, 512), (104, 128, 512), (52, 512, 1024),
                      (26, 1024, 2048)):
        k1 = kern(1, 1, ci, co)
        k2 = jnp.broadcast_to(k1[0, 0] * 0.25, (2, 2, ci, co))
        g = 2 * B * (h // 2) ** 2 * 4 * ci * co / 1e9
        bench(f"{h}^2 {ci}->{co} k2s2 (pool-fold)", (h, h, ci),
              k2, g, s=2, pad="VALID")

    # s2d stem convs (conv2/conv3 as embedded wide k3)
    from cris_tpu.ops.s2d import embed_conv3x3_s2d

    for ci, co in ((32, 32), (32, 64)):
        k = embed_conv3x3_s2d(kern(3, 3, ci, co))
        g = 2 * B * 104 ** 2 * k.shape[0] * k.shape[1] * 4 * ci * 4 * co / 1e9
        bench(f"104^2 s2d {4*ci}->{4*co} embedded k3", (104, 104, 4 * ci),
              k, g, pad=((1, 1), (1, 1)))


if __name__ == "__main__":
    main()
