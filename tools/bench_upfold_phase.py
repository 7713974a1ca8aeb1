"""Phase-decomposed alternative for the upsample-fold convs (VERDICT r5
task 1 fallback: "try the equivalent strided-form rewrite before writing
the negative").

Measured facts this targets (tools/bench_int8_more.py ld2 rows + in-model
ab_int8): XLA's TPU int8 conv path runs lhs_dilated convs at bf16 speed
(no 2x), so quantizing the ld2 cores LOSES in-model (1000.2 -> 966.0
img/s). The ld2 bf16 core executes ~9 MACs/output (190 TF/s on that
count).

The phase form: conv3x3(up2x_nearest(x)) splits by output phase
(di,dj in {0,1}^2) into FOUR plain k2x2 convs on x directly -- each
output pixel sees at most 2 distinct input rows/cols, so the 3x3 taps
pair-sum into a 2x2 kernel per phase:

    rows(di=0) = (i-1, i) with row-weights (w0, w1+w2), pad (1,0)
    rows(di=1) = (i, i+1) with row-weights (w0+w1, w2), pad (0,1)

(cols identically). That is 4 MACs/output -- 2.25x fewer than the ld2
core -- in non-dilated convs that CAN hit the int8 2x rate. The open
cost is the phase interleave (B,H,W,2,2,C)->(B,2H,2W,C): round-1
measured stack+reshape interleaves as fusion-killers for pure upsample;
here convs dominate, so it may amortize. Forms per site:

    ld2_bf16     production core (reference timing)
    ld2_int8     known negative (no 2x on dilated)
    phase_bf16   4x k2 convs + interleave
    phase_int8   quantize once, 4x int8 k2 convs + interleave
    phase_int8_res  int8 phase convs, NO interleave (phase-resident
                 upper bound -- what a layout-resident consumer would see)

Border exactness is ignored here (timing only); the production wiring
would reuse apply_border_correction3x3.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3300 \
        python tools/bench_upfold_phase.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
N_SHORT, N_LONG = 8, 56


def phase_kernels(w):
    """(3,3,Ci,Co) -> {(di,dj): (2,2,Ci,Co)} pair-summed phase kernels."""
    import jax.numpy as jnp

    rows = {0: (w[0], w[1] + w[2]), 1: (w[0] + w[1], w[2])}

    def pair_cols(r2):  # r2: (2, 3, Ci, Co) -> {dj: (2,2,Ci,Co)}
        return {
            0: jnp.stack([r2[:, 0], r2[:, 1] + r2[:, 2]], axis=1),
            1: jnp.stack([r2[:, 0] + r2[:, 1], r2[:, 2]], axis=1),
        }

    out = {}
    for di, (ra, rb) in rows.items():
        r2 = jnp.stack([ra, rb], axis=0)  # (2, 3, Ci, Co)
        for dj, k in pair_cols(r2).items():
            out[(di, dj)] = k
    return out


PHASE_PAD = {0: (1, 0), 1: (0, 1)}


def main():
    import jax
    import jax.numpy as jnp

    from tools._bench_common import probe

    print("devices:", jax.devices(), flush=True)
    probe()

    r = np.random.RandomState(0)

    def conv(x, k, pad, ld=1, acc=None):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, lhs_dilation=(ld, ld),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            **({"preferred_element_type": acc} if acc else {}))

    def q8(v, scale):
        return jnp.clip(jnp.round(v.astype(jnp.float32) / scale),
                        -127, 127).astype(jnp.int8)

    def quant_k(k):
        kf = k.astype(jnp.float32)
        axes = tuple(range(kf.ndim - 1))
        ks = jnp.max(jnp.abs(kf), axis=axes) / 127.0 + 1e-12
        return jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8), ks

    def interleave(ys):
        # ys[(di,dj)]: (B,H,W,C) -> (B,2H,2W,C)
        b, h, w_, c = ys[(0, 0)].shape
        z = jnp.stack(
            [jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=3),
             jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=3)],
            axis=2)  # (B,H,2,W,2,C)
        return z.reshape(b, 2 * h, 2 * w_, c)

    def make_forms(k3):
        from cris_tpu.ops.upsample_conv import fold_kernel6

        k6 = fold_kernel6(k3)
        pk = phase_kernels(k3)
        k6_bf = k6.astype(jnp.bfloat16)
        pk_bf = {p: k.astype(jnp.bfloat16) for p, k in pk.items()}
        k6_q = quant_k(k6)
        pk_q = {p: quant_k(k) for p, k in pk.items()}

        def ld2_bf16(x):
            return conv(x, k6_bf, [(3, 3), (3, 3)], ld=2)

        def ld2_int8(x):
            kq, ks = k6_q
            y = conv(q8(x, 0.02), kq, [(3, 3), (3, 3)], ld=2, acc=jnp.int32)
            return (y.astype(jnp.float32) * (0.02 * ks)).astype(jnp.bfloat16)

        def phase_bf16(x):
            ys = {p: conv(x, pk_bf[p],
                          [PHASE_PAD[p[0]], PHASE_PAD[p[1]]])
                  for p in pk_bf}
            return interleave(ys)

        def _phase_int8(x):
            xq = q8(x, 0.02)
            out = {}
            for p, (kq, ks) in pk_q.items():
                y = conv(xq, kq, [PHASE_PAD[p[0]], PHASE_PAD[p[1]]],
                         acc=jnp.int32)
                out[p] = (y.astype(jnp.float32) * (0.02 * ks)
                          ).astype(jnp.bfloat16)
            return out

        def phase_int8(x):
            return interleave(_phase_int8(x))

        def phase_int8_res(x):
            ys = _phase_int8(x)
            # consume without interleaving (phase-resident upper bound)
            return sum(y.astype(jnp.float32).mean() for y in ys.values())

        return {"ld2_bf16": ld2_bf16, "ld2_int8": ld2_int8,
                "phase_bf16": phase_bf16, "phase_int8": phase_int8,
                "phase_int8_res": phase_int8_res}

    def bench(label, shape, forms, gflops_useful):
        @partial(jax.jit, static_argnames=("n", "name"))
        def run(xb, n, name):
            fn = forms[name]

            def body(i, acc):
                x = jax.lax.dynamic_index_in_dim(xb, i % 4, 0, keepdims=False)
                y = fn(x)
                if isinstance(y, jnp.ndarray) and y.ndim:
                    y = y.astype(jnp.float32).mean()
                return acc + y

            return jax.lax.fori_loop(0, n, body, 0.0)

        def make_x(seed):
            def gen(i):
                return jax.random.normal(
                    jax.random.PRNGKey(seed + i), (BATCH,) + shape,
                    jnp.float32).astype(jnp.bfloat16)
            return jax.vmap(gen)(jnp.arange(4))

        base = None
        for name in forms:
            try:
                ts = {}
                for n in (N_SHORT, N_LONG):
                    xb = make_x(11 + n)
                    jax.block_until_ready(xb)
                    t0 = time.monotonic()
                    float(run(xb, n, name))
                    tc = time.monotonic() - t0
                    best = 1e9
                    for rep in range(3):
                        xb = make_x(1000 + 31 * rep + n)
                        jax.block_until_ready(xb)
                        t0 = time.monotonic()
                        float(run(xb, n, name))
                        best = min(best, time.monotonic() - t0)
                    ts[n] = best
                ms = (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT) * 1e3
                if name == "ld2_bf16":
                    base = ms
                rel = f" ({base / ms:.2f}x vs ld2_bf16)" if base else ""
                print(f"  {label:28s} {name:15s} {ms:7.3f} ms "
                      f"{gflops_useful / ms:6.1f} TF/s-useful{rel} "
                      f"(compile {tc:.1f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:28s} {name:15s} FAILED {e!r}"[:160],
                      flush=True)

    def kern(*shape):
        return jnp.asarray(
            (r.randn(*shape) * (np.prod(shape[:-1]) ** -0.5)
             ).astype(np.float32))

    for h, ci, co in ((52, 512, 256), (26, 512, 512)):
        k3 = kern(3, 3, ci, co)
        g = 2 * BATCH * (2 * h) ** 2 * 9 * ci * co / 1e9
        bench(f"{h}^2 {ci}->{co} up-conv3x3", (h, h, ci),
              make_forms(k3), g)


if __name__ == "__main__":
    main()
