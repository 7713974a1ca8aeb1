"""Phase-decomposed alternative for the upsample-fold convs (VERDICT r5
task 1 fallback: "try the equivalent strided-form rewrite before writing
the negative").

Measured facts this targets (tools/bench_int8_more.py ld2 rows + in-model
ab_int8): XLA's TPU int8 conv path runs lhs_dilated convs at bf16 speed
(no 2x), so quantizing the ld2 cores LOSES in-model (1000.2 -> 966.0
img/s). The ld2 bf16 core executes ~9 MACs/output (190 TF/s on that
count).

The phase form: conv3x3(up2x_bilinear(x)) splits by output phase
(di,dj in {0,1}^2) into FOUR plain k3x3 convs on x directly. The
production upsample is bilinear align_corners=False (taps 1/4, 3/4 --
ops/upsample_conv.py module docstring), so upsampled row 2i mixes
x[i-1], x[i] with (1/4, 3/4) and row 2i+1 mixes x[i], x[i+1] with
(3/4, 1/4); the conv3x3 window over three such rows spans x rows
i-1..i+1, i.e. each phase is an ordinary 3x3 conv whose kernel is

    k_phase[di,dj][u,v] = sum_ab w[a,b] rho[di][a,u] rho[dj][b,v]
    rho[0] = [[3/4,1/4,0],[1/4,3/4,0],[0,3/4,1/4]]   (tap a -> offset u)
    rho[1] = [[1/4,3/4,0],[0,3/4,1/4],[0,1/4,3/4]]

Same 9 useful MACs/output as the ld2 core, but in NON-dilated convs
that run at full MXU rate AND are int8-2x-eligible (the ld2 form is
not -- the measured ld2 negative this tool follows up on). The open
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


RHO = (
    ((0.75, 0.25, 0.0), (0.25, 0.75, 0.0), (0.0, 0.75, 0.25)),  # di=0
    ((0.25, 0.75, 0.0), (0.0, 0.75, 0.25), (0.0, 0.25, 0.75)),  # di=1
)


def phase_kernels(w):
    """(3,3,Ci,Co) -> {(di,dj): (3,3,Ci,Co)} bilinear phase kernels."""
    import jax.numpy as jnp

    wf = w.astype(jnp.float32)
    out = {}
    for di in (0, 1):
        for dj in (0, 1):
            r0 = jnp.asarray(RHO[di], jnp.float32)
            r1 = jnp.asarray(RHO[dj], jnp.float32)
            out[(di, dj)] = jnp.einsum(
                "au,bv,ab...->uv...", r0, r1, wf).astype(w.dtype)
    return out


PHASE_PAD = {0: (1, 1), 1: (1, 1)}


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

    # correctness gate: interior of the interleaved phase form must match
    # the production fold to f32 rounding (borders legitimately differ:
    # clamped-source upsample vs the phase convs' zero padding -- a
    # production wiring would add thin border corrections like the ld2
    # path's)
    from cris_tpu.ops.upsample_conv import upsample2x_conv3x3

    x0 = jnp.asarray(r.randn(2, 8, 8, 5).astype(np.float32))
    w0 = jnp.asarray(r.randn(3, 3, 5, 4).astype(np.float32) * 0.2)
    ref = upsample2x_conv3x3(x0, w0, None)
    ys0 = {p: conv(x0, k, [PHASE_PAD[p[0]], PHASE_PAD[p[1]]])
           for p, k in phase_kernels(w0).items()}
    got = interleave(ys0)
    err = float(jnp.max(jnp.abs(
        ref[:, 2:-2, 2:-2] - got[:, 2:-2, 2:-2])))
    print(f"phase-form interior max err vs production fold: {err:.2e}",
          flush=True)
    # CPU-exact to 7e-7 (validated round 5); on TPU the default-precision
    # f32 convs run bf16 passes, so allow that rounding here
    assert err < 0.05, err

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
