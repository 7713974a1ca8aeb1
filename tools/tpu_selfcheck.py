"""On-TPU validation of the Pallas kernels that CPU CI cannot cover.

pltpu.prng has no CPU interpret support, so the dropout-attention kernels'
mask behavior is only checkable on real TPU hardware (ADVICE r2: protect
against JAX/Mosaic PRNG behavior changes with a TPU-side re-run of the
mask-extraction validation). This tool re-runs, on the live device:

1. fused_attention_bse vs the XLA attention path at model shapes;
2. dropout kernel rate=0 == deterministic kernel;
3. dropout determinism (same seed -> bit-identical, new seed -> differs);
4. mask extraction via uniform-attention one-hot V: empirical keep rate
   within binomial bounds, inverted-dropout scaling exact;
5. analytic gradient self-consistency of the custom VJP (dv path exposes
   the regenerated backward mask; FD is useless in bf16 matmul noise).

Run (on the axon TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/tpu_selfcheck.py
Exit code 0 = all checks passed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FAILURES = []


def check(name, fn):
    import traceback

    try:
        fn()
        print(f"PASS {name}", flush=True)
    except Exception:
        FAILURES.append(name)
        print(f"FAIL {name}\n{traceback.format_exc()}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from cris_tpu.ops.attention import dot_product_attention
    from cris_tpu.ops.pallas.attention import fused_attention_bse
    from cris_tpu.ops.pallas.attention_train import (
        fused_attention_bse_dropout,
    )

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    # decoder cross-attention shape (q=676 visual tokens, kv=17 words)
    b, h, s, t, d = 4, 8, 676, 17, 64
    q = jnp.asarray(rng.randn(b, s, h * d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h * d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h * d).astype(np.float32))
    kv_valid = jnp.asarray(np.arange(t)[None, :] < 12).repeat(b, 0)

    from cris_tpu.ops.pallas import pallas_mode

    def xla_attn():
        # pallas_mode is lru_cached: clear around the env toggle
        os.environ["CRIS_PALLAS"] = "0"
        pallas_mode.cache_clear()
        try:
            return dot_product_attention(
                q, k, v, h, key_padding_mask=~kv_valid
            )
        finally:
            os.environ["CRIS_PALLAS"] = "1"
            pallas_mode.cache_clear()

    def check_bse_vs_xla():
        ref = np.asarray(xla_attn())
        got = np.asarray(fused_attention_bse(q, k, v, h, kv_valid, None, False))
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
        assert np.abs(got - ref).mean() < 2e-3

    check("fused_attention_bse vs XLA (decoder cross-attn shape)",
          check_bse_vs_xla)

    def check_rate0():
        a = np.asarray(fused_attention_bse(q, k, v, h, kv_valid, None, False))
        z = np.asarray(fused_attention_bse_dropout(
            q, k, v, h, kv_valid, 0.0, jnp.int32(42), False))
        np.testing.assert_allclose(z, a, rtol=1e-5, atol=1e-5)

    check("dropout kernel rate=0 == deterministic kernel", check_rate0)

    def check_determinism():
        o1 = np.asarray(fused_attention_bse_dropout(
            q, k, v, h, kv_valid, 0.3, jnp.int32(7), False))
        o2 = np.asarray(fused_attention_bse_dropout(
            q, k, v, h, kv_valid, 0.3, jnp.int32(7), False))
        o3 = np.asarray(fused_attention_bse_dropout(
            q, k, v, h, kv_valid, 0.3, jnp.int32(8), False))
        np.testing.assert_array_equal(o1, o2)
        assert np.abs(o1 - o3).max() > 0

    check("dropout determinism per seed", check_determinism)

    def check_mask_statistics():
        # uniform attention (q=0, k=0) + all-ones V: each output element is
        # mean_j(keep_j / (1-rate)); over many rows the empirical keep rate
        # must sit inside 6-sigma binomial bounds
        rate = 0.5
        s2, t2 = 256, 256
        q0 = jnp.zeros((2, s2, h * d))
        k0 = jnp.zeros((2, t2, h * d))
        v1 = jnp.ones((2, t2, h * d))
        out = np.asarray(fused_attention_bse_dropout(
            q0, k0, v1, h, None, rate, jnp.int32(5), False)).astype(np.float64)
        keep_hat = out.mean() * (1.0 - rate)
        # independent mask bits: one (t2,)-vector per (batch, row, HEAD) --
        # the d feature dims within a head share the SAME bits, so they
        # don't count (out.size*t2 would overstate n by d and turn the
        # 6-sigma bound into ~1.2 sigma => ~20% false-failure rate)
        n = out.size // d * t2
        sigma = np.sqrt(rate * (1 - rate) / n)
        assert abs(keep_hat - (1 - rate)) < 6 * max(sigma, 1e-4), (
            keep_hat, sigma
        )
        # per-element values must be multiples of 1/((1-rate)*t2) -- the
        # inverted-dropout scaling is exact, not approximate
        scaled = out * (1.0 - rate) * t2
        np.testing.assert_allclose(scaled, np.round(scaled), atol=0.51)

    check("mask extraction statistics (uniform attn, ones V)",
          check_mask_statistics)

    def check_grad_selfconsistency():
        # with uniform attention, d loss / d v for loss=sum(out) equals
        # (regenerated bwd mask) summed over query rows / ((1-rate)*t);
        # comparing against the forward's extracted mask proves fwd and
        # bwd regenerate the SAME bits
        rate = 0.3
        s2, t2 = 128, 128
        q0 = jnp.zeros((1, s2, h * d))
        k0 = jnp.zeros((1, t2, h * d))

        def loss(v):
            return fused_attention_bse_dropout(
                q0, k0, v, h, None, rate, jnp.int32(9), False
            ).astype(jnp.float32).sum()

        v0 = jnp.zeros((1, t2, h * d))
        g = np.asarray(jax.grad(loss)(v0)).astype(np.float64)
        # forward mask extraction: out[b,i,(hd+c)] with one-hot V column c
        # is keep[b,h,i,c]/((1-rate)*t2)... instead use linearity: for
        # v=ones the fwd output row sums give sum_j keep[...,j]; the grad
        # g[b,j,hd+c] = sum_i keep[b,h,i,j]/((1-rate)*t2) for every c --
        # so g must be constant across the within-head feature dim
        gh = g.reshape(1, t2, h, d)
        assert np.abs(gh - gh.mean(axis=3, keepdims=True)).max() < 1e-6
        # and the implied keep-count must be integral -- up to the bf16
        # rounding of the scaled weights before the MXU matmul (the bwd
        # casts p*inv_keep to bf16, e.g. 1/0.7 -> 1.4296875 == a uniform
        # +7.8e-4 relative factor; the XLA fallback rounds its scaled
        # weights to bf16 identically). counts <= s2=128, so bf16-scale
        # error <= ~0.15 absolute; 0.25 still separates integers cleanly.
        counts = gh[..., 0] * (1.0 - rate) * t2
        np.testing.assert_allclose(counts, np.round(counts), atol=0.25)
        # total keep fraction sane
        frac = counts.sum() / (t2 * s2 * h) / 1.0
        assert 0.6 < frac / (1 - rate) < 1.4, frac

    check("fwd/bwd mask regeneration self-consistency", check_grad_selfconsistency)

    print(f"\n{len(FAILURES)} failure(s)" if FAILURES else "\nALL CHECKS PASSED",
          flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
