"""Fused attention with attention-weight dropout, fwd AND bwd in Pallas.

The training decoder applies dropout to the softmax weights (torch
``nn.MultiheadAttention(dropout=p)`` semantics -- inverted dropout on the
normalized weights, /root/reference/model/layers.py:190-207), which forced
the train path onto the XLA attention: the (B, 8, 676, 676) fp32 weight
tensors are materialized in HBM in the forward AND recomputed in the
backward. Profiled on v5e at b32 that is ~47 ms of the 220 ms train step
(fwd + bwd across the 3 decoder layers).

These kernels keep the logits in VMEM in both directions. The grid is
(batch, head); each program's q/k/v blocks slice that head's D-lane span
of the (B, S, E) arrays directly in the BlockSpec index map -- block DMA
has no vector-layout constraint, so the (B, S, E) layout is consumed
without any head split/merge transpose, and only one head's (Sq, T) f32
logits are ever live (Mosaic's scoped allocator does not reuse buffers
across an unrolled head loop; an all-heads-per-program variant OOMs at
the decoder's 768x768 logits x 8 heads).

The dropout mask is never materialized: both kernels regenerate identical
keep-masks from the TPU PRNG, re-seeding deterministically per
(batch, head) -- ``seed_base + batch_idx * num_heads + head`` -- so the
forward and backward streams agree by construction.

Numerics: logits/softmax in f32 (same max-subtraction form as the XLA
path), matmuls with f32 accumulation; with rate=0 the forward equals
fused_attention_bse exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the current PRNG stream."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    # keep iff bits >= rate * 2^32  (uniform in [0, 2^32))
    thresh = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _softmax_parts(q, k, mask, scale):
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask > 0, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, l


def _seed_for(seed_ref, num_heads: int, heads_per_block: int, j: int):
    head = pl.program_id(1) * heads_per_block + j
    return seed_ref[0, 0] + pl.program_id(0) * num_heads + head


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, num_heads: int, rate: float, hpb: int):
    qb = q_ref[0]  # (Sq, hpb*D) -- this head-block's lane span
    kb = k_ref[0]  # (T, hpb*D)
    vb = v_ref[0]
    mask = mask_ref[0]  # (1, T)
    d = qb.shape[-1] // hpb
    outs = []
    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)
        p, l = _softmax_parts(qb[:, sl], kb[:, sl], mask, scale)
        pltpu.prng_seed(_seed_for(seed_ref, num_heads, hpb, j))
        pd = jnp.where(_keep_mask(p.shape, rate), p, 0.0)
        o = jax.lax.dot_general(
            pd.astype(vb.dtype), vb[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o * (1.0 / (1.0 - rate)) / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *,
                scale: float, num_heads: int, rate: float, hpb: int):
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    gb = g_ref[0]
    mask = mask_ref[0]
    inv_keep = 1.0 / (1.0 - rate)
    d = qb.shape[-1] // hpb
    dqs, dks, dvs = [], [], []
    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)
        q, k, v = qb[:, sl], kb[:, sl], vb[:, sl]
        p, l = _softmax_parts(q, k, mask, scale)
        w = p / l  # normalized weights W
        pltpu.prng_seed(_seed_for(seed_ref, num_heads, hpb, j))
        keep = _keep_mask(p.shape, rate)

        # dV = Wd^T g,  Wd = keep * W * inv_keep
        wd = jnp.where(keep, w, 0.0) * inv_keep
        g32 = gb[:, sl].astype(jnp.float32)
        dvs.append(jax.lax.dot_general(
            wd.astype(v.dtype), g32.astype(v.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        # dW = keep * (g V^T) * inv_keep ; dS = W * (dW - rowsum(dW * W))
        dwd = jax.lax.dot_general(
            g32.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw = jnp.where(keep, dwd, 0.0) * inv_keep
        ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        dqs.append(jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
        dks.append(jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


def _prep(q, k, v, kv_valid):
    b, s, e = q.shape
    t = k.shape[1]
    s_pad = _round_up(s, 128)
    t_pad = _round_up(max(t, 128), 128)
    if kv_valid is None:
        valid = jnp.ones((b, t), jnp.int32)
    else:
        valid = kv_valid.astype(jnp.int32)
    valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))[:, None, :]
    qp = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))
    return qp, kp, vp, valid, s_pad, t_pad


def supports_shape(num_heads: int, d: int) -> bool:
    """Lane blocks must be >= 128 wide: d must divide 128 with the head
    count divisible by the resulting pair size, or be >= 128 itself."""
    if d >= 128:
        return d % 128 == 0
    return 128 % d == 0 and num_heads % (128 // d) == 0


def _head_blocking(num_heads: int, d: int):
    """Heads per grid block (pairs for 64-dim heads -- see
    supports_shape, which callers must consult first)."""
    return max(1, 128 // d)


def _head_specs(s_pad, t_pad, db):
    """q/k/v/mask block specs: grid (batch, head-block), lane-blocked."""
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, s_pad, db), lambda bi, hi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t_pad, db), lambda bi, hi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t_pad, db), lambda bi, hi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t_pad), lambda bi, hi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 7))
def fused_attention_bse_dropout(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    kv_valid: Optional[jnp.ndarray],
    rate: float,
    seed: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention over (B, S, E) with attention-weight dropout.

    rate: dropout probability (static); seed: int32 scalar array -- vary
    it per train step (fold the step RNG into it). Differentiable in
    q/k/v; the backward regenerates the identical dropout mask in-kernel.
    """
    return _fwd_impl(q, k, v, num_heads, kv_valid, rate, seed, interpret)


def _fwd_impl(q, k, v, num_heads, kv_valid, rate, seed, interpret):
    b, s, e = q.shape
    d = e // num_heads
    if not supports_shape(num_heads, d):
        raise ValueError(
            f"unsupported head shape for the dropout kernel: "
            f"num_heads={num_heads}, head_dim={d} (see supports_shape)"
        )
    scale = d**-0.5
    hpb = _head_blocking(num_heads, d)
    db = d * hpb
    qp, kp, vp, valid, s_pad, t_pad = _prep(q, k, v, kv_valid)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads,
                          rate=rate, hpb=hpb),
        grid=(b, num_heads // hpb),
        in_specs=_head_specs(s_pad, t_pad, db),
        out_specs=pl.BlockSpec((1, s_pad, db), lambda bi, hi: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), q.dtype),
        interpret=interpret,
    )(seed_arr, qp, kp, vp, valid)
    return out[:, :s, :]


def _fwd_rule(q, k, v, num_heads, kv_valid, rate, seed, interpret):
    out = _fwd_impl(q, k, v, num_heads, kv_valid, rate, seed, interpret)
    return out, (q, k, v, kv_valid, seed)


def _bwd_rule(num_heads, rate, interpret, residuals, g):
    q, k, v, kv_valid, seed = residuals
    b, s, e = q.shape
    t = k.shape[1]
    d = e // num_heads
    scale = d**-0.5
    hpb = _head_blocking(num_heads, d)
    db = d * hpb
    qp, kp, vp, valid, s_pad, t_pad = _prep(q, k, v, kv_valid)
    gp = jnp.pad(g, ((0, 0), (0, s_pad - s), (0, 0)))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=num_heads,
                          rate=rate, hpb=hpb),
        grid=(b, num_heads // hpb),
        in_specs=_head_specs(s_pad, t_pad, db) + [
            pl.BlockSpec((1, s_pad, db), lambda bi, hi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s_pad, db), lambda bi, hi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, db), lambda bi, hi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, db), lambda bi, hi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad, e), q.dtype),
            jax.ShapeDtypeStruct((b, t_pad, e), k.dtype),
            jax.ShapeDtypeStruct((b, t_pad, e), v.dtype),
        ],
        interpret=interpret,
    )(seed_arr, qp, kp, vp, valid, gp)
    return dq[:, :s, :], dk[:, :t, :], dv[:, :t, :], None, None


fused_attention_bse_dropout.defvjp(_fwd_rule, _bwd_rule)
