"""Fused attention Pallas kernel for CRIS's attention shapes.

The model's attention sites are short-sequence (169 attnpool tokens, 676
decoder visual tokens, 17/22 word tokens), so the entire K/V for one
(batch, head) fits comfortably in VMEM. Instead of streaming
flash-attention statistics, this kernel computes QK^T -> masked softmax ->
PV in ONE fused program per (batch, head, q-block): the (Sq, Sk) logits
never touch HBM. The XLA path (cris_tpu.ops.attention) materializes
(B, H, Sq, Sk) fp32 weight tensors -- for the decoder's 676x676 self-
attention that is ~117 MB of HBM traffic per layer per direction, which
this kernel eliminates.

Numerics: logits and softmax in fp32, PV matmul with fp32 accumulation --
identical math to the XLA path (same max-subtraction softmax), so the two
paths agree to float tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (T, D)
    v = v_ref[0, 0]  # (T, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * scale
    mask = mask_ref[0]  # (1, T) int32, 1 = valid key
    logits = jnp.where(mask > 0, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax attention over (B, H, S, D) tensors.

    kv_valid: optional (B, T) bool/int, nonzero = valid key. Padding that
    this function adds internally is masked automatically.

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes attention weights with plain XLA einsums (standard softmax
    attention gradients). kv_valid is treated as non-differentiable.
    """
    return _fused_attention_fwd_impl(q, k, v, kv_valid, block_q, interpret)


def _fused_attention_fwd_impl(q, k, v, kv_valid, block_q, interpret):
    b, h, s, d = q.shape
    t = k.shape[2]
    scale = d**-0.5

    if block_q is None:
        # one program per (batch, head) when the whole Sq fits (measured
        # fastest for the 676-token decoder: K/V loaded once per head)
        block_q = min(_round_up(s, 128), 768)
    s_pad = _round_up(s, block_q)
    t_pad = _round_up(max(t, 128), 128)

    if kv_valid is None:
        valid = jnp.ones((b, t), jnp.int32)
    else:
        valid = kv_valid.astype(jnp.int32)
    # (B, 1, T): the singleton middle dim keeps the block tiling legal
    valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))[:, None, :]

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    grid = (b, h, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, valid)
    return out[:, :, :s, :]


def _attn_bse_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                     num_heads: int):
    """All heads of one (batch, q-block) in a single program.

    Inputs stay in the projections' natural (S, E) layout; per-head D-dim
    slices are taken on VMEM-resident values (lane selects, no HBM
    transpose). K/V are read once per batch for ALL heads -- the BHSD
    kernel re-reads them per head."""
    q = q_ref[0]  # (bq, E)
    k = k_ref[0]  # (T, E)
    v = v_ref[0]  # (T, E)
    mask = mask_ref[0]  # (1, T)
    d = q.shape[-1] // num_heads
    outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = jnp.where(mask > 0, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6))
def fused_attention_bse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    kv_valid: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-head attention over (B, S, E) tensors -- no head
    split/merge transposes.

    The (B, S, E) -> (B, H, S, D) transposes around the BHSD kernel are
    real HBM passes (~1 ms each at the decoder's 32x676x512 on v5e); this
    variant blocks the grid over (batch, q-block) only and slices heads
    on-chip. Returns (B, S, E).

    Degenerate-case semantics: if a row's kv_valid is ALL False, the
    max-subtracted softmax over uniform NEG_INF logits is uniform, so the
    kernel returns mean(V) for that row where the XLA fallback's softmax
    would produce NaN. All-masked rows are undefined behavior for this op
    (the model never produces them: CRIS pad masks always keep SOT/EOT
    valid); callers must not rely on either value."""
    return _fused_attention_bse_impl(q, k, v, num_heads, kv_valid, block_q,
                                     interpret)


def _fused_attention_bse_impl(q, k, v, num_heads, kv_valid, block_q,
                              interpret):
    b, s, e = q.shape
    t = k.shape[1]
    d = e // num_heads
    scale = d**-0.5

    t_pad = _round_up(max(t, 128), 128)
    if block_q is None:
        # Mosaic's scoped VMEM allocator does NOT reuse the per-head fp32
        # logits buffers across the unrolled head loop (measured: 8 heads x
        # (768, 768) f32 = 18.9M > the 16M scoped limit). Budget ~6MB for
        # the logits stack and derive the q block from it.
        budget = 6 * 1024 * 1024
        bq = budget // (num_heads * t_pad * 4)
        block_q = max(128, min(768, (bq // 128) * 128, _round_up(s, 128)))
    s_pad = _round_up(s, block_q)

    if kv_valid is None:
        valid = jnp.ones((b, t), jnp.int32)
    else:
        valid = kv_valid.astype(jnp.int32)
    valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))[:, None, :]

    qp = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))

    grid = (b, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_bse_kernel, scale=scale, num_heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, e), lambda bi, qi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_pad, e), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_pad, e), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t_pad), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, e), lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, e), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, valid)
    return out[:, :s, :]


def _fused_attention_bse_fwd(q, k, v, num_heads, kv_valid, block_q,
                             interpret):
    out = _fused_attention_bse_impl(q, k, v, num_heads, kv_valid, block_q,
                                    interpret)
    return out, (q, k, v, kv_valid)


def _fused_attention_bse_bwd(num_heads, block_q, interpret, residuals, g):
    """Same softmax-attention gradients as the BHSD kernel, with the head
    axis kept in place (bqhd einsums; XLA plans its own layouts here --
    this path only runs where the model trains through a fused site,
    i.e. the attnpool)."""
    q, k, v, kv_valid = residuals
    b, s, e = q.shape
    t = k.shape[1]
    d = e // num_heads
    scale = d**-0.5

    q4 = q.reshape(b, s, num_heads, d)
    k4 = k.reshape(b, t, num_heads, d)
    v4 = v.reshape(b, t, num_heads, d)
    g4 = g.reshape(b, s, num_heads, d).astype(jnp.float32)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q4, k4, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale
    if kv_valid is not None:
        logits = jnp.where((kv_valid > 0)[:, None, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)

    dv = jnp.einsum(
        "bhqk,bqhd->bkhd", p, g4, preferred_element_type=jnp.float32
    ).astype(v.dtype).reshape(b, t, e)
    dp = jnp.einsum(
        "bqhd,bkhd->bhqk", g4, v4.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (
        jnp.einsum("bhqk,bkhd->bqhd", ds, k4.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    ).astype(q.dtype).reshape(b, s, e)
    dk = (
        jnp.einsum("bhqk,bqhd->bkhd", ds, q4.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    ).astype(k.dtype).reshape(b, t, e)
    return dq, dk, dv, None


fused_attention_bse.defvjp(_fused_attention_bse_fwd, _fused_attention_bse_bwd)


def _fused_attention_fwd(q, k, v, kv_valid, block_q, interpret):
    out = _fused_attention_fwd_impl(q, k, v, kv_valid, block_q, interpret)
    return out, (q, k, v, kv_valid)


def _fused_attention_bwd(block_q, interpret, residuals, g):
    """Standard softmax-attention gradients, recomputing P in fp32 XLA.

    P = softmax(s*QK^T + mask); O = P V
    dV = P^T g ; dP = g V^T ; dS = P * (dP - rowsum(dP * P))
    dQ = s * dS K ; dK = s * dS^T Q
    """
    q, k, v, kv_valid = residuals
    d = q.shape[-1]
    scale = d**-0.5

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale
    if kv_valid is not None:
        logits = jnp.where(
            (kv_valid > 0)[:, None, None, :], logits, NEG_INF
        )
    p = jax.nn.softmax(logits, axis=-1)

    g32 = g.astype(jnp.float32)
    dv = jnp.einsum(
        "bhqk,bhqd->bhkd", p, g32, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", g32, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (
        jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    ).astype(q.dtype)
    dk = (
        jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    ).astype(k.dtype)
    return dq, dk, dv, None


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
