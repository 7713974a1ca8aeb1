"""Single-pass LayerNorm (fwd + bwd) Pallas kernels.

XLA lowers LayerNorm as separate reduce and normalize passes (plus
bf16->f32 convert passes), so every LN costs >= 2 reads + 1 write of the
activation; profiled across the decoder's 11 LN sites (including the
FFN-internal LN at width 2048, reference model/layers.py:209-212) that is
~2.5 ms of the eval forward and ~8 ms of the train step on v5e at b32.
These kernels read the activation once per direction: statistics and the
affine are computed on the VMEM-resident tile.

The backward returns per-row-block partial sums for d(scale)/d(bias)
(cross-program accumulation isn't expressible in one pallas_call); the
wrapper sums the (n_blocks, C) partials in XLA -- tiny.

Numerics match LayerNormF32's reference math: f32 statistics with the
biased variance and eps inside the rsqrt.

MEASURED NEGATIVE in-model on v5e (eval 780 -> 715 img/s): XLA fuses each
LN's normalize pass into neighboring fusions, which a standalone kernel
forfeits -- the model keeps the XLA LN; this op remains as an exported,
tested building block for contexts without adjacent fusion opportunities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, g_ref, dx_ref, ds_ref, db_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    gs = g * s_ref[0]
    dx = rstd * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # partial sums live in row 0 of an (8, C) block (sublane-legal); the
    # wrapper sums over all partial rows
    c = x.shape[-1]
    ds_ref[0] = jnp.pad(jnp.sum(g * xhat, axis=0)[None], ((0, 7), (0, 0)))
    db_ref[0] = jnp.pad(jnp.sum(g, axis=0)[None], ((0, 7), (0, 0)))


def _pad_rows(x2, n_pad):
    n = x2.shape[0]
    return jnp.pad(x2, ((0, n_pad - n), (0, 0))) if n_pad != n else x2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, scale, bias, eps: float = 1e-5, interpret: bool = False):
    """LayerNorm over the last axis of ``x`` with f32 statistics.

    x: (..., C) with C a multiple of 128 (caller-gated); scale/bias: (C,).
    """
    return _fwd_impl(x, scale, bias, eps, interpret)


def _fwd_impl(x, scale, bias, eps, interpret):
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    n_pad = _round_up(n, _BLOCK_ROWS)
    xp = _pad_rows(x2, n_pad)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n_pad // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        interpret=interpret,
    )(xp, scale.astype(jnp.float32).reshape(1, c),
      bias.astype(jnp.float32).reshape(1, c))
    return out[:n].reshape(shape)


def _fwd_rule(x, scale, bias, eps, interpret):
    return _fwd_impl(x, scale, bias, eps, interpret), (x, scale)


def _bwd_rule(eps, interpret, residuals, g):
    x, scale = residuals
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    g2 = g.reshape(-1, c)
    n = x2.shape[0]
    n_pad = _round_up(n, _BLOCK_ROWS)
    nb = n_pad // _BLOCK_ROWS
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c), x.dtype),
            jax.ShapeDtypeStruct((nb, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, c), jnp.float32),
        ],
        interpret=interpret,
    )(_pad_rows(x2, n_pad), scale.astype(jnp.float32).reshape(1, c),
      _pad_rows(g2, n_pad))
    return (dx[:n].reshape(shape), ds.sum(axis=(0, 1)), db.sum(axis=(0, 1)))


layer_norm.defvjp(_fwd_rule, _bwd_rule)


def supports(c: int) -> bool:
    return c % 128 == 0
