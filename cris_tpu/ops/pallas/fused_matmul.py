"""Fused channel-matmul kernel: y = [relu](x @ w + bias [+ residual]).

The bottleneck's 1x1 convolutions are channel matmuls. XLA:TPU runs them
as conv fusions whose outputs cannot absorb the following bias/residual/
ReLU elementwise work, costing one extra memory pass over the activation
per conv (measured 5-8 ms of the 46 ms b32 eval forward). This kernel
computes the matmul on the MXU and applies bias + residual + ReLU in the
same VMEM-resident pass.

Used on the inference path (fold_bn=True models); training keeps XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_residual(x_ref, w_ref, b_ref, r_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    acc = acc + r_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_plain(x_ref, w_ref, b_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("relu", "block_m", "block_n", "interpret")
)
def fused_matmul(
    x: jnp.ndarray,                       # (M, K)
    w: jnp.ndarray,                       # (K, N)
    bias: jnp.ndarray,                    # (N,)
    residual: Optional[jnp.ndarray] = None,  # (M, N)
    relu: bool = False,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = x.shape
    n = w.shape[1]
    m_pad = _round_up(m, block_m)
    n_pad = _round_up(max(n, 128), min(block_n, _round_up(n, 128)))
    bn = min(block_n, n_pad)
    k_pad = _round_up(k, 128)

    xp = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
    wp = jnp.pad(w, ((0, k_pad - k), (0, n_pad - n)))
    bp = jnp.pad(bias, (0, n_pad - n)).reshape(1, n_pad)

    grid = (m_pad // block_m, n_pad // bn)
    x_spec = pl.BlockSpec((block_m, k_pad), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k_pad, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((block_m, bn), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)

    if residual is not None:
        rp = jnp.pad(residual, ((0, m_pad - m), (0, n_pad - n)))
        out = pl.pallas_call(
            functools.partial(_kernel_residual, relu=relu),
            grid=grid,
            in_specs=[x_spec, w_spec, b_spec, o_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
            interpret=interpret,
        )(xp, wp, bp, rp)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_plain, relu=relu),
            grid=grid,
            in_specs=[x_spec, w_spec, b_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
            interpret=interpret,
        )(xp, wp, bp)
    return out[:m, :n]


def conv1x1_fused(
    x: jnp.ndarray,                        # (B, H, W, Cin)
    kernel: jnp.ndarray,                   # (1, 1, Cin, Cout)
    bias: jnp.ndarray,                     # (Cout,)
    residual: Optional[jnp.ndarray] = None,  # (B, H, W, Cout)
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """1x1 conv + bias [+ residual] [+ relu] in one fused pass (NHWC)."""
    b, h, w_, cin = x.shape
    cout = kernel.shape[-1]
    x2 = x.reshape(b * h * w_, cin)
    r2 = residual.reshape(b * h * w_, cout) if residual is not None else None
    dtype = x.dtype
    y = fused_matmul(
        x2,
        kernel[0, 0].astype(dtype),
        bias.astype(jnp.float32),
        r2,
        relu=relu,
        interpret=interpret,
    )
    return y.reshape(b, h, w_, cout)
