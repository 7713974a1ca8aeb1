"""Space-to-depth (s2d) reformulations of the low-channel stem convs.

The round-4 per-conv MXU audit (tools/conv_audit.py) measured the R50
eval forward's stem/layer1 region — 208^2/104^2 spatial, 3-64 channels —
at 1.3-13% of bf16 MXU peak (~9 of 37 ms of total conv time): sub-128
channel counts waste the MXU's 128-wide K/N tiles, and XLA's
large-spatial lowerings add layout passes. Every op in the region has an
EXACT wide-channel equivalent in a space-to-depth layout, where each
2x2 pixel cell of a (H, W, C) tensor becomes one pixel of a
(H/2, W/2, 4C) tensor (channel index = (row_phase*2 + col_phase)*C + c).

The region is transpose-free by construction:
  - the stride-2 stem conv1 *produces* the s2d layout directly as a
    k5x5/stride-4 conv (its 5-tap windows embed the two output phases of
    the original k3/s2 conv per axis);
  - interior 3x3/s1 convs stay s2d-resident as dense k3x3 convs over
    cells whose (4C, 4D) kernels embed the original taps per phase pair
    (4x nominal FLOPs, but >=128-wide matmuls: measured 0.79 ms vs
    2.03 ms for the 208^2 32ch conv2 shape pair);
  - the region *exits* through the k2x2/stride-2 pool-fold convs
    (PooledConv1x1, models/layers.py), which in s2d layout are exact
    1x1 convs producing normal-layout output.

All transforms here are pure weight rearrangements computed at trace
time from the unchanged parameter tree — checkpoints, converters and the
f32 parity harness are unaffected (the s2d path is auto-gated on
dtype != float32 like fold/fuse, see models/clip_resnet.py).

Reference site: /root/reference/model/clip.py:147-172 (the stem of
ModifiedResNet; behavioral spec only — this reformulation has no torch
analogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (2*rp + cp)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c // 4)


def _phase_gather(w: jnp.ndarray, offs: np.ndarray, axis: int) -> jnp.ndarray:
    """Gather kernel taps along spatial `axis` by (possibly invalid)
    original-tap offsets `offs` (… -> index offs+1), zeroing out-of-range
    entries. `offs` has any shape; the gathered dims replace `axis`."""
    valid = (np.abs(offs) <= 1).astype(np.float32)
    idx = np.clip(offs + 1, 0, 2)
    g = jnp.take(w, jnp.asarray(idx.reshape(-1)), axis=axis)
    g = g.reshape(w.shape[:axis] + offs.shape + w.shape[axis + 1:])
    mask_shape = (1,) * axis + offs.shape + (1,) * (w.ndim - 1 - axis)
    return g * jnp.asarray(valid).reshape(mask_shape)


def embed_conv3x3_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, D) k3/s1 kernel -> its (3, 3, 4C, 4D) s2d-resident
    equivalent over 2x2 cells.

    Output phase p and cell offset oy read original row 2*oy + r - p for
    input phase r; taps outside [-1, 1] are zero (the dense kernel is
    4/9 sparse — 4x nominal FLOPs, full MXU width).
    """
    c, d = kernel.shape[2], kernel.shape[3]
    oy = np.arange(-1, 2)
    r = np.arange(2)
    p = np.arange(2)
    # dy[a, r, p] = original row offset read by (cell offset a-1, input
    # phase r, output phase p)
    dy = 2 * oy[:, None, None] + r[None, :, None] - p[None, None, :]
    w = _phase_gather(kernel, dy, axis=0)      # (3,2,2, 3, C, D)
    w = _phase_gather(w, dy, axis=3)           # (3,2,2, 3,2,2, C, D)
    # (a, r, p, b, s, q, C, D) -> (a, b, r, s, C, p, q, D)
    w = w.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return w.reshape(3, 3, 4 * c, 4 * d)


def embed_stem_conv1_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, D) k3/STRIDE-2 kernel -> the (5, 5, C, 4D) k5/stride-4
    kernel that directly produces the s2d layout of the original output.

    Output cell i, phase p is the original output row 2i+p, which reads
    input rows 4i + (2p + dy); tap offset e-1 relative to 4i maps to
    dy = e - 1 - 2p. Use with stride (4, 4) and padding [(1, 0), (1, 0)]
    (matching the original SAME/(1,1) padding for H, W % 4 == 0).
    """
    c, d = kernel.shape[2], kernel.shape[3]
    e = np.arange(5)
    p = np.arange(2)
    dy = e[:, None] - 1 - 2 * p[None, :]       # (5, 2)
    w = _phase_gather(kernel, dy, axis=0)      # (5,2, 3, C, D)
    w = _phase_gather(w, dy, axis=2)           # (5,2, 5,2, C, D)
    # (e, p, f, q, C, D) -> (e, f, C, p, q, D)
    w = w.transpose(0, 2, 4, 1, 3, 5)
    return w.reshape(5, 5, c, 4 * d)


def embed_pool2_conv1x1_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, D) kernel of an ``avg_pool(2) -> 1x1 conv`` (equivalently
    the PooledConv1x1 k2x2/s2 expansion) -> the (1, 1, 4C, D) kernel of
    the exact 1x1 conv on the s2d-resident input. Output is in normal
    layout at cell resolution — this is the region's exit op."""
    c, d = kernel.shape[2], kernel.shape[3]
    return jnp.tile(kernel[0, 0] * 0.25, (4, 1)).reshape(1, 1, 4 * c, d)


def embed_conv1x1_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, D) 1x1 kernel -> its (1, 1, 4C, 4D) block-diagonal
    s2d-resident equivalent (each phase maps independently). 4x nominal
    FLOPs as a dense conv, but measured 2.3-3.5x FASTER wall than the
    thin originals at the layer1 shapes (52^2 dense 256->1024: 0.17 ms vs
    104^2 64->256: 0.60; grouped convs are pathological on TPU -- 0.57 --
    so dense block-diag is the right lowering)."""
    c, d = kernel.shape[2], kernel.shape[3]
    w = kernel[0, 0]
    wb = jnp.einsum("gh,cd->gchd", jnp.eye(4, dtype=w.dtype), w)
    return wb.reshape(4 * c, 4 * d).reshape(1, 1, 4 * c, 4 * d)


def embed_pool2_conv1x1_s2d_to_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, D) kernel of an ``avg_pool(2) -> 1x1 conv`` -> the
    (2, 2, 4C, 4D) kernel computing it FROM an s2d-resident input INTO an
    s2d-resident output one cell level down (input s2d of a 2H x 2W grid,
    output s2d of the H x W pooled grid). Output phase (p, q) reads only
    window position (A, B) = (p, q) — that cell holds exactly the 2x2
    pixel block the pool averages. Use with stride (2, 2), VALID."""
    c, d = kernel.shape[2], kernel.shape[3]
    w = jnp.broadcast_to(kernel[0, 0] * 0.25, (4, c, d))
    out = jnp.zeros((2, 2, 4, c, 4, d), kernel.dtype)
    for pq in range(4):
        out = out.at[pq // 2, pq % 2, :, :, pq, :].set(w)
    return out.reshape(2, 2, 4 * c, 4 * d)


def _bias4(bias):
    return None if bias is None else jnp.tile(bias, 4)


def stem_conv1_s2d(x: jnp.ndarray, kernel: jnp.ndarray, bias, dtype
                   ) -> jnp.ndarray:
    """conv1 (k3/s2, SAME) evaluated directly into s2d layout.

    x: (B, H, W, C) with H, W % 4 == 0 -> (B, H/4, W/4, 4D).
    """
    w = embed_stem_conv1_s2d(kernel).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (4, 4), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = _bias4(bias)
    return y if b is None else y + b.astype(dtype)


def conv3x3_s2d(x: jnp.ndarray, kernel: jnp.ndarray, bias, dtype
                ) -> jnp.ndarray:
    """k3/s1 SAME conv applied to an s2d-resident tensor, staying s2d."""
    w = embed_conv3x3_s2d(kernel).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = _bias4(bias)
    return y if b is None else y + b.astype(dtype)


def conv1x1_s2d(x: jnp.ndarray, kernel: jnp.ndarray, bias, dtype
                ) -> jnp.ndarray:
    """1x1 conv applied to an s2d-resident tensor, staying s2d."""
    w = embed_conv1x1_s2d(kernel).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = _bias4(bias)
    return y if b is None else y + b.astype(dtype)


def pool2_conv1x1_s2d_to_s2d(x: jnp.ndarray, kernel: jnp.ndarray, bias,
                             dtype) -> jnp.ndarray:
    """avg_pool(2) -> 1x1 conv from an s2d-resident input to an
    s2d-resident output one cell level down ((B, H, W, 4C) ->
    (B, H/2, W/2, 4D))."""
    w = embed_pool2_conv1x1_s2d_to_s2d(kernel).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = _bias4(bias)
    return y if b is None else y + b.astype(dtype)
