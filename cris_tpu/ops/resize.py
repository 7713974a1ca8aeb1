"""Separable matrix-based image resizing, exactly matching torch semantics.

Instead of gather-based interpolation (slow on TPU), every resize is two
small dense matmuls: ``out = W_h @ img @ W_w^T``. The interpolation weight
matrices are tiny (out_size x in_size), computed once on host per static
shape, and the matmuls ride the MXU and fuse with surrounding ops.

Weight conventions replicate torch ``F.interpolate`` /
``nn.Upsample`` so that the rebuilt model is numerically interchangeable
with the reference (which uses bilinear upsampling inside the FPN neck and
Projector at /root/reference/model/layers.py:54-56,293,304 and bicubic
align_corners=True upsampling in the eval path at
/root/reference/engine/engine.py:102-106):

- ``bilinear``/``bicubic`` with ``align_corners=False`` use half-pixel
  centers: src = (dst + 0.5) * in/out - 0.5  (bilinear additionally clamps
  src at 0, as torch does for non-cubic modes).
- ``align_corners=True`` uses src = dst * (in-1)/(out-1).
- bicubic uses the Keys kernel with A = -0.75 and edge-clamped taps.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _source_coords(in_size: int, out_size: int, align_corners: bool, cubic: bool):
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * scale
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
        if not cubic:
            # torch clamps the source index at 0 for linear modes only.
            src = np.maximum(src, 0.0)
    return src


def _cubic_coeffs(frac: np.ndarray, A: float = -0.75):
    """Keys cubic convolution coefficients for taps at offsets -1, 0, 1, 2.

    cc1(x) = ((A+2)x - (A+3))x^2 + 1        for |x| <= 1
    cc2(x) = ((Ax - 5A)x + 8A)x - 4A        for 1 < |x| < 2
    """

    def cc1(x):
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def cc2(x):
        return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

    return np.stack(
        [cc2(frac + 1.0), cc1(frac), cc1(1.0 - frac), cc2(2.0 - frac)], axis=0
    )


@functools.lru_cache(maxsize=None)
def resize_weight_matrix(
    in_size: int, out_size: int, method: str, align_corners: bool
) -> np.ndarray:
    """(out_size, in_size) float32 interpolation matrix for one axis."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)

    cubic = method == "bicubic"
    src = _source_coords(in_size, out_size, align_corners, cubic)
    W = np.zeros((out_size, in_size), dtype=np.float64)

    if method == "bilinear":
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        for tap, weight in ((lo, 1.0 - frac), (lo + 1, frac)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), weight)
    elif method == "bicubic":
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        coeffs = _cubic_coeffs(frac)
        for k in range(4):
            idx = np.clip(lo - 1 + k, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), coeffs[k])
    elif method == "nearest":
        # torch 'nearest': src = floor(dst * in/out)
        idx = np.minimum(
            (np.arange(out_size, dtype=np.float64) * in_size / out_size).astype(
                np.int64
            ),
            in_size - 1,
        )
        W[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"unknown resize method: {method}")

    return W.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to ``out_hw`` with torch-equivalent math.

    The height and width contractions each lower to a single MXU matmul.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(resize_weight_matrix(h_in, h_out, method, align_corners))
    ww = jnp.asarray(resize_weight_matrix(w_in, w_out, method, align_corners))
    wh = wh.astype(x.dtype)
    ww = ww.astype(x.dtype)
    # fp32 inputs demand real fp32 matmuls (TPU default precision is bf16,
    # which would break eval parity); 'high' = 3-pass bf16 (~2^-21 relative
    # error, far inside the 0.35-threshold tolerance) at half the cost of
    # 'highest'. bf16 inputs take the fast path.
    precision = "high" if x.dtype == jnp.float32 else None
    x = jnp.einsum("oh,...hwc->...owc", wh, x, precision=precision)
    x = jnp.einsum("pw,...owc->...opc", ww, x, precision=precision)
    return x


def upsample2x(x: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """scale_factor=2 upsample (align_corners=False), NHWC.

    Stays on the matmul formulation: measured on v5e, the two resize
    matmuls cost ~0.3 ms at the Projector's (32,26,26,512) shape, while a
    shift-and-interleave elementwise formulation (stack + reshape to
    interleave rows/cols) was 3.4x slower -- the (W,2)->2W interleave
    reshape defeats the fusion emitter's vectorization. Don't retry.
    """
    return resize2d(x, (x.shape[-3] * 2, x.shape[-2] * 2), method, False)


def avg_pool2d(x: jnp.ndarray, window: int, stride: int | None = None) -> jnp.ndarray:
    """Non-padded average pooling over NHWC, matching F.avg_pool2d."""
    import jax

    stride = stride or window
    b, h, w, c = x.shape
    if stride == window and h % window == 0 and w % window == 0:
        # the only case the model uses: non-overlapping windows.
        if x.dtype != jnp.float32:
            # Strided slices + adds instead of a reduce op: XLA upcasts
            # narrow-dtype reductions to f32 as separate convert *passes*
            # (profiled at several ms per forward across the stem /
            # bottleneck pool sites), while this form stays one loop
            # fusion with f32 accumulation in registers.
            acc = None
            for i in range(window):
                for j in range(window):
                    part = x[:, i::window, j::window, :].astype(jnp.float32)
                    acc = part if acc is None else acc + part
            return (acc * (1.0 / (window * window))).astype(x.dtype)
        # f32 keeps the reduce form (no upcast pass exists to avoid).
        x = x.reshape(b, h // window, window, w // window, window, c)
        return x.mean(axis=(2, 4))
    out = jax.lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return out / jnp.asarray(window * window, x.dtype)
