"""int8 quantized convolution for TPU inference.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 peak (394 vs 197
TOPS), and the BN-folded eval forward is conv-MXU-bound after the round-3
epilogue-fusion negative (ops/pallas/bottleneck.py, CLAUDE.md). This
module implements the standard post-training dynamic quantization
recipe, TPU-first:

- weights: symmetric per-output-channel int8 (scale = maxabs / 127),
  quantized from the checkpoint values inside the jitted program (the
  kernels are tiny next to the activations, so requantizing per call is
  noise, and the parameter tree stays byte-identical to the bf16 model);
- activations: symmetric per-tensor DYNAMIC int8 -- one maxabs reduce
  over the conv input + a round/clip/cast pass, both of which XLA fuses
  into the neighboring epilogues;
- accumulation in int32 (`preferred_element_type`), dequantized by
  s_x * s_w[c] in the conv epilogue.

This trades exactness for speed: quantization error is ~1% relative per
conv (see tests/test_ops.py bounds), so it is an OPT-IN serving mode
(`precision: int8` / CRIS_INT8=1), never the parity default. Reference
equivalent: none (the reference has no quantized path); this is a
beyond-reference capability.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def quantize_channelwise(
    k: jnp.ndarray, eps: float = 1e-12
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns (int8 kernel, f32 per-channel scale of shape (Cout,)) with
    k ~= kq * scale.
    """
    kf = k.astype(jnp.float32)
    axes = tuple(range(kf.ndim - 1))
    scale = jnp.max(jnp.abs(kf), axis=axes) / 127.0 + eps
    kq = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def quantize_dynamic(
    x: jnp.ndarray, eps: float = 1e-12
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor dynamic int8 quantization of an activation.

    Returns (int8 x, scalar f32 scale) with x ~= xq * scale.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf)) / 127.0 + eps
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_conv2d_static(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    act_scale: jnp.ndarray,
    strides: Sequence[int] = (1, 1),
    padding="SAME",
    bias: Optional[jnp.ndarray] = None,
    lhs_dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """int8 conv with a CALIBRATED (static) activation scale.

    Unlike the dynamic variant there is no maxabs reduce over the input,
    so the quantize (scale/round/clip/cast) is a pure elementwise pass
    XLA can fuse into the producing op's epilogue. Activations beyond the
    calibrated range saturate at +-127 (standard PTQ semantics).

    ``lhs_dilation`` supports the upsample-fold sites (ops/upsample_conv):
    symmetric quantization maps the dilation's inserted zeros to int8
    zero exactly, so the folded form stays exact w.r.t. the quantized
    operands.
    """
    kq, k_scale = quantize_channelwise(kernel)
    s = jnp.asarray(act_scale, jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, kq, tuple(strides), padding,
        lhs_dilation=tuple(lhs_dilation),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s * k_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def int8_phase_conv_static(
    x: jnp.ndarray,
    pk: jnp.ndarray,
    pads: Sequence[Sequence[int]],
    act_scale: jnp.ndarray,
) -> jnp.ndarray:
    """int8 phase-decomposed upsample-fold core with a calibrated scale.

    ``pk``: (2, 2, kh, kw, Ci, Co) per-output-phase kernels
    (ops/upsample_conv.py phase_kernels6/4); ``pads``: per-phase-index
    padding pair (PHASE_PADS6/4), applied as [pads[di], pads[dj]].

    Quantizes x ONCE (static scale -> the pass fuses into the producer's
    epilogue), runs four ordinary non-dilated int8 convs -- which DO hit
    the int8 MXU 2x rate, unlike the lhs_dilated form (bench_int8_more
    ld2 rows) -- and interleaves the phases. Returns f32 (B, 2H, 2W, Co)
    == the ld2 core on the quantized operands, borders included."""
    from .upsample_conv import interleave2x2

    s = jnp.asarray(act_scale, jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                  -127, 127).astype(jnp.int8)
    ys = []
    for di in (0, 1):
        for dj in (0, 1):
            kq, k_scale = quantize_channelwise(pk[di, dj])
            acc = jax.lax.conv_general_dilated(
                xq, kq, (1, 1), [tuple(pads[di]), tuple(pads[dj])],
                dimension_numbers=_DN,
                preferred_element_type=jnp.int32,
            )
            ys.append(acc.astype(jnp.float32) * (s * k_scale))
    return interleave2x2(*ys)


def int8_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int] = (1, 1),
    padding="SAME",
    bias: Optional[jnp.ndarray] = None,
    lhs_dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """== conv2d(x, kernel) [+ bias] through the int8 MXU path.

    x: (B, H, W, Ci) float; kernel: (kh, kw, Ci, Co) float (quantized
    per-output-channel on the fly); returns f32 (caller applies the
    activation and casts -- both fuse into the dequant epilogue).
    """
    kq, k_scale = quantize_channelwise(kernel)
    xq, x_scale = quantize_dynamic(x)
    acc = jax.lax.conv_general_dilated(
        xq, kq, tuple(strides), padding,
        lhs_dilation=tuple(lhs_dilation),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * k_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y
