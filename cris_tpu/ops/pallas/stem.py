"""Fused ResNet-stem Pallas kernel (eval / fold_bn path).

The reference stem is three 3x3 convs with ReLUs (conv1 stride 2) plus a
2x2 avg pool (/root/reference/model/clip.py:160-223). XLA:TPU executes
EVERY conv at the 208^2 x {32, 64} activation in ~3.7 ms regardless of
channel count (measured on v5e: 32->32, 32->64, 32->128, 64->64 all
~3.7 ms -- sub-128 channel counts waste lanes, and each conv round-trips
a 100-350 MB activation through HBM; the full XLA stem chain measures
~7.9 ms at batch 32). This kernel runs the whole chain in VMEM, reading
the space-to-depth'd image once per row-block and writing only the
(half-pooled) output.

Key formulation -- flat tap windows: each stage's activation lives as a
flattened (rows * W, C) buffer whose rows follow the frame convention
"data cols [0, 208), cols 208/209 zeroed". A conv tap (di, dj) is then a
CONTIGUOUS window of the flat buffer starting at (di+1)*W + dj (column
shifts become element offsets), so the conv is a handful of accumulated
(N, Cin) @ (Cin, Cout) MXU matmuls with no shifted-copy concatenation --
Mosaic's tpu.concatenate rejects operands with mismatched sublane
offsets, and bf16 tpu.roll is unimplemented, which rules out the
channel-catenation form. Row-edge wrap reads touch only the zeroed pad
columns; the single negative-offset tap gets an explicit zero-prepend
(`_win`). conv1 (3x3 / stride 2) is embedded as a 2x2 conv over the s2d
input (`_embed_conv1`), making every stage stride-1.

The train path (BN between convs) stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # conv3 rows per program; must divide H/2 and be even.
# ROWS=16 compiles standalone but OOMs scoped VMEM (17.5M/16M) once the
# surrounding program (e.g. a scan) adds buffer pressure; 8 leaves slack.
W = 210    # padded frame width: 208 data cols + 2 zero cols


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _embed_conv1(k1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C) stride-2 kernel -> (2, 2, 12, C) over the s2d input.

    Output row i of the stride-2 conv taps image rows 2i-1..2i+1, i.e.
    s2d blocks {i-1 (phase 1), i (phases 0 and 1)} -- a 2-block window
    per axis with phase-selected channels. Tap index (di+1, dj+1) for
    block offsets di, dj in {-1, 0}."""
    co = k1.shape[-1]
    out = jnp.zeros((2, 2, 12, co), jnp.float32)
    for di in range(3):
        for dj in range(3):
            oi, oj = di - 1, dj - 1
            si, p = oi // 2, oi % 2
            sj, q = oj // 2, oj % 2
            out = out.at[
                si + 1, sj + 1,
                (p * 2 + q) * 3:(p * 2 + q + 1) * 3].add(
                k1[di, dj].astype(jnp.float32))
    return out


def _win(flat: jnp.ndarray, off: int, n: int) -> jnp.ndarray:
    """Contiguous window [off, off+n) of a flat (N, C) buffer, zero-
    extended at both ends (the (-1,-1) tap starts one element before the
    buffer, the (+1,+1) tap ends one element after)."""
    total = flat.shape[0]
    parts = []
    if off < 0:
        parts.append(jnp.zeros((-off, flat.shape[1]), flat.dtype))
    parts.append(flat[max(off, 0):min(off + n, total)])
    if off + n > total:
        parts.append(jnp.zeros((off + n - total, flat.shape[1]), flat.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _conv_stage(flat, kernels, bias, offsets, n_out, valid_first, ho, wo,
                out_dtype):
    """One conv over a flat frame buffer.

    flat: (n_in * W, Cin); kernels: (ntaps, Cin, Cout) f32->compute dtype;
    offsets: per-tap flat offsets; n_out: output rows; valid_first: global
    row index of output row 0 (rows outside [0, ho) and cols >= 208 are
    zeroed). Returns the next flat frame buffer ((n_out * W, Cout),
    out_dtype) after bias + relu + masking."""
    acc = None
    for t, off in enumerate(offsets):
        part = jax.lax.dot_general(
            _win(flat, off, n_out * W), kernels[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    co = kernels.shape[-1]
    y = jnp.maximum(acc + bias[0], 0.0).reshape(n_out, W, co)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_out, W, 1), 0) + valid_first
    col = jax.lax.broadcasted_iota(jnp.int32, (n_out, W, 1), 1)
    # mask to the true data extent: cols beyond wo would otherwise carry
    # relu(bias) garbage into the next stage's right edge
    keep = (row >= 0) & (row < ho) & (col < wo)
    y = jnp.where(keep, y, 0.0)
    return y.astype(out_dtype).reshape(n_out * W, co)


def _stem_kernel(xa_ref, xb_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                 k3_ref, b3_ref, o_ref, *, ho: int, wo: int):
    pid = pl.program_id(1)
    r0 = pid * ROWS  # first conv3 output row of this program
    dt = o_ref.dtype

    # s2d rows [r0-3, r0+ROWS+2) of the host frame (see fused_stem_pool)
    xa = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)[:ROWS + 5]
    flat = xa.reshape((ROWS + 5) * W, xa.shape[-1])

    # conv1' (2x2 embedded stride-2): rows [r0-2, r0+ROWS+2)
    offs1 = [(di + 1) * W + dj for di in (-1, 0) for dj in (-1, 0)]
    buf1 = _conv_stage(flat, k1_ref[:], b1_ref[:], offs1, ROWS + 4,
                       r0 - 2, ho, wo, dt)

    offs3x3 = [(di + 1) * W + dj for di in (-1, 0, 1) for dj in (-1, 0, 1)]
    # conv2: rows [r0-1, r0+ROWS+1)
    buf2 = _conv_stage(buf1, k2_ref[:], b2_ref[:], offs3x3, ROWS + 2,
                       r0 - 1, ho, wo, dt)
    # conv3: rows [r0, r0+ROWS)
    y3 = _conv_stage(buf2, k3_ref[:], b3_ref[:], offs3x3, ROWS,
                     r0, ho, wo, dt)

    # 2x2 avg pool, row half (major-dim reshape is layout-free); the
    # column half runs as one fused XLA slice-add on the kernel output
    # (strided slices lower to unsupported gathers in Mosaic).
    co = y3.shape[-1]
    y3 = y3.reshape(ROWS // 2, 2, W, co).astype(jnp.float32)
    o_ref[0] = ((y3[:, 0] + y3[:, 1]) * 0.25).astype(dt)


def fused_stem_pool(
    img: jnp.ndarray,
    k1: jnp.ndarray, b1: jnp.ndarray,
    k2: jnp.ndarray, b2: jnp.ndarray,
    k3: jnp.ndarray, b3: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """avgpool2(relu(conv3(relu(conv2(relu(conv1(img))))))).

    img: (B, H, W, 3); k1 (3,3,3,C1) stride-2, k2 (3,3,C1,C2),
    k3 (3,3,C2,C3); biases per conv (fold_bn form). Returns
    (B, H/4, W/4, C3) in k1.dtype. H/2 must be divisible by ROWS; the
    frame width W(=210) must cover W/2 + 2."""
    b, h, w, _ = img.shape
    dtype = k1.dtype
    ho, wo = h // 2, w // 2
    assert ho % ROWS == 0 and ROWS % 2 == 0 and wo + 2 <= W
    nprog = ho // ROWS
    c1, c2, c3 = k1.shape[-1], k2.shape[-1], k3.shape[-1]

    # host-side (XLA) prep: cast + s2d + frame assembly. Rows: [3 zeros |
    # ho data | zeros to a block multiple] (the kernel's window for
    # program pi starts at s2d row 16*pi - 3); cols: [wo data | 2 zeros].
    xs = space_to_depth2(img.astype(dtype))  # (B, ho, wo, 12)
    arr_h = -(-(ho + 3 + 2) // ROWS) * ROWS + ROWS
    xs = jnp.pad(xs, ((0, 0), (3, arr_h - ho - 3), (0, W - wo), (0, 0)))

    # per-tap kernels, (di, dj)-major to match the kernel's offset order
    k1f = _embed_conv1(k1).reshape(4, 12, c1).astype(dtype)
    k2f = k2.astype(dtype).reshape(9, c1, c2)
    k3f = k3.astype(dtype).reshape(9, c2, c3)

    out = pl.pallas_call(
        functools.partial(_stem_kernel, ho=ho, wo=wo),
        grid=(b, nprog),
        in_specs=[
            pl.BlockSpec((1, ROWS, W, 12), lambda bi, pi: (bi, pi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, W, 12),
                         lambda bi, pi: (bi, pi + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS // 2, W, c3),
                               lambda bi, pi: (bi, pi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho // 2, W, c3), dtype),
        interpret=interpret,
    )(xs, xs,
      k1f, b1.astype(jnp.float32).reshape(1, c1),
      k2f, b2.astype(jnp.float32).reshape(1, c2),
      k3f, b3.astype(jnp.float32).reshape(1, c3))
    # column half of the pool (rows were paired + scaled in-kernel)
    return out[:, :, 0:wo:2, :] + out[:, :, 1:wo:2, :]
