"""Fused eval-mode ResNet bottleneck: conv1x1 -> relu -> conv3x3 -> relu
-> conv1x1 -> +residual -> relu in ONE Pallas program per (batch image,
row split).

Targets the stride-1 "tail" bottlenecks of CLIP's ModifiedResNet
(/root/reference/model/clip.py:10-57) in the BN-folded inference path,
where each block is exactly

    y = relu(x + b3 + conv3_1x1(relu(b2 + conv2_3x3(relu(b1 + conv1_1x1(x))))))

XLA runs this as three conv fusions with the intermediate activations,
the relu+cast epilogues, and the residual-add each making a round trip to
HBM (the round-2 device profile charges ~8.2 ms of relu+cast plus ~5.2 ms
of residual-add passes to the b32 eval forward). Here every intermediate
lives in VMEM: HBM traffic collapses to one read of x, one write of y,
and one read of the weights (weight blocks are grid-invariant, so Mosaic
keeps them resident across programs).

Formulation notes (v5e, Mosaic):
- activations are kept flat (H*W, C): C is the 128-multiple lane dim for
  every supported stage (mid >= 128 -- layer1's mid=64 stays on XLA,
  where the round-2 stem experiment showed sub-128-lane matmuls waste
  the MXU).
- the 3x3 conv runs as 9 shifted (M, mid) @ (mid, mid) matmuls over a
  zero-margined flat buffer ("flat-buffer windows": strided slices lower
  to unsupported gathers on Mosaic, contiguous dynamic slices at
  arbitrary sublane offsets are fine). Row-wrap pollution at the left /
  right image edge is cancelled by masking the shifted operand with a
  (j + dx) in-range mask; top/bottom edges fall out of the zeroed
  margins.
- conv2's tap loop and conv3's output-chunk loop are lax.fori_loop's, NOT
  unrolled Python loops: the Mosaic allocator does not reuse buffers
  across unrolled iterations (round-2 attention-kernel lesson), while a
  fori_loop body gets one allocation.
- images too large for whole-image VMEM residency (layer2's 52x52x512)
  are split into `row_splits` horizontal bands; the band's conv1 output
  halo row is recomputed per band (1 extra row of 1x1 conv, ~2% FLOPs)
  instead of DMA-ing overlapping blocks.

Eval-only: no custom VJP (fold_bn implies inference); the train path
keeps the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            mp_ref, m2_ref, *, M: int, W: int, chunk: int):
    """One (batch, row-band) program. Shapes:
    x_ref  (1, HW, C)   whole image, grid-invariant over bands
    w1_ref (C, mid)  w2_ref (9, mid, mid)  w3_ref (mid, C)
    b*_ref (1, mid/mid/C) f32
    o_ref  (1, M, C)    this band
    mp_ref (M + 2W + 2, mid) scratch: conv1 output with halo rows + zero
           margin (flat index p+dy*W+dx lands at mp[W+1 + p+dy*W+dx])
    m2_ref (M, mid) scratch: conv2 output
    """
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    row0 = r * M
    dt = o_ref.dtype
    mid = m2_ref.shape[-1]

    def conv1(xs):
        acc = jnp.dot(xs, w1_ref[:], preferred_element_type=jnp.float32)
        return jnp.maximum(acc + b1_ref[:], 0.0).astype(dt)

    # conv1 over this band + one halo row each side; margins stay zero
    # (image top/bottom zero padding)
    mp_ref[:] = jnp.zeros(mp_ref.shape, dt)
    mp_ref[pl.ds(W + 1, M), :] = conv1(x_ref[0, pl.ds(row0, M), :])

    @pl.when(r > 0)
    def _():
        start = jnp.maximum(row0 - W, 0)  # clamp keeps the slice legal
        mp_ref[pl.ds(1, W), :] = conv1(x_ref[0, pl.ds(start, W), :])

    @pl.when(r < nr - 1)
    def _():
        start = jnp.minimum(row0 + M, x_ref.shape[1] - W)
        mp_ref[pl.ds(W + 1 + M, W), :] = conv1(x_ref[0, pl.ds(start, W), :])

    # conv2: 9 shifted matmuls accumulated in f32. j = column-of-pixel,
    # constant across bands because M is a multiple of W.
    j = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % W

    def tap(t, acc):
        dy = t // 3 - 1
        dx = t % 3 - 1
        src = mp_ref[pl.ds(W + 1 + dy * W + dx, M), :]
        valid = (j + dx >= 0) & (j + dx < W)  # cancel row-wrap pollution
        src = src * valid.astype(dt)
        return acc + jnp.dot(src, w2_ref[t], preferred_element_type=jnp.float32)

    acc0 = jnp.broadcast_to(b2_ref[:], (M, mid)).astype(jnp.float32)
    acc = jax.lax.fori_loop(0, 9, tap, acc0)
    m2_ref[:] = jnp.maximum(acc, 0.0).astype(dt)

    # conv3 + residual + relu, in output-column chunks (bounds the f32
    # accumulator's VMEM footprint)
    def out_chunk(ci, _):
        c0 = ci * chunk
        acc = jnp.dot(m2_ref[:], w3_ref[:, pl.ds(c0, chunk)],
                      preferred_element_type=jnp.float32)
        res = x_ref[0, pl.ds(row0, M), pl.ds(c0, chunk)]
        y = acc + b3_ref[0, pl.ds(c0, chunk)] + res.astype(jnp.float32)
        o_ref[0, :, pl.ds(c0, chunk)] = jnp.maximum(y, 0.0).astype(dt)
        return 0

    jax.lax.fori_loop(0, o_ref.shape[-1] // chunk, out_chunk, 0)


def _pick_row_splits(h: int, w: int, c: int, dtype) -> int:
    """Smallest band count keeping the band in/out + scratch comfortably
    inside VMEM (~12 MB with the double-buffered whole-image input)."""
    bytes_per = 2 if jnp.dtype(dtype).itemsize == 2 else 4
    img = h * w * c * bytes_per
    for r in (1, 2, 4, 8):
        if h % r:
            continue
        # whole-image x (x2 buffers) + band out (x2) + ~4 MB scratch slack
        if img * 2 + (img // r) * 2 + 4_500_000 < 12_500_000:
            return r
    raise ValueError(f"no row split fits VMEM for {h}x{w}x{c}")


def supports_shape(h: int, w: int, c_in: int, mid: int, c_out: int) -> bool:
    """Stage shapes this kernel handles well: 128-multiple lane dims (the
    MXU constraint that sank the sub-128-channel stem kernel) and
    identity-residual geometry."""
    if c_in != c_out or c_in % 128 or mid % 128:
        return False
    try:
        _pick_row_splits(h, w, c_in, jnp.bfloat16)
    except ValueError:
        return False
    return True


@functools.partial(
    jax.jit, static_argnames=("row_splits", "interpret"))
def fused_bottleneck(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    row_splits: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stride-1 BN-folded bottleneck.

    x: (B, H, W, C) NHWC. w1 (C, mid), w2 (9, mid, mid) from a (3, 3,
    mid, mid) HWIO kernel, w3 (mid, C); b* f32. Returns (B, H, W, C).
    Matches relu(x + conv3(relu(conv2(relu(conv1(x)))))) with zero ('SAME')
    padding on the 3x3, to f32-accumulation tolerance.
    """
    b, h, w, c = x.shape
    mid = w1.shape[-1]
    if row_splits is None:
        row_splits = _pick_row_splits(h, w, c, x.dtype)
    if h % row_splits:
        raise ValueError(f"row_splits={row_splits} must divide H={h} "
                         "(bands must align to whole image rows)")
    hw = h * w
    m = hw // row_splits
    # f32 conv3 accumulator cap ~2 MB
    chunk = min(c, max(128, (2_000_000 // (4 * m)) // 128 * 128))
    while c % chunk:
        chunk //= 2
    xf = x.reshape(b, hw, c)

    out = pl.pallas_call(
        functools.partial(_kernel, M=m, W=w, chunk=chunk),
        grid=(b, row_splits),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, mid), lambda bi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda bi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, mid, mid), lambda bi, ri: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda bi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, c), lambda bi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, c), lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m + 2 * w + 2, mid), x.dtype),
            pltpu.VMEM((m, mid), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * (c * mid + 9 * mid * mid + mid * c),
            bytes_accessed=(2 * b * hw * c + c * mid + 9 * mid * mid
                            + mid * c) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), w3,
      b3.reshape(1, -1))
    return out.reshape(b, h, w, c)
