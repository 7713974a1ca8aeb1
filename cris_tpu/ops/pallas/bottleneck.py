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
- the 3x3 conv runs as 9 statically-shifted (M, mid) @ (mid, mid)
  matmuls over a zero-margined flat VALUE buffer ("flat-buffer windows",
  the stem-kernel pattern): Mosaic requires dynamic sublane ref offsets
  to be provably 8-aligned, so shifted windows are taken as static
  slices of an in-register value instead of dynamic ref reads. Row-wrap
  pollution at the left/right image edge is cancelled by masking the
  shifted operand with a (j + dx) in-range mask; top/bottom edges fall
  out of the zeroed margins.
- multi-band programs (row_splits > 1) recompute the conv1 halo rows
  from an 8-aligned H8-row window of x (1 extra row of 1x1 conv, ~2%
  FLOPs) instead of DMA-ing overlapping blocks; the window start is
  `aligned_expr * predicate`, which Mosaic's divisibility analysis can
  prove 8-aligned (a plain clamp/select cannot be).
- row_splits == 1 programs (layer3/4: 26x26, 13x13) specialize at trace
  time to whole-array ref reads -- no dynamic sublane offsets exist, so
  the flat length need not be 8-aligned (169, 676).

Eval-only: no custom VJP (fold_bn implies inference); the train path
keeps the XLA formulation (train-mode BN needs cross-batch statistics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            *, M: int, W: int, chunk: int, nr: int):
    """One (batch, row-band) program. Shapes:
    x_ref  (1, HW, C)   whole image, grid-invariant over bands
    w1_ref (C, mid)  w2_ref (9, mid, mid)  w3_ref (mid, C)
    b*_ref (1, mid/mid/C) f32
    o_ref  (1, M, C)    this band (M = HW when nr == 1)
    """
    r = pl.program_id(1)
    dt = o_ref.dtype
    mid = w1_ref.shape[-1]

    def conv1(xs):
        acc = jnp.dot(xs, w1_ref[:], preferred_element_type=jnp.float32)
        return jnp.maximum(acc + b1_ref[:], 0.0).astype(dt)

    if nr == 1:
        y1 = conv1(x_ref[0])
        top = jnp.zeros((W, mid), dt)
        bot = jnp.zeros((W, mid), dt)
    else:
        # M % 8 == 0 (enforced by _pick_row_splits), so r*M and the halo
        # starts below are provably 8-aligned sublane offsets.
        # M % 8 == 0 and h8 % 8 == 0, so every offset below is 8-aligned;
        # Mosaic's divisibility analysis can't see that through the
        # predicate multiply, so assert it with pl.multiple_of.
        row0 = r * M
        h8 = (W + 7) // 8 * 8
        al = lambda i: pl.multiple_of(i, 8)
        y1 = conv1(x_ref[0, pl.ds(al(row0), M), :])
        up = (r > 0).astype(jnp.int32)
        th = conv1(x_ref[0, pl.ds(al((row0 - h8) * up), h8), :])
        top = jnp.where(r > 0, th[h8 - W:], 0)
        dn = (r < pl.num_programs(1) - 1).astype(jnp.int32)
        bh = conv1(x_ref[0, pl.ds(al((row0 + M) * dn), h8), :])
        bot = jnp.where(r < pl.num_programs(1) - 1, bh[:W], 0)

    # zero-margined flat window buffer: flat tap offset p + dy*W + dx
    # lands at mp[W + 1 + p + dy*W + dx]
    zpad = jnp.zeros((1, mid), dt)
    mp = jnp.concatenate([zpad, top, y1, bot, zpad], axis=0)

    # conv2: 9 statically shifted matmuls accumulated in f32.
    j = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % W
    acc = jnp.broadcast_to(b2_ref[:], (M, mid)).astype(jnp.float32)
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        src = mp[W + 1 + dy * W + dx:W + 1 + dy * W + dx + M]
        valid = (j + dx >= 0) & (j + dx < W)  # cancel row-wrap pollution
        src = src * valid.astype(dt)
        acc = acc + jnp.dot(src, w2_ref[t],
                            preferred_element_type=jnp.float32)
    m2 = jnp.maximum(acc, 0.0).astype(dt)

    # conv3 + residual + relu, in output-column chunks (bounds the f32
    # accumulator's VMEM footprint; lane offsets are 128-multiples)
    def out_chunk(c0):
        acc3 = jnp.dot(m2, w3_ref[:, pl.ds(c0, chunk)],
                       preferred_element_type=jnp.float32)
        if nr == 1:
            res = x_ref[0, :, pl.ds(c0, chunk)]
        else:
            res = x_ref[0, pl.ds(pl.multiple_of(r * M, 8), M),
                        pl.ds(c0, chunk)]
        y = acc3 + b3_ref[0, pl.ds(c0, chunk)] + res.astype(jnp.float32)
        o_ref[0, :, pl.ds(c0, chunk)] = jnp.maximum(y, 0.0).astype(dt)

    c = o_ref.shape[-1]
    if chunk == c:
        out_chunk(0)
    else:
        jax.lax.fori_loop(0, c // chunk,
                          lambda ci, _: (out_chunk(ci * chunk), 0)[1], 0)


def _conv3_chunk(c: int, m: int) -> int:
    """Largest 128-multiple divisor of c whose (m, chunk) f32 accumulator
    stays ~<=2 MB (c is a 128-multiple by supports_shape)."""
    chunk = min(c, max(128, (2_000_000 // (4 * m)) // 128 * 128))
    while c % chunk:
        chunk -= 128
    return chunk


def _pick_row_splits(h: int, w: int, c: int, mid: int, dtype) -> int:
    """Smallest band count whose working set fits scoped VMEM (~14 MB of
    the ~16 MB/core), with the TPU constraint that a true band's flat
    length hw/r is a multiple of 8 sublanes."""
    bytes_per = jnp.dtype(dtype).itemsize
    hw = h * w
    img = hw * c * bytes_per
    wts = (c * mid + 9 * mid * mid + mid * c) * bytes_per
    for r in (1, 2, 4, 8):
        # r == 1: the band IS the full (hw, c) array dim, which TPU block
        # lowering always allows; true bands must be 8-sublane-aligned.
        if h % r or (r > 1 and (hw // r) % 8):
            continue
        m = hw // r
        # window value buffer + conv2 f32 accumulator + conv3 f32 chunk
        vals = (m + 2 * w + 2) * mid * bytes_per
        f32acc = m * mid * 4 + m * _conv3_chunk(c, m) * 4
        # x and out get x2 pipeline buffers; the weight blocks are
        # grid-invariant (constant index_map) so Mosaic keeps ONE
        # resident copy.
        if img * 2 + (img // r) * 2 + wts + vals + f32acc < 14_000_000:
            return r
    raise ValueError(f"no row split fits VMEM for {h}x{w}x{c}")


def supports_shape(h: int, w: int, c_in: int, mid: int, c_out: int,
                   dtype=jnp.bfloat16) -> bool:
    """Stage shapes this kernel handles well: 128-multiple lane dims (the
    MXU constraint that sank the sub-128-channel stem kernel) and
    identity-residual geometry, at the given activation dtype's VMEM
    footprint."""
    if c_in != c_out or c_in % 128 or mid % 128:
        return False
    try:
        _pick_row_splits(h, w, c_in, mid, dtype)
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
        row_splits = _pick_row_splits(h, w, c, mid, x.dtype)
    if h % row_splits or (row_splits > 1 and (h * w // row_splits) % 8):
        raise ValueError(f"row_splits={row_splits} must divide H={h} with "
                         "an 8-aligned flat band length")
    hw = h * w
    m = hw // row_splits
    chunk = _conv3_chunk(c, m)
    xf = x.reshape(b, hw, c)

    out = pl.pallas_call(
        functools.partial(_kernel, M=m, W=w, chunk=chunk, nr=row_splits),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=15_000_000,
        ),
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
