"""Fused bilinear-upsample2x + conv3x3: one lhs_dilated conv, exactly.

Replaces the projector's `conv3x3(upsample2x(x))` pattern
(/root/reference/model/layers.py:53-58) with a single
`conv_general_dilated(x, K6, lhs_dilation=2)` and a thin border
correction, instead of materializing the (2H, 2W, C) upsampled
intermediate and the two resize matmuls. Measured on v5e (b32 bf16,
tools/bench_upsample_fold.py): 52x52x512->256 site 9.55 -> 7.98 ms fwd,
10.34 -> 8.51 fwd+bwd; 26x26x512->512 site 3.00 -> 2.47 fwd. Valid in
train too: BN consumes the conv output, which is unchanged, and the bwd
of a dilated conv is a strided conv XLA handles natively.

Identity. With b = [1, 3, 3, 1]/4 (the x2 bilinear tap filter,
align_corners=False) and K the (3, 3, Ci, Co) kernel:

    conv3x3_same(up2x_zero(x), K)
        == conv_general_dilated(x, K6, lhs_dilation=2, padding=(3, 3)),
    K6[a + ky, c + kx, :, :] += b[a] b[c] K[ky, kx]     (a, c in 0..3)

where up2x_zero is the transposed-conv upsample that zero-pads beyond the
image. The production upsample (ops.resize.upsample2x == pytorch
bilinear) instead CLAMPS source coordinates at the edge, which changes
only the first/last row and column of the upsampled image:

    U_clamp - U_zero = Delta,   Delta supported on the outer frame:
      rows {0, 2H-1}:  0.25 * clamped-W-upsample of x[0 / H-1, :]
      cols {0, 2W-1}:  0.25 * zero-H-upsample    of x[:, 0 / W-1]

(the asymmetry -- clamped W on rows, zero H on cols -- is exact:
Delta = E_h X Rc_w^T + Rz_h X E_w^T with Rc = Rz + E). conv3x3 of the
frame touches only the outer two output rows/cols, so the correction is
eight thin 1D convs scattered into the result. Exact to f32 rounding,
verified against the unfused chain in tests/test_ops.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .resize import resize_weight_matrix

_DN = ("NHWC", "HWIO", "NHWC")


def fold_kernel6(k3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (6, 6, Ci, Co) folded with the bilinear taps."""
    b = (1.0 / 4.0, 3.0 / 4.0, 3.0 / 4.0, 1.0 / 4.0)
    k3f = k3.astype(jnp.float32)
    k6 = jnp.zeros((6, 6) + k3.shape[2:], jnp.float32)
    for a in range(4):
        for c in range(4):
            k6 = k6.at[a:a + 3, c:c + 3].add(b[a] * b[c] * k3f)
    return k6.astype(k3.dtype)


# bilinear phase-tap matrices rho[di][tap a][x-offset u] for the 2x
# upsample: up_zero[2i+di] window row (2i+di-1+a) expressed over x rows
# (i-1, i, i+1). The phase decomposition below turns the lhs_dilated
# fold cores into ordinary non-dilated convs -- same useful MACs, but
# int8-2x-eligible (XLA's TPU int8 conv runs lhs_dilated at bf16 rate;
# tools/bench_int8_more.py ld2 rows, round 5).
_PHASE_RHO = (
    ((0.75, 0.25, 0.0), (0.25, 0.75, 0.0), (0.0, 0.75, 0.25)),  # di = 0
    ((0.25, 0.75, 0.0), (0.0, 0.75, 0.25), (0.0, 0.25, 0.75)),  # di = 1
)
# per-phase padding for the k3 phase convs (both phases span x rows
# i-1..i+1 -> SAME) and the k2 phase convs (di=0 spans i-1..i, di=1
# spans i..i+1)
PHASE_PADS6 = ((1, 1), (1, 1))
PHASE_PADS4 = ((1, 0), (0, 1))


def phase_kernels6(k3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (2, 2, 3, 3, Ci, Co) bilinear phase kernels.

    interleave2x2(conv_same(x, pk[di, dj]) for di, dj) equals the
    lhs_dilated fold_kernel6 core EXACTLY, borders included: the dilated
    core's implicit zero extension of the upsample is linear in the
    in-range x values, and the phase convs' zero padding reproduces it
    (validated to f32 rounding on CPU, tests/test_ops.py)."""
    rho = jnp.asarray(_PHASE_RHO, jnp.float32)  # (2, 3, 3): [d, a, u]
    pk = jnp.einsum("dau,ebv,abio->deuvio", rho, rho, k3.astype(jnp.float32))
    return pk.astype(k3.dtype)


def phase_kernels4(k1: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, Ci, Co) -> (2, 2, 2, 2, Ci, Co) bilinear phase kernels of
    the fold_kernel4 (1x1 upsample-fold) core; pads PHASE_PADS4."""
    t = jnp.asarray(((0.25, 0.75), (0.75, 0.25)), jnp.float32)  # [d, u]
    pk = jnp.einsum("du,ev,io->deuvio", t, t, k1.astype(jnp.float32)[0, 0])
    return pk.astype(k1.dtype)


def interleave2x2(y00: jnp.ndarray, y01: jnp.ndarray,
                  y10: jnp.ndarray, y11: jnp.ndarray) -> jnp.ndarray:
    """Four (B, H, W, C) output phases -> (B, 2H, 2W, C):
    out[2i+di, 2j+dj] = y_{di,dj}[i, j]."""
    b, h, w, c = y00.shape
    z = jnp.stack(
        [jnp.stack([y00, y01], axis=3), jnp.stack([y10, y11], axis=3)],
        axis=2)  # (B, H, 2, W, 2, C)
    return z.reshape(b, 2 * h, 2 * w, c)


def _up1d_zero(v: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, 2N, C) transposed-conv x2 upsample (zero beyond
    the ends): even 2i = .75 v[i] + .25 v[i-1], odd 2i+1 = .75 v[i] +
    .25 v[i+1]. Tiny inputs only (border strips)."""
    prev = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    nxt = jnp.pad(v, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    even = 0.75 * v + 0.25 * prev
    odd = 0.75 * v + 0.25 * nxt
    b, n, c = v.shape
    return jnp.stack([even, odd], axis=2).reshape(b, 2 * n, c)


def _up1d_clamped(v: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, 2N, C) pytorch-bilinear x2 (edge clamped)."""
    n = v.shape[1]
    m = jnp.asarray(resize_weight_matrix(n, 2 * n, "bilinear", False),
                    v.dtype)
    return jnp.einsum("on,bnc->boc", m, v)


def _strip_conv(strip: jnp.ndarray, krow: jnp.ndarray) -> jnp.ndarray:
    """1D 3-tap conv of a (B, L, Ci) strip with (3, Ci, Co), zero-padded."""
    p = jnp.pad(strip, ((0, 0), (1, 1), (0, 0)))
    l = strip.shape[1]
    stack = jnp.stack([p[:, i:i + l] for i in range(3)], axis=2)
    return jnp.einsum("bltc,tcd->bld", stack, krow)


def _strip_conv_valid(strip: jnp.ndarray, krow: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode 3-tap conv: (B, L+2, Ci) x (3, Ci, Co) -> (B, L, Co)."""
    l = strip.shape[1] - 2
    stack = jnp.stack([strip[:, i:i + l] for i in range(3)], axis=2)
    return jnp.einsum("bltc,tcd->bld", stack, krow)


def fold_kernel4(k1: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, Ci, Co) -> (4, 4, Ci, Co) folded with the bilinear taps."""
    b = jnp.asarray([1.0, 3.0, 3.0, 1.0], jnp.float32) / 4.0
    k1f = k1.astype(jnp.float32)[0, 0]  # (Ci, Co)
    k4 = jnp.einsum("a,c,io->acio", b, b, k1f)
    return k4.astype(k1.dtype)


def upsample2x_conv1x1(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
) -> jnp.ndarray:
    """== conv1x1(upsample2x(x), kernel), NHWC, exactly (no bias).

    Used to fold the FPN's `concat([a, upsample2x(b)])` -> 1x1 conv
    pattern (/root/reference/model/layers.py:120-141) by splitting the
    concat kernel: conv1x1(cat) = conv1x1_a(a) + upsample2x_conv1x1(b).
    A 1x1 conv does no spatial mixing, so the clamped-edge discrepancy of
    the dilated core lives on the 1-wide output ring, which is simply
    overwritten with directly computed values."""
    if kernel.shape[:2] != (1, 1):
        raise ValueError(f"1x1 kernel required, got {kernel.shape}")
    kd = kernel.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, fold_kernel4(kd), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=_DN)
    return apply_border_ring1x1(y, x, kernel)


def apply_border_ring1x1(y: jnp.ndarray, x: jnp.ndarray,
                         kernel: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the 1-wide output ring of the ld2 fold_kernel4 core
    ``y`` with directly computed clamped-edge values (the only rows/cols
    where the zero-extended dilated core differs from the production
    clamped upsample). Split out so the int8 serving path can swap the
    core conv (models/layers.py) while reusing the exactness-critical
    correction."""
    _, h, w, _ = x.shape
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)[0, 0]  # (Ci, Co)
    dt = y.dtype
    row_t = jnp.einsum("bwc,cd->bwd", _up1d_clamped(xf[:, 0]), kf)
    row_b = jnp.einsum("bwc,cd->bwd", _up1d_clamped(xf[:, h - 1]), kf)
    col_l = jnp.einsum("bhc,cd->bhd", _up1d_clamped(xf[:, :, 0]), kf)
    col_r = jnp.einsum("bhc,cd->bhd", _up1d_clamped(xf[:, :, w - 1]), kf)
    y = y.at[:, 0].set(row_t.astype(dt))
    y = y.at[:, 2 * h - 1].set(row_b.astype(dt))
    y = y.at[:, 1:2 * h - 1, 0].set(col_l[:, 1:2 * h - 1].astype(dt))
    y = y.at[:, 1:2 * h - 1, 2 * w - 1].set(
        col_r[:, 1:2 * h - 1].astype(dt))
    return y


def upsample2x_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """== conv3x3_same(upsample2x(x), kernel) [+ bias], NHWC, exactly."""
    if kernel.shape[:2] != (3, 3):
        raise ValueError(f"3x3 kernel required, got {kernel.shape}")
    kd = kernel.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, fold_kernel6(kd), (1, 1), [(3, 3), (3, 3)],
        lhs_dilation=(2, 2), dimension_numbers=_DN)
    y = apply_border_correction3x3(y, x, kernel)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def apply_border_correction3x3(y: jnp.ndarray, x: jnp.ndarray,
                               kernel: jnp.ndarray) -> jnp.ndarray:
    """Add the clamped-edge border correction to the ld2 fold_kernel6
    core ``y`` (see module docstring for the algebra). Split out so the
    int8 serving path can swap the core conv (models/layers.py) while
    reusing the exactness-critical correction."""
    _, h, w, _ = x.shape

    # border correction (strips in f32: thin, exactness-critical)
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    top = 0.25 * _up1d_clamped(xf[:, 0])        # (B, 2W, Ci) at U-row 0
    bot = 0.25 * _up1d_clamped(xf[:, h - 1])    # at U-row 2H-1
    left = 0.25 * _up1d_zero(xf[:, :, 0])       # (B, 2H, Ci) at U-col 0
    right = 0.25 * _up1d_zero(xf[:, :, w - 1])  # at U-col 2W-1

    # the dilated core's implicit transposed upsample V extends one element
    # past the grid (V[-1] = 0.25 x[0], V[2N] = 0.25 x[N-1] per axis) that
    # the chain's conv3x3 zero-pad discards: subtract that ring. Corner
    # elements V[-1,-1] etc. belong to the row strips (the col strips are
    # restricted to i in [0, 2H) to avoid double-counting).
    def ring_row(row):  # x-row (B, W, Ci) -> V-ext row (B, 2W+2, Ci)
        up = _up1d_zero(row)
        return 0.25 * jnp.concatenate(
            [0.25 * row[:, :1], up, 0.25 * row[:, -1:]], axis=1)

    ring_top = ring_row(xf[:, 0])
    ring_bot = ring_row(xf[:, h - 1])
    ring_left = 0.25 * _up1d_zero(xf[:, :, 0])
    ring_right = 0.25 * _up1d_zero(xf[:, :, w - 1])

    # four batched two-row/two-col updates; y stays in its compute dtype
    # (a full-tensor f32 round-trip here costs more than the fold saves)
    dt = y.dtype
    corr_top = jnp.stack(
        [_strip_conv(top, kf[1]) - _strip_conv_valid(ring_top, kf[0]),
         _strip_conv(top, kf[0])], axis=1)
    corr_bot = jnp.stack(
        [_strip_conv(bot, kf[2]),
         _strip_conv(bot, kf[1]) - _strip_conv_valid(ring_bot, kf[2])],
        axis=1)
    corr_left = jnp.stack(
        [_strip_conv(left, kf[:, 1]) - _strip_conv(ring_left, kf[:, 0]),
         _strip_conv(left, kf[:, 0])], axis=2)
    corr_right = jnp.stack(
        [_strip_conv(right, kf[:, 2]),
         _strip_conv(right, kf[:, 1]) - _strip_conv(ring_right, kf[:, 2])],
        axis=2)
    y = y.at[:, 0:2].add(corr_top.astype(dt))
    y = y.at[:, 2 * h - 2:2 * h].add(corr_bot.astype(dt))
    y = y.at[:, :, 0:2].add(corr_left.astype(dt))
    y = y.at[:, :, 2 * w - 2:2 * w].add(corr_right.astype(dt))
    return y
