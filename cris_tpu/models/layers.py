"""Shared Flax building blocks with torch-equivalent numerics.

All modules use NHWC layout (TPU-native), fp32 parameters, and an optional
bf16 compute dtype. Normalization statistics are always computed in fp32.

BatchNorm here *is* SyncBatchNorm: the model is written over the global
batch under jit, so batch-statistics reductions are global reductions and
GSPMD inserts the cross-replica collectives automatically -- the TPU-native
replacement for the reference's NCCL SyncBatchNorm conversion
(/root/reference/train.py:97-98).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PooledConv1x1(nn.Module):
    """``avg_pool(k) -> 1x1 conv`` fused into one k x k stride-k conv.

    Exact linear composition: the pooled pointwise conv applies kernel K to
    the mean of each k x k window, which equals a k x k / stride-k conv
    whose taps are all K/k^2. Folding removes the pool's separate HBM pass
    -- and, for sub-f32 dtypes, the f32 upcast passes XLA inserts around
    narrow-dtype reductions (measured ~3 ms/fwd at the CRIS-R50 stem site
    on v5e) -- at the cost of k^2 x the (tiny) pointwise MACs.

    Parameter tree is identical to ``nn.Conv(features, (1, 1))`` (kernel
    (1, 1, cin, features) [+ bias]), so checkpoints and converters are
    unaffected; the expansion happens at apply time.
    """

    features: int
    pool: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    # int8 serving path over the embedded k x k kernel; engages only with
    # a calibrated static scale (no dynamic fallback: the per-dispatch
    # maxabs reduce over the wide pre-pool tensor measured slower than
    # bf16). Gated on pooled_quant_min_ch (256): the 128->512 k2s2 site
    # measured NEGATIVE under int8 (tools/bench_int8_more.py).
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        dtype = self.dtype or x.dtype
        shape = (self.pool, self.pool, cin, self.features)
        strides = (self.pool, self.pool)

        def plain():
            k = jnp.broadcast_to(
                (kernel * (1.0 / self.pool**2)).astype(dtype), shape)
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), k, strides, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(dtype)
            return y

        if self.quant_int8 and min(cin, self.features) >= pooled_quant_min_ch():
            k_emb = jnp.broadcast_to(kernel * (1.0 / self.pool**2), shape)
            return _quant_conv_site(
                self, x, k_emb, strides, "VALID", bias, dtype, plain,
                dynamic_fallback=False)
        return plain()


class S2dPooledConv1x1(nn.Module):
    """PooledConv1x1(features, pool=2) consuming a space-to-depth-resident
    input (ops/s2d.py): the k2x2/stride-2 expansion over pixels is an
    EXACT 1x1 conv over s2d cells, producing normal-layout output at cell
    resolution (the s2d stem region's exit op). Parameter tree is
    identical to PooledConv1x1 / nn.Conv(features, (1, 1)) — the declared
    cin is the ORIGINAL channel count (input.shape[-1] // 4)."""

    features: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    # int8 serving path over the embedded (1, 1, 4C, D) kernel; static
    # scale only, gated on pooled_quant_min_ch like PooledConv1x1 (the
    # effective in-width is 4C)
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import embed_pool2_conv1x1_s2d

        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        dtype = self.dtype or x.dtype
        k_emb = embed_pool2_conv1x1_s2d(kernel)

        def plain():
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), k_emb.astype(dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(dtype)
            return y

        if (self.quant_int8
                and min(4 * cin, self.features) >= pooled_quant_min_ch()):
            return _quant_conv_site(
                self, x, k_emb, (1, 1), "VALID", bias, dtype, plain,
                dynamic_fallback=False)
        return plain()


class S2dConv3x3(nn.Module):
    """k3/s1 SAME conv applied to a space-to-depth-resident tensor
    (ops/s2d.py), staying s2d. Parameter tree identical to the plain conv
    (kernel (3, 3, C, D) [+ bias]) — the declared C is the ORIGINAL
    channel count (input.shape[-1] // 4). Optional int8 serving path over
    the embedded (3, 3, 4C, 4D) kernel (measured faster than bf16 at both
    stem shapes: 0.771 -> 0.666 and 1.297 -> 0.983 ms,
    tools/bench_int8_more.py); static calibrated scale only, gated on the
    standard CRIS_INT8_MIN_CH over the EMBEDDED widths."""

    features: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import conv3x3_s2d, embed_conv3x3_s2d

        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        dtype = self.dtype or x.dtype
        plain = lambda: conv3x3_s2d(x, kernel, bias, dtype)

        min_ch = int(os.environ.get("CRIS_INT8_MIN_CH", "128"))
        if self.quant_int8 and min(4 * cin, 4 * self.features) >= min_ch:
            b4 = None if bias is None else jnp.tile(bias, 4)
            return _quant_conv_site(
                self, x, embed_conv3x3_s2d(kernel), (1, 1),
                [(1, 1), (1, 1)], b4, dtype, plain, dynamic_fallback=False)
        return plain()


def quant_int8_enabled(flag: bool) -> bool:
    """Is the int8 serving path on? Module flag (``precision: int8``) or
    the CRIS_INT8 env override (A/B tooling), read at trace time like the
    other experimental gates."""
    env = os.environ.get("CRIS_INT8")
    if env is not None:
        return env == "1"
    return flag


def pooled_quant_min_ch() -> int:
    """min(cin, cout) threshold for quantizing the POOLED (k2/s2 fold) and
    s2d-exit conv sites. Separate from CRIS_INT8_MIN_CH because the
    measured economics differ: the 104^2 128->512 k2s2 site LOSES under
    int8 (0.469 -> 0.554 ms) while every >=256-min-ch pooled site wins
    (26^2 1024->2048: 0.526 -> 0.329; tools/bench_int8_more.py)."""
    return int(os.environ.get("CRIS_INT8_POOLED_MIN_CH", "256"))


def upfold_quant_min_ch() -> int:
    """min(cin, cout) threshold for quantizing the upsample-fold
    (lhs_dilated) conv sites (UpConvBNReLU / CatUpConvBNReLU up-cores).
    Separate env knob so the family can be excluded wholesale
    (CRIS_INT8_UPFOLD_MIN_CH=99999) in A/B runs.

    NOTE: the family defaults ON and routes through the PHASE
    decomposition (int8_phase_conv_static): the direct lhs_dilated int8
    conv runs at bf16 speed, not 2x (tools/bench_int8_more.py ld2 rows:
    52^2 512->256 k6 ld2 4.31 bf16 vs 4.45 ms int8; quantizing THAT
    form measured 1000.2 -> 966.0 img/s in-model), but the four
    non-dilated phase convs DO hit the 2x rate -- in-model 954.8 ->
    988.6 img/s (tools/ab_int8.py round 5). CRIS_INT8_UPFOLD=0 opts
    the family out."""
    return int(os.environ.get("CRIS_INT8_UPFOLD_MIN_CH", "256"))


def _quant_site(mod: nn.Module, x, dtype, plain_fn, static_fn,
                dynamic_fn=None):
    """Core int8-site wrapper shared by every quantized-site form
    (plain/pooled/s2d convs, upsample-fold phase cores): calibration sow,
    calibrated-static dispatch, optional dynamic fallback, error-audit
    hook. ``plain_fn()`` is the site's exact unquantized computation;
    ``static_fn(act_scale)`` its quantized form given the calibrated
    scale; ``dynamic_fn()`` (optional) a per-dispatch-scale form used
    when no calibrated scale is stored."""
    # calibration pass (checkpoint/calibrate.py drives this with
    # CRIS_INT8_CALIB=1 + mutable=["quant_stats"]): record the activation
    # range statistic and run the PLAIN conv (scales unknown yet).
    # CRIS_INT8_CALIB_PCT=99.9 clips to a percentile of |x| instead of
    # maxabs (outlier-robust PTQ; out-of-range values saturate at +-127).
    if os.environ.get("CRIS_INT8_CALIB") == "1":
        pct = float(os.environ.get("CRIS_INT8_CALIB_PCT", "0") or 0)
        ax = jnp.abs(x.astype(jnp.float32))
        stat = (jnp.quantile(ax.reshape(-1), pct / 100.0)
                if pct else jnp.max(ax))
        mod.sow(
            "quant_stats", "act_maxabs", stat,
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
        return plain_fn()

    if mod.has_variable("quant", "act_scale"):
        # calibrated static scale: the quantize pass has no reduce
        # dependency, so it fuses into the producer's epilogue
        s = mod.get_variable("quant", "act_scale")
        got = static_fn(s).astype(dtype)
    elif dynamic_fn is not None:
        got = dynamic_fn().astype(dtype)
    else:
        return plain_fn()

    # per-site error audit (tools/int8_error_audit.py): also run the
    # plain conv, sow worst-case error stats; "local" feeds downstream
    # the bf16 result (per-site intrinsic error), "compound" the int8
    # one (production propagation)
    audit = os.environ.get("CRIS_INT8_AUDIT", "")
    if audit in ("1", "local", "compound"):
        ref = plain_fn()
        rf = ref.astype(jnp.float32)
        err = got.astype(jnp.float32) - rf
        mod.sow(
            "quant_audit", "err_stats",
            jnp.stack([jnp.max(jnp.abs(err)),
                       jnp.sqrt(jnp.mean(err * err)),
                       jnp.max(jnp.abs(rf)),
                       jnp.sqrt(jnp.mean(rf * rf))]),
            init_fn=lambda: jnp.zeros((4,), jnp.float32),
            reduce_fn=jnp.maximum,
        )
        return got if audit == "compound" else ref
    return got


def _quant_conv_site(mod: nn.Module, x, kernel, strides, padding, bias,
                     dtype, plain_fn, dynamic_fallback: bool = True,
                     lhs_dilation=(1, 1)):
    """int8 site over the HWIO kernel that is ACTUALLY convolved --
    embedded forms (pooled k2/s2 expansions, s2d-resident kernels)
    included. With ``dynamic_fallback=False`` the site runs plain unless
    a calibrated static scale is stored (per-dispatch maxabs reduces
    over wide tensors measured slower than bf16 -- CLAUDE.md round-4
    dyn-at-min_ch-64 negative)."""
    from ..ops.quant import int8_conv2d, int8_conv2d_static

    return _quant_site(
        mod, x, dtype, plain_fn,
        static_fn=lambda s: int8_conv2d_static(
            x, kernel, s, strides, padding, bias,
            lhs_dilation=lhs_dilation),
        dynamic_fn=(
            (lambda: int8_conv2d(x, kernel, strides, padding, bias,
                                 lhs_dilation=lhs_dilation))
            if dynamic_fallback else None),
    )


class QuantConv(nn.Module):
    """Dynamic-int8 conv for the BN-folded serving path (opt-in).

    Parameter tree is identical to ``nn.Conv(features, (k, k))`` (fp32
    HWIO kernel [+ bias]), so bf16 and int8 programs share checkpoints;
    quantization happens at apply time (ops/quant.py: per-output-channel
    weight scales, per-tensor dynamic activation scale, int32 MXU
    accumulation at 2x bf16 peak). Sub-``min_channels`` convs keep the
    plain conv: <128-channel matmuls waste the MXU's 128-lane K/N tiles
    (the ops/pallas/stem.py negative), so quantizing them only adds
    round/clip passes.
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # quantize only convs with min(cin, cout) >= this; None = the
    # CRIS_INT8_MIN_CH env override (A/B + tiny-model tests) or 128
    min_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        min_ch = self.min_channels
        if min_ch is None:
            min_ch = int(os.environ.get("CRIS_INT8_MIN_CH", "128"))
        cin = x.shape[-1]
        ks = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (ks, ks, cin, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        dtype = self.dtype or x.dtype
        pad = [(ks // 2, ks // 2)] * 2
        strides = (self.strides, self.strides)
        def plain():
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(dtype)
            return y

        if min(cin, self.features) >= min_ch:
            return _quant_conv_site(
                self, x, kernel, strides, pad, bias, dtype, plain)
        return plain()


class BatchNorm(nn.Module):
    """BatchNorm2d/1d with exact torch semantics.

    - normalizes with the *biased* batch variance,
    - tracks running variance with the *unbiased* estimator,
    - running = (1 - momentum) * running + momentum * batch, momentum=0.1,
    - statistics and the affine transform are computed in fp32.
    Matches torch.nn.BatchNorm2d defaults as used throughout the reference
    model (e.g. /root/reference/model/clip.py:18-26).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Optional[Dtype] = None
    # phases > 1: the input is space-to-depth-resident (ops/s2d.py) with
    # phases*features channels; statistics/affine act on the ORIGINAL
    # `features` channels (each original pixel appears exactly once, so
    # the math — and the running stats — are identical to the plain
    # layout). Parameter tree is unchanged.
    phases: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        orig_shape = None
        if self.phases > 1:
            orig_shape = x.shape
            x = x.reshape(x.shape[:-1] + (self.phases, self.features))
        initializing = self.is_initializing()
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        reduce_axes = tuple(range(x.ndim - 1))

        if train:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not initializing:
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                correction = n / max(n - 1, 1)
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value
                    + self.momentum * var * correction
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        # per-channel affine prepared in fp32 (cheap: C elements), applied in
        # the compute dtype -- avoids casting the full activation to fp32,
        # which would double HBM traffic around every BN
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale
        shift = bias - mean * inv
        out_dtype = self.dtype or x.dtype
        if out_dtype == jnp.float32:
            y = x.astype(jnp.float32) * inv + shift
        else:
            y = x.astype(out_dtype) * inv.astype(out_dtype) + shift.astype(out_dtype)
        y = y.astype(out_dtype)
        if orig_shape is not None:
            y = y.reshape(orig_shape)
        return y


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 then cast back (fp16/bf16-safe LayerNorm,
    /root/reference/model/clip.py:226-231). eps matches torch (1e-5)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        # NOTE: a Pallas single-pass LN (ops/pallas/layernorm.py) was
        # measured SLOWER in-model (eval 780 -> 715 img/s on v5e): XLA
        # fuses each LN's normalize pass with its neighboring ops, which
        # a standalone kernel forfeits. The kernel stays exported as a
        # tested building block; this XLA form is the production path.
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale + bias
        return y.astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) (/root/reference/model/clip.py:234-236)."""
    return x * nn.sigmoid(1.702 * x)


class ConvBNReLU(nn.Module):
    """conv(bias=False) + BN + ReLU (conv_layer helper,
    /root/reference/model/layers.py:8-11).

    fold_bn: inference-only variant with the BN affine folded into the conv
    weights (use cris_tpu.checkpoint.fold_batchnorm to transform params).

    quant_int8: int8 serving site on the fold_bn path (the FPN/projector
    "head" convs -- the round-5 int8-mode audit found ~5.8 ms of
    near-roofline bf16 head convs left after the backbone families were
    quantized). QuantConv's parameter tree is identical to nn.Conv's, so
    checkpoints and the fold_batchnorm transform are unchanged; the site
    engages only when padding is the SAME padding QuantConv implements.
    """

    features: int
    kernel_size: int = 1
    padding: int = 0
    stride: int = 1
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (self.fold_bn and self.quant_int8 and not train
                and self.padding == self.kernel_size // 2):
            return nn.relu(QuantConv(
                self.features, self.kernel_size, strides=self.stride,
                use_bias=True, dtype=self.dtype, name="conv")(x))
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.fold_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if not self.fold_bn:
            x = BatchNorm(self.features, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


def token_flat(fn, x: jnp.ndarray) -> jnp.ndarray:
    """Apply ``fn`` (a Dense / Dense chain over the last dim) to a
    token tensor (B, S, E) through a FLATTENED (B*S, E) view.

    DEFAULT OFF -- measured in-model NEGATIVE (round 5). Motivation:
    XLA:TPU lowers the 3D-batched projection dot ~2.4x slower than the
    mathematically identical 2D form STANDALONE (train audit:
    (32,676,512)@(512,512) c[2]:[0] runs 80.9 TF/s vs 197.8 flattened,
    tools/bench_int8_dot.py; ~16 ms of the train step nominally). But
    in-model (tools/ab_flat_dots.py) the flatten LOSES: eval 883.4 ->
    847.8 img/s, train 146.8 -> 154.2 ms -- the reshapes break XLA's
    fusion context around the dots (same lesson as the round-3
    bottleneck kernel and round-4 s2d tier 2: standalone per-op wins do
    not survive in-context fusion; only in-model A/Bs are decisive).
    Kept as an A/B hook: CRIS_FLAT_DOTS=1 opts in."""
    env = os.environ.get("CRIS_FLAT_DOTS")
    flat = env == "1"
    if not flat or x.ndim <= 2:
        return fn(x)
    lead = x.shape[:-1]
    y = fn(x.reshape(-1, x.shape[-1]))
    return y.reshape(*lead, y.shape[-1])


def auto_fuse_upsample(fuse_upsample: Optional[bool], dtype) -> bool:
    """Fold bilinear upsamples into the following convs?

    Default: yes for sub-f32 compute dtypes (one lhs_dilated conv replaces
    the resize matmuls + the materialized (2H,2W,C) intermediate), no for
    f32, where keeping the reference op order preserves exact
    torch-trajectory parity in the f32 test harness and the pinned
    goldens. The fused ops themselves are exact either way
    (ops/upsample_conv.py). CRIS_FUSE_UPSAMPLE=0/1 overrides the auto
    decision (A/B measurement hook; an explicit module arg still wins)."""
    if fuse_upsample is not None:
        return fuse_upsample
    env = os.environ.get("CRIS_FUSE_UPSAMPLE")
    if env in ("0", "1"):
        return env == "1"
    return dtype is not None and jnp.dtype(dtype) != jnp.float32


class CatUpConvBNReLU(nn.Module):
    """1x1 ConvBNReLU over `concat([*parts, upsample2x(up)])` with the
    upsample folded into the split concat kernel:
    conv1x1(cat) = conv1x1_a(parts) + upsample2x_conv1x1(up, K_b).
    Parameter tree identical to ConvBNReLU(features, 1, 0) on the concat,
    so checkpoints are interchangeable with the reference-order path.

    quant_int8: int8 serving path over the up-branch core via the PHASE
    decomposition (four non-dilated k2 convs, ops/upsample_conv.py
    phase_kernels4 -- the ld2 form itself runs at bf16 rate under int8,
    round-5 negative; static calibrated scale only; the border ring
    stays exact f32 either way). The cat-branch einsum stays bf16 (int8
    dot_general measured a negative at these shapes, bench_int8_dot)."""

    features: int
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    quant_int8: bool = False

    @nn.compact
    def __call__(self, parts, up, train: bool = False) -> jnp.ndarray:
        from ..ops.upsample_conv import (
            apply_border_ring1x1, fold_kernel4, upsample2x_conv1x1,
        )

        ci = sum(p.shape[-1] for p in parts) + up.shape[-1]
        cu = up.shape[-1]
        kernel, bias = ConvParams((1, 1, ci, self.features),
                                 use_bias=self.fold_bn, name="conv")()
        dt = self.dtype or up.dtype
        ca = ci - cu
        cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
        y = jnp.einsum("bhwc,cd->bhwd", cat.astype(dt),
                       kernel[0, 0, :ca].astype(dt))
        if (self.quant_int8
                and min(cu, self.features) >= upfold_quant_min_ch()):
            from ..ops.quant import int8_phase_conv_static
            from ..ops.upsample_conv import PHASE_PADS4, phase_kernels4

            k_up = kernel[:, :, ca:]
            k4 = fold_kernel4(k_up)
            pk4 = phase_kernels4(k_up)
            up_dt = up.astype(dt)

            def plain_core():
                return jax.lax.conv_general_dilated(
                    up_dt, k4.astype(dt), (1, 1), [(2, 2), (2, 2)],
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            # int8 static via the PHASE decomposition (four non-dilated
            # k2 convs + interleave == the ld2 core, borders included):
            # the ld2 int8 conv itself runs at bf16 rate (round-5 ld2
            # negative), the phase convs hit the int8 2x peak
            core = _quant_site(
                self, up_dt, dt, plain_core,
                static_fn=lambda s: int8_phase_conv_static(
                    up_dt, pk4, PHASE_PADS4, s))
            y = y + apply_border_ring1x1(core, up_dt, k_up)
        else:
            y = y + upsample2x_conv1x1(up.astype(dt), kernel[:, :, ca:])
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if not self.fold_bn:
            y = BatchNorm(self.features, dtype=self.dtype, name="bn")(y, train)
        return nn.relu(y)


class UpConvBNReLU(nn.Module):
    """bilinear-upsample2x + conv3x3(pad 1) + BN + ReLU with the upsample
    folded into one lhs_dilated conv (ops.upsample_conv, exact incl. the
    clamped-edge semantics). Parameter tree identical to
    `upsample2x(x)` -> `ConvBNReLU(features, 3, 1)`, so checkpoints are
    interchangeable between the fused and reference-order paths.

    v5e b32 bf16 (tools/bench_upsample_fold.py): the projector's
    52->104 512->256 site drops 9.55 -> 7.98 ms fwd, 10.34 -> 8.51
    fwd+bwd; the 26->52 512->512 site 3.00 -> 2.47 fwd.

    quant_int8: int8 serving path over the core via the PHASE
    decomposition (four non-dilated SAME k3 convs + interleave ==
    the ld2 core exactly, ops/upsample_conv.py phase_kernels6; the ld2
    form itself runs at bf16 rate under int8 -- round-5 negative;
    static calibrated scale only; the border correction strips stay
    exact f32 either way)."""

    features: int
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..ops.upsample_conv import (
            apply_border_correction3x3, fold_kernel6, upsample2x_conv3x3,
        )

        ci = x.shape[-1]
        conv = ConvParams((3, 3, ci, self.features), use_bias=self.fold_bn,
                         name="conv")
        kernel, bias = conv()
        dt = self.dtype or x.dtype
        if (self.quant_int8
                and min(ci, self.features) >= upfold_quant_min_ch()):
            from ..ops.quant import int8_phase_conv_static
            from ..ops.upsample_conv import PHASE_PADS6, phase_kernels6

            k6 = fold_kernel6(kernel)
            pk6 = phase_kernels6(kernel)
            x_dt = x.astype(dt)

            def plain_core():
                return jax.lax.conv_general_dilated(
                    x_dt, k6.astype(dt), (1, 1), [(3, 3), (3, 3)],
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            # int8 static via the PHASE decomposition (four non-dilated
            # SAME k3 convs + interleave == the ld2 core, borders
            # included): the ld2 int8 conv runs at bf16 rate (round-5
            # negative), the phase convs hit the int8 2x peak
            core = _quant_site(
                self, x_dt, dt, plain_core,
                static_fn=lambda s: int8_phase_conv_static(
                    x_dt, pk6, PHASE_PADS6, s))
            y = apply_border_correction3x3(core, x_dt, kernel.astype(dt))
            if bias is not None:
                y = y + bias.astype(y.dtype)
        else:
            y = upsample2x_conv3x3(x.astype(dt), kernel.astype(dt), bias)
        if not self.fold_bn:
            y = BatchNorm(self.features, dtype=self.dtype, name="bn")(y, train)
        return nn.relu(y)


class ConvParams(nn.Module):
    """Declares nn.Conv-compatible parameters (kernel [+ bias]) without an
    apply path -- shared by the fused-op modules here and the Pallas
    stem/bottleneck feeds in clip_resnet (single definition so the fused
    and reference-order paths can't diverge)."""

    shape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32
            )
        return kernel, bias


class LinearBNReLU(nn.Module):
    """linear(bias=False) + BN1d + ReLU (linear_layer helper,
    /root/reference/model/layers.py:14-16)."""

    features: int
    dtype: Optional[Dtype] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            use_bias=self.fold_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="linear",
        )(x)
        if not self.fold_bn:
            x = BatchNorm(self.features, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class CoordConv(nn.Module):
    """Concatenates normalized x/y coordinate planes before a ConvBNReLU
    (/root/reference/model/layers.py:19-44)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = x.shape
        ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
        yy = jnp.broadcast_to(ys[:, None], (h, w))
        xx = jnp.broadcast_to(xs[None, :], (h, w))
        coords = jnp.stack([xx, yy], axis=-1).astype(x.dtype)
        coords = jnp.broadcast_to(coords[None], (b, h, w, 2))
        x = jnp.concatenate([x, coords], axis=-1)
        return ConvBNReLU(
            self.features,
            self.kernel_size,
            self.padding,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            quant_int8=self.quant_int8,
            name="conv1",
        )(x, train)
