"""CLIP's ModifiedResNet image encoder, rebuilt NHWC for TPU.

Behavioral spec from /root/reference/model/clip.py:10-223:
- 3-conv stem (stride 2 on the first conv) followed by 2x2 average pool;
- anti-aliased downsampling: bottlenecks keep stride-1 convs and average
  pool before the 1x1 expansion conv (and in the shortcut);
- the dense-prediction modification: forward returns the layer2/layer3
  feature pyramid plus an attention-pooled layer4 *feature map* (the CLS
  readout is removed and the positional embedding is bicubic-resized to the
  actual 13x13 grid, clip.py:80-144), with a 1x1-conv+BN residual branch.
"""

from __future__ import annotations

import os

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.resize import avg_pool2d, resize2d
from .layers import (
    BatchNorm, ConvParams, PooledConv1x1, QuantConv, S2dConv3x3,
    S2dPooledConv1x1, quant_int8_enabled, token_flat,
)

Dtype = Any


def _auto_fuse_pool(fuse_pool: Optional[bool], dtype) -> bool:
    """Fuse anti-aliasing avg pools into the adjacent 1x1 convs?

    Default: yes for sub-f32 compute dtypes (the fold removes whole HBM
    passes -- see PooledConv1x1), no for f32, where there is no upcast
    pass to save and keeping the reference op order preserves exact
    torch-trajectory parity in the f32 test harness.
    """
    if fuse_pool is not None:
        return fuse_pool
    return dtype is not None and jnp.dtype(dtype) != jnp.float32


def _auto_s2d(s2d_stem: Optional[bool], dtype) -> bool:
    """Run the stem in space-to-depth layout (ops/s2d.py)?

    Default: yes for sub-f32 compute dtypes — the round-4 conv audit
    measured the plain stem's 208^2 low-channel convs at 1.3-13% of MXU
    peak, and the s2d-resident forms are exact weight rearrangements at
    >=128-wide matmuls. f32 keeps the reference op order for the parity
    harness. CRIS_S2D_STEM=0/1 overrides (A/B hook); the module arg wins.
    """
    if s2d_stem is not None:
        return s2d_stem
    env = os.environ.get("CRIS_S2D_STEM")
    if env in ("0", "1"):
        return env == "1"
    return dtype is not None and jnp.dtype(dtype) != jnp.float32


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    in_pool: int = 1  # fused stride-`in_pool` avg pool on the block input
    fuse_pool: Optional[bool] = None  # None = auto by dtype
    quant_int8: bool = False  # opt-in int8 serving path (fold_bn eval only)
    # the block input is space-to-depth-resident (ops/s2d.py; requires
    # fused pools). With s2d_out=False and in_pool == 2 (tier 1),
    # conv1/downsample consume it as exact 1x1 convs and everything
    # downstream is normal-layout; with in_pool == 1 and stride > 1 the
    # block is the s2d region's EXIT (conv1 consumes s2d, d2s before the
    # 3x3, downsample consumes s2d directly as a 1x1).
    in_s2d: bool = False
    # produce s2d-resident output: with in_pool == 2 this is the region
    # ENTRY (pooled convs emit s2d one cell level down); with in_pool ==
    # 1 a fully s2d-RESIDENT stride-1 identity block (layer1 tails).
    # Only stride == 1 blocks are supported.
    s2d_out: bool = False

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        fuse = _auto_fuse_pool(self.fuse_pool, self.dtype)
        in_pool = self.in_pool if fuse else 1

        # Experimental opt-in (CRIS_PALLAS_BOTTLENECK=1): BN-folded
        # stride-1 identity blocks (every stage "tail" at >=128 mid
        # channels) run as ONE Pallas program, all intermediates in VMEM.
        # Measured SLOWER than XLA on v5e both standalone (1.49 vs 0.81
        # ms/block at 52x52x512) and in-model (b32 eval 776 vs 787
        # img/s): XLA already fuses the relu/residual epilogues into its
        # conv fusions -- the round-2 profile's "13 ms of epilogue
        # passes" was fusion-attribution artifact (see CLAUDE.md round-3
        # findings). Kept as a complete, parity-tested kernel. Train
        # keeps the XLA path regardless: train-mode BN needs cross-batch
        # statistics that don't fit the per-image program model.
        if (self.fold_bn and not train and self.stride == 1 and in_pool == 1
                and inplanes == out_planes and not self.in_s2d):
            from ..ops.pallas import pallas_enabled, pallas_interpret
            from ..ops.pallas.bottleneck import fused_bottleneck, supports_shape

            _, fh, fw, _ = x.shape
            dt = self.dtype or jnp.float32
            if (pallas_enabled()
                    and os.environ.get("CRIS_PALLAS_BOTTLENECK", "0") == "1"
                    and supports_shape(
                        fh, fw, inplanes, self.planes, out_planes, dt)):
                w1, b1 = ConvParams((1, 1, inplanes, self.planes),
                                     name="conv1")()
                w2, b2 = ConvParams((3, 3, self.planes, self.planes),
                                     name="conv2")()
                w3, b3 = ConvParams((1, 1, self.planes, out_planes),
                                     name="conv3")()
                return fused_bottleneck(
                    x.astype(dt),
                    w1.reshape(inplanes, self.planes).astype(dt), b1,
                    w2.reshape(9, self.planes, self.planes).astype(dt), b2,
                    w3.reshape(self.planes, out_planes).astype(dt), b3,
                    interpret=pallas_interpret(),
                )

        use_quant = (self.fold_bn and not train
                     and quant_int8_enabled(self.quant_int8))

        def conv(features, ksize, name, pool=1, s2d_in=False):
            if pool > 1:
                if s2d_in:
                    # the pooled conv consumes an s2d-resident input as
                    # an exact 1x1 (the s2d region's tier-1 exit).
                    # S2dPooledConv1x1 hardwires pool-2 semantics (one s2d
                    # cell IS the 2x2 pool window) -- a pool != 2 caller
                    # would get silently wrong numerics (ADVICE r4).
                    assert pool == 2, (
                        f"s2d-resident input requires pool == 2, got {pool}")
                    return S2dPooledConv1x1(
                        features, use_bias=self.fold_bn, dtype=self.dtype,
                        quant_int8=use_quant, name=name,
                    )
                return PooledConv1x1(
                    features, pool, use_bias=self.fold_bn, dtype=self.dtype,
                    quant_int8=use_quant, name=name,
                )
            if use_quant:
                return QuantConv(
                    features, ksize, use_bias=self.fold_bn, dtype=self.dtype,
                    name=name,
                )
            return nn.Conv(
                features,
                (ksize, ksize),
                padding=[(ksize // 2, ksize // 2)] * 2,
                use_bias=self.fold_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        def bn(features, name):
            if self.fold_bn:
                return lambda x, train: x
            return BatchNorm(features, dtype=self.dtype, name=name)

        if self.in_s2d and (self.s2d_out or in_pool == 1):
            # s2d-resident bodies (ops/s2d.py): ENTRY (in_pool=2 +
            # s2d_out: pooled convs emit s2d one cell level down),
            # RESIDENT (s2d_out, stride-1 identity block entirely in s2d
            # layout -- the layer1 tail scan), EXIT (stride-2 first
            # block: conv1 consumes s2d then d2s, downsample consumes
            # s2d directly as an exact 1x1). The round-4 microbench:
            # dense block-diagonal 1x1s run 2.3-3.5x faster than the
            # thin 104^2 64-ch originals; grouped convs are pathological
            # on TPU (tools/bench_s2d.py).
            from ..ops.s2d import (
                conv1x1_s2d, conv3x3_s2d, depth_to_space,
                pool2_conv1x1_s2d_to_s2d,
            )

            dt = self.dtype or x.dtype
            cin = x.shape[-1] // 4

            def cparams(shape, name):
                return ConvParams(shape, use_bias=self.fold_bn,
                                  name=name)()

            def bn4(features, name):
                if self.fold_bn:
                    return lambda v, train: v
                return BatchNorm(features, dtype=self.dtype, phases=4,
                                 name=name)

            if self.s2d_out:
                k1, b1 = cparams((1, 1, cin, self.planes), "conv1")
                h = (pool2_conv1x1_s2d_to_s2d(x, k1, b1, dt)
                     if in_pool == 2 else conv1x1_s2d(x, k1, b1, dt))
                out = nn.relu(bn4(self.planes, "bn1")(h, train))
                k2, b2 = cparams((3, 3, self.planes, self.planes),
                                 "conv2")
                out = nn.relu(bn4(self.planes, "bn2")(
                    conv3x3_s2d(out, k2, b2, dt), train))
                k3, b3 = cparams((1, 1, self.planes, out_planes), "conv3")
                out = bn4(out_planes, "bn3")(
                    conv1x1_s2d(out, k3, b3, dt), train)
                if in_pool == 2 or cin != out_planes:
                    kd, bd = cparams((1, 1, cin, out_planes),
                                     "downsample_conv")
                    identity = (pool2_conv1x1_s2d_to_s2d(x, kd, bd, dt)
                                if in_pool == 2
                                else conv1x1_s2d(x, kd, bd, dt))
                    identity = bn4(out_planes, "downsample_bn")(
                        identity, train)
                else:
                    identity = x
                return nn.relu(out + identity)

            # EXIT block (stride 2): back to normal layout for the
            # (already-efficient) 3x3; downsample reads the s2d input
            # directly -- its pool window IS one s2d cell.
            k1, b1 = cparams((1, 1, cin, self.planes), "conv1")
            out = nn.relu(bn4(self.planes, "bn1")(
                conv1x1_s2d(x, k1, b1, dt), train))
            out = depth_to_space(out)
            out = nn.relu(bn(self.planes, "bn2")(
                conv(self.planes, 3, "conv2")(out), train))
            out = bn(out_planes, "bn3")(
                conv(out_planes, 1, "conv3", pool=self.stride)(out), train)
            identity = S2dPooledConv1x1(
                out_planes, use_bias=self.fold_bn, dtype=self.dtype,
                quant_int8=use_quant, name="downsample_conv")(x)
            identity = bn(out_planes, "downsample_bn")(identity, train)
            return nn.relu(out + identity)

        out = nn.relu(bn(self.planes, "bn1")(
            conv(self.planes, 1, "conv1", pool=in_pool,
                 s2d_in=self.in_s2d)(x), train))
        out = nn.relu(bn(self.planes, "bn2")(
            conv(self.planes, 3, "conv2")(out), train))
        if self.stride > 1 and not fuse:
            out = avg_pool2d(out, self.stride)
        out = bn(out_planes, "bn3")(
            conv(out_planes, 1, "conv3",
                 pool=self.stride if fuse else 1)(out), train)

        identity = x
        if self.stride > 1 or in_pool > 1 or inplanes != out_planes:
            identity = x
            if self.stride > 1 and not fuse:
                identity = avg_pool2d(identity, self.stride)
            identity = conv(
                out_planes, 1, "downsample_conv",
                pool=max(self.stride, in_pool) if fuse else 1,
                s2d_in=self.in_s2d,
            )(identity)
            identity = bn(out_planes, "downsample_bn")(identity, train)
        return nn.relu(out + identity)

class AttentionPool2d(nn.Module):
    """Global self-attention over the 13x13 layer4 grid with a learned
    (resized) positional embedding and a conv residual connection."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    # declared pos-embed grid override: set to the inference grid when the
    # checkpoint's embedding was pre-resized by
    # fold_batchnorm(input_resolution=...), so the param shapes agree.
    pos_grid: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        pos_embed = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim**-0.5),
            ((self.pos_grid or self.spacial_dim) ** 2 + 1, self.embed_dim),
            jnp.float32,
        )

        # residual branch: 1x1 conv (no bias) + BN
        res = nn.Conv(
            self.output_dim,
            (1, 1),
            use_bias=self.fold_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="connect_conv",
        )(x)
        if not self.fold_bn:
            res = BatchNorm(self.output_dim, dtype=self.dtype, name="connect_bn")(
                res, train
            )

        # resize the trained (sd x sd) positional embedding to the actual
        # grid; the CLS slot (index 0) is dropped. sd is inferred from the
        # stored parameter (not self.spacial_dim) so that checkpoints with
        # the resize pre-folded (fold_batchnorm(input_resolution=...)) skip
        # the per-step resize entirely (resize2d no-ops when sd == h).
        sd = int(round((pos_embed.shape[0] - 1) ** 0.5))
        grid_pos = pos_embed[1:].reshape(1, sd, sd, self.embed_dim)
        grid_pos = resize2d(grid_pos, (h, w), "bicubic", align_corners=False)
        tokens = x.reshape(b, h * w, c) + grid_pos.reshape(1, h * w, c).astype(x.dtype)

        # token_flat: opt-in CRIS_FLAT_DOTS=1 A/B hook (default off --
        # the flatten measured in-model negative; layers.token_flat)
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = token_flat(dense(self.embed_dim, "q_proj"), tokens)
        k = token_flat(dense(self.embed_dim, "k_proj"), tokens)
        v = token_flat(dense(self.embed_dim, "v_proj"), tokens)
        attn = dot_product_attention(q, k, v, self.num_heads)
        out = token_flat(dense(self.output_dim, "c_proj"), attn)

        return nn.relu(out.reshape(b, h, w, self.output_dim) + res)


class ModifiedResNet(nn.Module):
    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    dtype: Optional[Dtype] = None
    remat: bool = False  # rematerialize bottlenecks in backward (saves HBM)
    fold_bn: bool = False  # inference variant: BN folded into conv weights
    scan_unroll: int = 1  # 0 = fully unroll (eval-only programs)
    fuse_pool: Optional[bool] = None  # None = auto by dtype (see Bottleneck)
    pos_grid: Optional[int] = None  # pre-folded attnpool pos-embed grid
    quant_int8: bool = False  # opt-in int8 serving path (fold_bn eval only)
    s2d_stem: Optional[bool] = None  # None = auto by dtype (see _auto_s2d)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        w = self.width
        fuse = _auto_fuse_pool(self.fuse_pool, self.dtype)

        def stem_conv(features, stride, name):
            return nn.Conv(
                features,
                (3, 3),
                strides=(stride, stride),
                padding=[(1, 1), (1, 1)],
                use_bias=self.fold_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        def stem_bn(features, name):
            if self.fold_bn:
                return lambda x, train: x
            return BatchNorm(features, dtype=self.dtype, name=name)

        # Fused Pallas stem (eval / fold_bn): conv1-3 + relus + the
        # anti-aliasing pool in one VMEM-resident kernel. MEASURED SLOWER
        # than XLA on v5e (36 ms vs 7.9 ms for the b32 chain): the stem's
        # 12/32/64-channel matmuls waste 4-16x of the MXU's 128-lane K/N
        # tiles and the fine (B, 26-row) grid multiplies per-matmul
        # overheads -- low-channel spatial convs just don't map to the
        # MXU. Kept behind CRIS_PALLAS_STEM=1 as an experimental path /
        # documented negative result (see ops/pallas/stem.py).
        use_pallas_stem = False
        if self.fold_bn and fuse and os.environ.get("CRIS_PALLAS_STEM") == "1":
            from ..ops.pallas import pallas_enabled, pallas_interpret
            from ..ops.pallas.stem import ROWS as _STEM_ROWS

            use_pallas_stem = (
                pallas_enabled()
                and x.shape[1] % (2 * _STEM_ROWS) == 0
                and x.shape[2] % (2 * _STEM_ROWS) == 0
            )

        # Space-to-depth stem (ops/s2d.py): conv1 produces the s2d layout
        # directly (k5/s4), conv2/conv3 stay s2d-resident as dense k3
        # convs at 4x channels, and layer1_0's fused-pool convs exit the
        # region as exact 1x1s — transpose-free, same parameter tree.
        # Requires fused pools (the exit op) and H, W % 4 == 0.
        stem_s2d = (
            _auto_s2d(self.s2d_stem, self.dtype)
            and fuse
            and not use_pallas_stem
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
        )

        if use_pallas_stem:
            from ..ops.pallas.stem import fused_stem_pool

            k1, b1 = ConvParams((3, 3, 3, w // 2), name="conv1")()
            k2, b2 = ConvParams((3, 3, w // 2, w // 2), name="conv2")()
            k3, b3 = ConvParams((3, 3, w // 2, w), name="conv3")()
            dt = self.dtype or x.dtype
            x = fused_stem_pool(
                x, k1.astype(dt), b1, k2.astype(dt), b2, k3.astype(dt), b3,
                interpret=pallas_interpret(),
            )
            stem_pooled = True
        elif stem_s2d:
            from ..ops.s2d import stem_conv1_s2d

            def s2d_bn(features, name):
                if self.fold_bn:
                    return lambda x, train: x
                return BatchNorm(features, dtype=self.dtype, phases=4,
                                 name=name)

            # conv2/conv3 stay int8-quantizable on the serving path: their
            # EMBEDDED widths (128->128, 128->256) are MXU-friendly and
            # measured faster under int8 (tools/bench_int8_more.py).
            # conv1 keeps bf16 (3-channel input, inherently layout-bound).
            # CRIS_INT8_STEM=0 excludes the stem sites (A/B hook).
            use_quant = (self.fold_bn and not train
                         and quant_int8_enabled(self.quant_int8)
                         and os.environ.get("CRIS_INT8_STEM", "1") == "1")
            k1, b1 = ConvParams((3, 3, 3, w // 2), use_bias=self.fold_bn,
                                name="conv1")()
            dt = self.dtype or x.dtype
            x = nn.relu(s2d_bn(w // 2, "bn1")(
                stem_conv1_s2d(x, k1, b1, dt), train))
            x = nn.relu(s2d_bn(w // 2, "bn2")(
                S2dConv3x3(w // 2, use_bias=self.fold_bn, dtype=self.dtype,
                           quant_int8=use_quant, name="conv2")(x), train))
            x = nn.relu(s2d_bn(w, "bn3")(
                S2dConv3x3(w, use_bias=self.fold_bn, dtype=self.dtype,
                           quant_int8=use_quant, name="conv3")(x), train))
            stem_pooled = False
        else:
            x = x.astype(self.dtype or x.dtype)
            x = nn.relu(stem_bn(w // 2, "bn1")(stem_conv(w // 2, 2, "conv1")(x), train))
            x = nn.relu(stem_bn(w // 2, "bn2")(stem_conv(w // 2, 1, "conv2")(x), train))
            x = nn.relu(stem_bn(w, "bn3")(stem_conv(w, 1, "conv3")(x), train))
            stem_pooled = False
            if not fuse:
                # unfused: the stem's anti-aliasing pool runs standalone;
                # fused, layer1_0's conv1/downsample absorb it (in_pool=2).
                x = avg_pool2d(x, 2)

        # static_argnums: 0=self(module), 1=x, 2=train
        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        )

        def stage(x, planes, blocks, stride, stage_idx, in_pool=1,
                  in_s2d=False, s2d_out=False):
            """First block (stride / channel change, carries the downsample
            branch) stands alone as layer{s}_0; the remaining blocks are
            identical stride-1 bottlenecks and run as one nn.scan over
            weights stacked along a leading block axis (params + running BN
            stats under a single layer{s}_tail subtree). Constant HLO size
            in depth -- the win is largest for RN101's 23-block layer3."""
            x = block_cls(
                planes, stride, dtype=self.dtype, fold_bn=self.fold_bn,
                in_pool=in_pool, fuse_pool=self.fuse_pool,
                quant_int8=self.quant_int8, in_s2d=in_s2d,
                s2d_out=s2d_out,
                name=f"layer{stage_idx}_0",
            )(x, train)
            if blocks <= 1:
                return x

            def body(block, carry, _):
                return block(carry, train), None

            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(
                body,
                # quant/quant_stats/quant_audit: per-layer int8 activation
                # scales / calibration maxabs / audit error stats
                # (QuantConv); absent collections are ignored by nn.scan,
                # but an UNDECLARED one makes in-scan sows silent no-ops
                # (the round-4 int8 audit initially saw only the 6
                # non-scanned sites)
                variable_axes={"params": 0, "batch_stats": 0,
                               "quant": 0, "quant_stats": 0,
                               "quant_audit": 0},
                split_rngs={"params": True},
                length=blocks - 1,
                unroll=min(self.scan_unroll or (blocks - 1), blocks - 1),
            )
            tail = Bottleneck(
                planes, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                fuse_pool=self.fuse_pool, quant_int8=self.quant_int8,
                # when the stage emits s2d, its tail blocks run fully
                # s2d-RESIDENT (stride-1 identity blocks)
                in_s2d=s2d_out, s2d_out=s2d_out,
                name=f"layer{stage_idx}_tail",
            )
            x, _ = scan(tail, x, None)
            return x

        # Tier 2 (CRIS_S2D_L1=1, opt-in): layer1 runs fully s2d-resident
        # at quarter spatial / 4x channels and layer2_0 is the region's
        # exit. MEASURED NEGATIVE in-model despite every resident conv
        # winning standalone (tools/ab_s2d.py: eval 887.9 -> 829.6
        # img/s, train 218.6 -> 200.9): the entry/exit crossing convs
        # (pool2-to-s2d kernels, 4x zero-padded FLOPs) + the exit d2s
        # eat the resident wins. Region-level wiring candidates in
        # tools/bench_s2d_region.py; default stays tier 1.
        s2d_l1 = stem_s2d and os.environ.get("CRIS_S2D_L1", "0") == "1"
        x = stage(x, w, self.layers[0], 1, 1,
                  in_pool=1 if (stem_pooled or not fuse) else 2,
                  in_s2d=stem_s2d, s2d_out=s2d_l1)
        x2 = stage(x, w * 2, self.layers[1], 2, 2, in_s2d=s2d_l1)
        x3 = stage(x2, w * 4, self.layers[2], 2, 3)
        x4 = stage(x3, w * 8, self.layers[3], 2, 4)

        embed_dim = w * 32
        x4 = AttentionPool2d(
            spacial_dim=self.input_resolution // 32,
            embed_dim=embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            pos_grid=self.pos_grid,
            name="attnpool",
        )(x4, train)
        return x2, x3, x4
