"""FPN-style multimodal fusion neck.

Behavioral spec from /root/reference/model/layers.py:253-309: the
sentence-level text state gates the deepest visual level by broadcast
multiply, levels are merged top-down (bilinear x2) and bottom-up (avg
pool), then the three projected levels are concatenated, aggregated with a
1x1 conv and refined by a CoordConv block, producing the (B, 26, 26, 512)
query feature map for the decoder.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import avg_pool2d, upsample2x
from .layers import (BatchNorm, CatUpConvBNReLU, ConvBNReLU, CoordConv,
                     LinearBNReLU, auto_fuse_upsample, quant_int8_enabled)

Dtype = Any


class FPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 1024)
    out_channels: Sequence[int] = (256, 512, 1024)
    dtype: Optional[Dtype] = None
    fold_bn: bool = False  # folds conv/linear+BN pairs; norm_layer BN stays
    fuse_upsample: Optional[bool] = None  # None = auto by dtype (see layers)
    # opt-in int8 serving path for the upsample-fold cores (fold_bn eval
    # only; CRIS_INT8_UPFOLD=0 excludes the family in A/B runs)
    quant_int8: bool = False

    @nn.compact
    def __call__(
        self,
        imgs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        state: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        v3, v4, v5 = imgs  # (52^2, in0) / (26^2, in1) / (13^2, in2), NHWC
        out0, out1, out2 = self.out_channels
        # default ON via the PHASE decomposition (four non-dilated convs,
        # int8-2x-eligible): in-model +3.5% (954.8 -> 988.6 img/s,
        # tools/ab_int8.py round 5). The direct ld2 int8 form was a
        # NEGATIVE (lhs_dilated int8 runs at bf16 rate) -- the phase
        # rewrite is what made this family quantizable.
        use_quant = (
            self.fold_bn and not train and quant_int8_enabled(self.quant_int8)
            and os.environ.get("CRIS_INT8_UPFOLD", "1") == "1"
        )
        # the FPN "head" conv family (v-projections, level projections,
        # CoordConv block): the round-5 int8-mode audit measured ~5.8 ms
        # of these still running bf16 at 50-98% peak after every backbone
        # family was quantized. CRIS_INT8_HEAD=0 excludes the family.
        use_quant_head = (
            self.fold_bn and not train and quant_int8_enabled(self.quant_int8)
            and os.environ.get("CRIS_INT8_HEAD", "1") == "1"
        )

        # fusion 1: gate v5 with the projected sentence state
        state = LinearBNReLU(out2, dtype=self.dtype, fold_bn=self.fold_bn, name="txt_proj")(state, train)
        f5 = ConvBNReLU(out2, 1, 0, dtype=self.dtype, fold_bn=self.fold_bn,
                        quant_int8=use_quant_head, name="f1_v_proj")(v5, train)
        f5 = f5 * state[:, None, None, :]
        f5 = BatchNorm(out2, dtype=self.dtype, name="norm_layer")(f5, train)
        f5 = nn.relu(f5)

        fuse = auto_fuse_upsample(self.fuse_upsample, self.dtype)

        # fusion 2: v4 + upsampled f5
        f4 = ConvBNReLU(out1, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                        quant_int8=use_quant_head, name="f2_v_proj")(v4, train)
        if fuse:
            f4 = CatUpConvBNReLU(out1, dtype=self.dtype, fold_bn=self.fold_bn,
                                 quant_int8=use_quant, name="f2_cat")(
                                     [f4], f5, train)
        else:
            f5_up = upsample2x(f5)
            f4 = ConvBNReLU(out1, 1, 0, dtype=self.dtype, fold_bn=self.fold_bn, name="f2_cat")(
                jnp.concatenate([f4, f5_up], axis=-1), train
            )

        # fusion 3: pooled v3 + f4
        f3 = ConvBNReLU(out0, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                        quant_int8=use_quant_head, name="f3_v_proj")(v3, train)
        f3 = avg_pool2d(f3, 2, 2)
        f3 = ConvBNReLU(out1, 1, 0, dtype=self.dtype, fold_bn=self.fold_bn,
                        quant_int8=use_quant_head, name="f3_cat")(
            jnp.concatenate([f3, f4], axis=-1), train
        )

        # fusion 4: project all three levels to out1 and aggregate at 26x26
        fq5 = ConvBNReLU(out1, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                         quant_int8=use_quant_head, name="f4_proj5")(f5, train)
        fq4 = ConvBNReLU(out1, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                         quant_int8=use_quant_head, name="f4_proj4")(f4, train)
        fq3 = ConvBNReLU(out1, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                         quant_int8=use_quant_head, name="f4_proj3")(f3, train)
        if fuse:
            fq = CatUpConvBNReLU(out1, dtype=self.dtype, fold_bn=self.fold_bn,
                                 quant_int8=use_quant, name="aggr")(
                                     [fq3, fq4], fq5, train)
        else:
            fq5 = upsample2x(fq5)
            fq = jnp.concatenate([fq3, fq4, fq5], axis=-1)
            fq = ConvBNReLU(out1, 1, 0, dtype=self.dtype, fold_bn=self.fold_bn, name="aggr")(fq, train)
        fq = CoordConv(out1, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                       quant_int8=use_quant_head, name="coordconv_0")(fq, train)
        fq = ConvBNReLU(out1, 3, 1, dtype=self.dtype, fold_bn=self.fold_bn,
                        quant_int8=use_quant_head, name="coordconv_1")(fq, train)
        return fq  # (B, 26, 26, out1)
