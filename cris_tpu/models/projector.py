"""Text-to-pixel projector: upsampling trunk + per-sample dynamic conv head.

Behavioral spec from /root/reference/model/layers.py:47-84: the decoder
output is upsampled 26->52->104 with bilinear x2 + conv blocks and a final
1x1 conv; the sentence state generates a per-sample 3x3x256 kernel and
scalar bias via one Linear, applied as a per-sample convolution. The
reference's groups=B grouped conv becomes a batched einsum contraction
(cris_tpu.ops.dynamic_conv2d), which is the MXU-friendly formulation.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dynamic_conv import dynamic_conv2d
from ..ops.resize import upsample2x
from .layers import (ConvBNReLU, QuantConv, UpConvBNReLU,
                     auto_fuse_upsample, quant_int8_enabled)

Dtype = Any


class Projector(nn.Module):
    word_dim: int = 1024
    in_dim: int = 256
    kernel_size: int = 3
    dtype: Optional[Dtype] = None
    fold_bn: bool = False
    fuse_upsample: Optional[bool] = None  # None = auto by dtype
    # opt-in int8 serving path for the upsample-fold cores (fold_bn eval
    # only; CRIS_INT8_UPFOLD=0 excludes the family in A/B runs)
    quant_int8: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, word: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """
        x:    (B, 26, 26, 2*in_dim) decoder output
        word: (B, word_dim) sentence state
        returns (B, 104, 104, 1) mask logits
        """
        c = self.in_dim
        k = self.kernel_size
        fuse = auto_fuse_upsample(self.fuse_upsample, self.dtype)

        # visual trunk: os16 -> os4
        if fuse:
            # default ON via the PHASE decomposition (non-dilated convs,
            # int8-2x-eligible; +3.5% in-model, tools/ab_int8.py r5).
            # The direct ld2 int8 form was a negative -- CRIS_INT8_UPFOLD=0
            # opts the family out.
            use_quant = (
                self.fold_bn and not train
                and quant_int8_enabled(self.quant_int8)
                and os.environ.get("CRIS_INT8_UPFOLD", "1") == "1"
            )
            x = UpConvBNReLU(2 * c, dtype=self.dtype, fold_bn=self.fold_bn,
                             quant_int8=use_quant, name="vis_conv1")(x, train)
            x = UpConvBNReLU(c, dtype=self.dtype, fold_bn=self.fold_bn,
                             quant_int8=use_quant, name="vis_conv2")(x, train)
        else:
            x = upsample2x(x)
            x = ConvBNReLU(2 * c, 3, 1, dtype=self.dtype,
                           fold_bn=self.fold_bn, name="vis_conv1")(x, train)
            x = upsample2x(x)
            x = ConvBNReLU(c, 3, 1, dtype=self.dtype,
                           fold_bn=self.fold_bn, name="vis_conv2")(x, train)
        # head-family int8 site (same param tree as nn.Conv): the 104^2
        # 256->256 1x1 measured 0.86 ms bf16 vs 0.49 int8 in the round-5
        # int8-mode audit; CRIS_INT8_HEAD=0 excludes the family
        if (self.fold_bn and not train
                and quant_int8_enabled(self.quant_int8)
                and os.environ.get("CRIS_INT8_HEAD", "1") == "1"):
            x = QuantConv(c, 1, use_bias=True, dtype=self.dtype,
                          name="vis_out")(x)
        else:
            x = nn.Conv(
                c, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32, name="vis_out",
            )(x)

        # textual kernel generator: (B, word_dim) -> per-sample (C, k, k) + bias
        b = x.shape[0]
        params = nn.Dense(
            c * k * k + 1, dtype=self.dtype, param_dtype=jnp.float32, name="txt"
        )(word)
        weight = params[:, :-1].reshape(b, c, k, k)
        bias = params[:, -1]
        return dynamic_conv2d(x, weight, bias, k)
