"""CRIS segmenter: CLIP encoders -> FPN neck -> VL decoder -> Projector.

Behavioral spec from /root/reference/model/segmenter.py:10-62. Inputs are
NHWC images and (B, L) token ids; the padding mask is derived from token
id 0. In train mode the GT mask is nearest-downsampled to the prediction
resolution and the mean binary cross entropy (with logits, fp32) is
returned alongside the prediction and target.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize2d
from .clip import CLIP, CLIPConfig
from .decoder import TransformerDecoder
from .neck import FPN
from .projector import Projector

Dtype = Any


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross entropy with logits, computed in fp32."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # log(1 + exp(-|x|)) + max(x, 0) - x*z  (numerically stable form)
    loss = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss)


class CRIS(nn.Module):
    clip_config: CLIPConfig
    fpn_in: Tuple[int, ...] = (512, 1024, 1024)
    fpn_out: Tuple[int, ...] = (256, 512, 1024)
    vis_dim: int = 512
    num_layers: int = 3
    num_head: int = 8
    dim_ffn: int = 2048
    dropout: float = 0.1
    intermediate: bool = False
    dtype: Optional[Dtype] = None
    remat: bool = False
    fold_bn: bool = False  # inference-only: use with fold_batchnorm(variables)
    # lax.scan unroll for the homogeneous layer stacks; 0 = fully unroll.
    # Train programs keep 1 (constant HLO size through the remote
    # compiler); eval-only programs set 0 (XLA regains cross-layer fusion;
    # parameter layout is identical either way).
    scan_unroll: int = 1
    # inference grid of a pre-folded attnpool pos embed (see
    # checkpoint.fold_batchnorm(input_resolution=...)); None = trained grid
    pos_grid: Optional[int] = None
    # override the dtype-keyed auto gate for fused anti-aliasing pools
    # (models/clip_resnet.py:_auto_fuse_pool); None = auto
    fuse_pool: Optional[bool] = None
    # opt-in int8 dynamic-quantized backbone convs for serving
    # (``precision: int8`` / CRIS_INT8=1; fold_bn eval only, see
    # ops/quant.py) -- NOT the parity path
    quant_int8: bool = False

    def setup(self):
        self.backbone = CLIP(
            self.clip_config, dtype=self.dtype, remat=self.remat,
            fold_bn=self.fold_bn, scan_unroll=self.scan_unroll,
            pos_grid=self.pos_grid, fuse_pool=self.fuse_pool,
            quant_int8=self.quant_int8,
        )
        self.neck = FPN(
            tuple(self.fpn_in), tuple(self.fpn_out), dtype=self.dtype,
            fold_bn=self.fold_bn, quant_int8=self.quant_int8,
        )
        self.decoder = TransformerDecoder(
            num_layers=self.num_layers,
            d_model=self.vis_dim,
            nhead=self.num_head,
            dim_ffn=self.dim_ffn,
            dropout=self.dropout,
            return_intermediate=self.intermediate,
            dtype=self.dtype,
            remat=self.remat,
            scan_unroll=self.scan_unroll,
        )
        self.proj = Projector(
            word_dim=self.clip_config.embed_dim,
            in_dim=self.vis_dim // 2,
            kernel_size=3,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            quant_int8=self.quant_int8,
        )

    def __call__(
        self,
        img: jnp.ndarray,              # (B, H, W, 3)
        word: jnp.ndarray,             # (B, L) int token ids
        mask: Optional[jnp.ndarray] = None,  # (B, H, W, 1) in [0, 1]
        train: bool = False,
    ):
        pad_mask = word == 0

        vis = self.backbone.encode_image(img, train)
        word_feats, state = self.backbone.encode_text(word)

        fq = self.neck(vis, state, train)
        fq = self.decoder(fq, word_feats, pad_mask, train)
        if self.intermediate:
            fq = fq[-1]
        pred = self.proj(fq, state, train)  # (B, 104, 104, 1)

        if mask is not None:
            if pred.shape[1:3] != mask.shape[1:3]:
                mask = resize2d(mask, pred.shape[1:3], "nearest")
            loss = bce_with_logits(pred, mask)
            return pred, mask, loss
        return pred
