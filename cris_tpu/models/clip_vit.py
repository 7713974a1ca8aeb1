"""CLIP VisionTransformer (dense variant).

Parity with /root/reference/model/clip.py:286-332: patchify conv, CLS +
positional embeddings, pre-LN transformer, and the dense-prediction
modification -- ln_post is applied to the *patch tokens* (CLS dropped)
before the output projection. Buildable but unused by the shipped configs,
exactly as in the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .clip_text import Transformer
from .layers import LayerNormF32

Dtype = Any


class VisionTransformer(nn.Module):
    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: Optional[Dtype] = None
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        scale = self.width**-0.5
        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=scale),
            (self.width,),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=scale),
            ((self.input_resolution // self.patch_size) ** 2 + 1, self.width),
            jnp.float32,
        )
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=scale),
            (self.width, self.output_dim),
            jnp.float32,
        )

        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = x.reshape(b, -1, self.width)  # (B, grid**2, width)
        cls = jnp.broadcast_to(
            class_embedding.astype(x.dtype)[None, None], (b, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(x.dtype)
        x = LayerNormF32(self.width, name="ln_pre")(x)
        x = Transformer(
            self.width, self.layers, self.heads, dtype=self.dtype,
            scan_unroll=self.scan_unroll, name="transformer",
        )(x)
        x = LayerNormF32(self.width, name="ln_post")(x[:, 1:, :])
        return (x.astype(jnp.float32) @ proj).astype(x.dtype)
