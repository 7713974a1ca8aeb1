"""CLIP text transformer (and the shared ViT-style residual blocks).

Behavioral spec from /root/reference/model/clip.py:239-283,371-456:
pre-LN residual attention blocks with QuickGELU MLPs, a causal mask sized
to the actual expression length, learned positional embeddings sliced to
the sequence length, and a dual readout: the full ln_final token sequence
(fed to the VL decoder) plus the EOT token projected by text_projection
(the sentence-level "state" driving the FPN and Projector).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import causal_mask, dot_product_attention
from .layers import LayerNormF32, quick_gelu, token_flat

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int
    causal: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # token_flat: opt-in CRIS_FLAT_DOTS=1 A/B hook (default off --
        # the flatten measured in-model negative; layers.token_flat)
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        # attention with packed qkv projection (torch MultiheadAttention layout)
        y = LayerNormF32(self.d_model, name="ln_1")(x)
        qkv = token_flat(dense(3 * self.d_model, "attn_in_proj"), y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        mask = causal_mask(x.shape[1]) if self.causal else None
        y = dot_product_attention(q, k, v, self.n_head, attn_mask=mask)
        x = x + token_flat(dense(self.d_model, "attn_out_proj"), y)

        y = LayerNormF32(self.d_model, name="ln_2")(x)
        y = token_flat(dense(4 * self.d_model, "mlp_c_fc"), y)
        y = quick_gelu(y)
        x = x + token_flat(dense(self.d_model, "mlp_c_proj"), y)
        return x


class Transformer(nn.Module):
    """Stack of identical residual blocks, executed as one ``nn.scan`` over
    weights stacked along a leading layer axis (params live under a single
    ``resblocks`` subtree of shape (layers, ...)).

    The reference unrolls a Python loop of per-layer modules
    (clip.py:258-283); scanning instead keeps the compiled HLO size
    constant in depth, which matters here because every train program goes
    through a remote-compile service at fixed cost per HLO byte.
    """

    width: int
    layers: int
    heads: int
    causal: bool = False
    dtype: Optional[Dtype] = None
    # lax.scan unroll factor; 0 = fully unroll (same stacked param layout,
    # but XLA regains cross-layer fusion/layout freedom -- use for
    # eval-only programs where HLO size is cheap)
    scan_unroll: int = 1
    # rematerialize block internals in backward: scan saves only the
    # between-block carries instead of stacked per-block residuals
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def body(block, carry, _):
            return block(carry), None

        if self.remat:
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.layers,
            unroll=min(self.scan_unroll or self.layers, self.layers),
        )
        block = ResidualAttentionBlock(
            self.width,
            self.heads,
            causal=self.causal,
            dtype=self.dtype,
            name="resblocks",
        )
        x, _ = scan(block, x, None)
        return x


class TextEncoder(nn.Module):
    """Token ids (B, L) -> (word features (B, L, width), state (B, embed_dim))."""

    vocab_size: int
    context_length: int
    width: int
    heads: int
    layers: int
    embed_dim: int
    dtype: Optional[Dtype] = None
    scan_unroll: int = 1
    remat: bool = False

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )

        seq_len = text.shape[1]
        x = token_embedding[text].astype(self.dtype or jnp.float32)
        x = x + positional_embedding[:seq_len].astype(x.dtype)
        x = Transformer(
            self.width,
            self.layers,
            self.heads,
            causal=True,
            dtype=self.dtype,
            scan_unroll=self.scan_unroll,
            remat=self.remat,
            name="transformer",
        )(x)
        word = LayerNormF32(self.width, name="ln_final")(x)

        # EOT token = highest id in each row (clip.py:450-452)
        eot_index = jnp.argmax(text, axis=-1)
        eot = jnp.take_along_axis(word, eot_index[:, None, None], axis=1)[:, 0]
        state = (eot.astype(jnp.float32) @ text_projection).astype(word.dtype)
        return word, state
