"""Vision-language transformer decoder.

Behavioral spec from /root/reference/model/layers.py:87-250: the 676
flattened visual tokens self-attend (with fixed 2-D sincos positions),
cross-attend to the word features (1-D sincos positions on keys,
key-padding mask from token id 0), and pass through an FFN with an
internal LayerNorm; each sublayer is pre-LN with an extra post-attention
LayerNorm before the residual add. Positional encodings are compile-time
constants here (the reference recomputes them on CPU each forward,
layers.py:163-164 -- SURVEY.md quirk (b)).

The q/k/v projections are separate Dense layers applied to different
inputs (queries/keys carry positions, values do not), which is exactly how
torch's packed in_proj splits at runtime.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.posenc import sincos_1d, sincos_2d
from .layers import LayerNormF32, token_flat

Dtype = Any


class MultiheadAttention(nn.Module):
    """q/k/v/out projection wrapper around the shared attention core,
    mirroring torch nn.MultiheadAttention parameterization."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        # token_flat: opt-in CRIS_FLAT_DOTS=1 A/B hook (default off --
        # the flatten measured in-model negative; layers.token_flat)
        dense = lambda name: nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = token_flat(dense("q_proj"), query)
        k = token_flat(dense("k_proj"), key)
        v = token_flat(dense("v_proj"), value)
        dropout_rng = None
        if train and self.dropout > 0.0:
            dropout_rng = self.make_rng("dropout")
        out = dot_product_attention(
            q,
            k,
            v,
            self.num_heads,
            key_padding_mask=key_padding_mask,
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            deterministic=not train,
        )
        return token_flat(dense("out_proj"), out)


class TransformerDecoderLayer(nn.Module):
    d_model: int = 512
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        vis: jnp.ndarray,      # (B, HW, D)
        txt: jnp.ndarray,      # (B, L, D)
        vis_pos: jnp.ndarray,  # (HW, D)
        txt_pos: jnp.ndarray,  # (L, D)
        pad_mask: jnp.ndarray,  # (B, L) True = padding
        train: bool = False,
    ) -> jnp.ndarray:
        ln = lambda name: LayerNormF32(self.d_model, name=name)
        drop = lambda name: nn.Dropout(self.dropout, name=name)
        vis_pos = vis_pos.astype(vis.dtype)
        txt_pos = txt_pos.astype(vis.dtype)

        # self-attention over visual tokens (queries/keys carry positions)
        y = ln("norm1")(vis)
        y = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(y + vis_pos, y + vis_pos, y, train=train)
        y = ln("self_attn_norm")(y)
        vis = vis + drop("dropout1")(y, deterministic=not train)

        # cross-attention: visual queries over word keys/values
        y = ln("norm2")(vis)
        y = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            name="multihead_attn",
        )(y + vis_pos, txt + txt_pos, txt, key_padding_mask=pad_mask, train=train)
        y = ln("cross_attn_norm")(y)
        vis = vis + drop("dropout2")(y, deterministic=not train)

        # FFN with internal LayerNorm (layers.py:209-212); token_flat
        # is the opt-in CRIS_FLAT_DOTS A/B hook (default off)
        y = ln("norm3")(vis)
        y = token_flat(nn.Dense(
            self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
            name="ffn_fc1",
        ), y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, name="ffn_dropout")(y, deterministic=not train)
        y = LayerNormF32(self.dim_feedforward, name="ffn_norm")(y)
        y = token_flat(nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="ffn_fc2"
        ), y)
        vis = vis + drop("dropout3")(y, deterministic=not train)
        return vis


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    dim_ffn: int
    dropout: float
    return_intermediate: bool = False
    dtype: Optional[Dtype] = None
    remat: bool = False
    scan_unroll: int = 1  # 0 = fully unroll (eval-only programs)

    @nn.compact
    def __call__(
        self,
        vis: jnp.ndarray,       # (B, H, W, D)
        txt: jnp.ndarray,       # (B, L, D)
        pad_mask: jnp.ndarray,  # (B, L)
        train: bool = False,
    ) -> jnp.ndarray:
        b, h, w, d = vis.shape
        l = txt.shape[1]
        vis_pos = jnp.asarray(sincos_2d(d, h, w))
        txt_pos = jnp.asarray(sincos_1d(d, l))

        x = vis.reshape(b, h * w, d)
        norm = LayerNormF32(self.d_model, name="norm")

        # The layers are identical, so they run as one nn.scan over weights
        # stacked along a leading layer axis (params under a single 'layers'
        # subtree): constant HLO size in depth. txt/positions/mask are
        # loop-invariant (nn.broadcast); `train` is a static closure.
        def body(layer, carry, txt, vis_pos, txt_pos, pad_mask):
            y = layer(carry, txt, vis_pos, txt_pos, pad_mask, train)
            return y, (y if self.return_intermediate else None)

        if self.remat:
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.num_layers,
            unroll=min(self.scan_unroll or self.num_layers, self.num_layers),
        )
        layer = TransformerDecoderLayer(
            self.d_model,
            self.nhead,
            self.dim_ffn,
            self.dropout,
            dtype=self.dtype,
            name="layers",
        )
        x, ys = scan(layer, x, txt, vis_pos, txt_pos, pad_mask)

        out = norm(x)
        if self.return_intermediate:
            # reference semantics (layers.py:139-146): every intermediate is
            # final-norm'd; the last entry IS the final output
            inter = norm(ys)  # (L, B, HW, D); LayerNorm acts on the last dim
            return inter.reshape(self.num_layers, b, h, w, d)
        return out.reshape(b, h, w, d)
