"""Multi-head scaled dot-product attention (XLA path).

Functional core shared by the CLIP encoders and the VL decoder. Matches
torch ``nn.MultiheadAttention`` math (q scaled by head_dim**-0.5, softmax
over keys in fp32, optional additive mask / key-padding mask, dropout on
attention weights). Projections live in the calling Flax modules.

A Pallas flash-attention kernel can be swapped in for the self-attention
path via cris_tpu.ops.pallas; this XLA version is the always-available
fallback and the numerics ground truth.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large finite negative: avoids NaNs for fully-masked rows


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, S, E) -> (B, num_heads, S, head_dim)."""
    b, s, e = x.shape
    return x.reshape(b, s, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, D) -> (B, S, E)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    attn_mask: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Attention over already-projected q/k/v of shape (B, S, E).

    attn_mask: additive (Sq, Sk) float mask (e.g. causal -inf upper triangle).
    key_padding_mask: (B, Sk) boolean, True = ignore that key.
    Softmax is computed in float32 regardless of input dtype.
    """
    head_dim = q.shape[-1] // num_heads
    scale = head_dim**-0.5

    # Fused Pallas kernel path: logits never touch HBM, and the (B, S, E)
    # layout is consumed directly (no head split/merge transposes -- those
    # were ~1 ms HBM passes each at the decoder's 32x676x512). Engaged for
    # the deterministic unbiased-mask sites (decoder self/cross-attn,
    # attnpool); the causal text encoder and attention-dropout training
    # path stay on XLA.
    use_dropout = dropout_rate > 0.0 and not deterministic
    if attn_mask is None and not use_dropout and head_dim <= 128:
        from .pallas import (
            fused_attention_bse, pallas_enabled, pallas_interpret,
        )

        # q-length guard alongside the kv one: the kernel allocates
        # (block_q, t_pad) f32 logits per program; an unexpectedly long
        # query site should fall back to XLA rather than blow scoped VMEM
        if pallas_enabled() and k.shape[1] <= 2048 and q.shape[1] <= 2048:
            kv_valid = None
            if key_padding_mask is not None:
                kv_valid = ~key_padding_mask
            # positional args: custom_vjp functions reject keywords
            return fused_attention_bse(
                q, k, v, num_heads, kv_valid, None, pallas_interpret()
            )

    # Training path with attention-weight dropout: fwd AND bwd Pallas
    # kernels that regenerate the dropout mask in-kernel (never
    # materializing the (B, H, Sq, Sk) weights -- the XLA formulation of
    # this path was ~47 ms of the 220 ms train step on v5e). The mask
    # bits come from the TPU PRNG seeded from dropout_rng, so train
    # stochasticity is reproducible per rng but not bit-identical to the
    # XLA bernoulli fallback.
    if (attn_mask is None and use_dropout and head_dim <= 128
            and dropout_rng is not None):
        from .pallas import pallas_enabled, pallas_interpret
        from .pallas.attention_train import (
            fused_attention_bse_dropout, supports_shape,
        )

        if (pallas_enabled() and k.shape[1] <= 2048 and q.shape[1] <= 2048
                and supports_shape(num_heads, head_dim)):
            kv_valid = None
            if key_padding_mask is not None:
                kv_valid = ~key_padding_mask
            seed = jax.random.randint(
                dropout_rng, (), 0, 2**31 - 1, dtype=jnp.int32
            )
            return fused_attention_bse_dropout(
                q, k, v, num_heads, kv_valid, float(dropout_rate), seed,
                pallas_interpret(),
            )

    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale

    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    if key_padding_mask is not None:
        pad = key_padding_mask[:, None, None, :]
        logits = jnp.where(pad, NEG_INF, logits)

    weights = jax.nn.softmax(logits, axis=-1)

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return merge_heads(out)


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference builds the same at /root/reference/model/clip.py:424-430)."""
    mask = jnp.full((length, length), NEG_INF, dtype=dtype)
    return jnp.triu(mask, k=1)
