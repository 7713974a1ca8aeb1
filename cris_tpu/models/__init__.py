"""Model registry and builder.

``build_segmenter(cfg)`` mirrors /root/reference/model/__init__.py:32-49:
it constructs the CRIS module and the backbone/head parameter-group split
(backbone params excluding positional embeddings train at
lr_multi * base_lr; everything else at base_lr). In JAX the split is a
label pytree consumed by optax.multi_transform instead of torch param
groups.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from .clip import CLIP, CLIPConfig, CLIP_PRESETS, preset_from_name
from .clip_resnet import AttentionPool2d, Bottleneck, ModifiedResNet
from .clip_text import ResidualAttentionBlock, TextEncoder, Transformer
from .clip_vit import VisionTransformer
from .decoder import TransformerDecoder, TransformerDecoderLayer
from .layers import (
    BatchNorm, ConvBNReLU, CoordConv, LayerNormF32, LinearBNReLU, QuantConv,
)
from .neck import FPN
from .projector import Projector
from .segmenter import CRIS, bce_with_logits

_DTYPES = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
           "fp32": None, "float32": None, "f32": None}


def resolve_dtype(name) -> Any:
    if name is None:
        return jnp.bfloat16
    if isinstance(name, str):
        key = name.lower()
        if key in _DTYPES:
            return _DTYPES[key]
        raise ValueError(f"unknown precision {name!r}")
    return name


def build_segmenter(cfg, clip_config: CLIPConfig = None) -> CRIS:
    """Build the CRIS Flax module from a flat config (see config/*/*.yaml)."""
    if clip_config is None:
        clip_config = preset_from_name(cfg.clip_pretrain)
    # precision "int8": bf16 compute + dynamic-int8 backbone convs on the
    # BN-folded serving path (ops/quant.py); parameter tree is unchanged
    precision = str(cfg.get("precision", "bf16")).lower()
    quant_int8 = precision == "int8" or bool(cfg.get("quant_int8", False))
    if precision == "int8":
        precision = "bf16"
    return CRIS(
        clip_config=clip_config,
        fpn_in=tuple(cfg.fpn_in),
        fpn_out=tuple(cfg.fpn_out),
        vis_dim=cfg.vis_dim,
        num_layers=cfg.num_layers,
        num_head=cfg.num_head,
        dim_ffn=cfg.dim_ffn,
        dropout=cfg.dropout,
        intermediate=cfg.get("intermediate", False),
        dtype=resolve_dtype(precision),
        quant_int8=quant_int8,
        remat=bool(cfg.get("remat", False)),
        # 0 = fully unroll the homogeneous layer scans (measured best for
        # the R50 train program: fits HBM at b32 and compiles in ~80s vs
        # the 100-240s/OOM of the per-layer-module layout); set 1 (+remat)
        # to trade step time for a much smaller activation footprint
        scan_unroll=int(cfg.get("scan_unroll", 0)),
    )


def param_group_label(path: Tuple[str, ...]) -> str:
    """'backbone' for CLIP params except positional embeddings, else 'head'
    (reference split at /root/reference/model/__init__.py:36-40).
    Path entries may be plain strings or jax KeyEntry objects (DictKey)."""
    flat = "/".join(getattr(p, "key", None) or str(p) for p in path)
    if flat.startswith("backbone") and "positional_embedding" not in flat:
        return "backbone"
    return "head"


__all__ = [
    "CLIP",
    "CLIPConfig",
    "CLIP_PRESETS",
    "preset_from_name",
    "AttentionPool2d",
    "Bottleneck",
    "ModifiedResNet",
    "ResidualAttentionBlock",
    "TextEncoder",
    "Transformer",
    "VisionTransformer",
    "TransformerDecoder",
    "TransformerDecoderLayer",
    "BatchNorm",
    "ConvBNReLU",
    "CoordConv",
    "LayerNormF32",
    "LinearBNReLU",
    "QuantConv",
    "FPN",
    "Projector",
    "CRIS",
    "bce_with_logits",
    "build_segmenter",
    "param_group_label",
    "resolve_dtype",
]
