"""CLIP dual-encoder composition and architecture presets.

The reference infers all CLIP hyperparameters from the TorchScript
checkpoint's tensor shapes (/root/reference/model/clip.py:503-554); here
the same inference lives in cris_tpu.checkpoint.torch_convert, and this
module consumes an explicit CLIPConfig (with named presets for runs
without a checkpoint).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .clip_resnet import ModifiedResNet
from .clip_text import TextEncoder
from .clip_vit import VisionTransformer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: Union[Tuple[int, int, int, int], int]
    vision_width: int
    vision_patch_size: Optional[int]
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64


# Published OpenAI CLIP architectures used by the CRIS configs.
CLIP_PRESETS = {
    "RN50": CLIPConfig(
        embed_dim=1024,
        image_resolution=224,
        vision_layers=(3, 4, 6, 3),
        vision_width=64,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
    ),
    "RN101": CLIPConfig(
        embed_dim=512,
        image_resolution=224,
        vision_layers=(3, 4, 23, 3),
        vision_width=64,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
    ),
    # Small architecture for smoke tests / CI / dry runs (no released
    # weights; full CLIP vocab so the real tokenizer works unchanged).
    "TINY": CLIPConfig(
        embed_dim=64,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
    ),
}


def preset_from_name(name: str) -> CLIPConfig:
    """Resolve a preset from a checkpoint path like 'pretrain/RN50.pt'."""
    base = name.rsplit("/", 1)[-1].split(".")[0].upper()
    if base in CLIP_PRESETS:
        return CLIP_PRESETS[base]
    raise KeyError(
        f"No CLIP preset for {name!r}; known: {sorted(CLIP_PRESETS)}"
    )


class CLIP(nn.Module):
    """Dual encoder. Submodule names: 'visual' and 'text'."""

    config: CLIPConfig
    dtype: Optional[Dtype] = None
    remat: bool = False
    fold_bn: bool = False
    scan_unroll: int = 1  # 0 = fully unroll the layer scans (eval-only)
    pos_grid: Optional[int] = None  # pre-folded attnpool pos-embed grid
    fuse_pool: Optional[bool] = None  # fused anti-aliasing pools (None = auto)
    quant_int8: bool = False  # opt-in int8 serving path (fold_bn eval only)

    def setup(self):
        import numpy as np

        # contrastive temperature (clip.py:385); unused by CRIS's forward --
        # the reason the reference needs DDP find_unused_parameters=True
        self.logit_scale = self.param(
            "logit_scale",
            lambda rng: jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        )
        cfg = self.config
        if cfg.is_vit:
            self.visual = VisionTransformer(
                input_resolution=cfg.image_resolution,
                patch_size=cfg.vision_patch_size,
                width=cfg.vision_width,
                layers=cfg.vision_layers,
                heads=cfg.vision_heads,
                output_dim=cfg.embed_dim,
                dtype=self.dtype,
                scan_unroll=self.scan_unroll,
            )
        else:
            self.visual = ModifiedResNet(
                layers=cfg.vision_layers,
                output_dim=cfg.embed_dim,
                heads=cfg.vision_heads,
                input_resolution=cfg.image_resolution,
                width=cfg.vision_width,
                dtype=self.dtype,
                remat=self.remat,
                fold_bn=self.fold_bn,
                scan_unroll=self.scan_unroll,
                pos_grid=self.pos_grid,
                fuse_pool=self.fuse_pool,
                quant_int8=self.quant_int8,
            )
        self.text = TextEncoder(
            vocab_size=cfg.vocab_size,
            context_length=cfg.context_length,
            width=cfg.transformer_width,
            heads=cfg.transformer_heads,
            layers=cfg.transformer_layers,
            embed_dim=cfg.embed_dim,
            dtype=self.dtype,
            scan_unroll=self.scan_unroll,
            remat=self.remat,
        )

    def encode_image(self, image: jnp.ndarray, train: bool = False):
        return self.visual(image, train)

    def encode_text(self, text: jnp.ndarray):
        return self.text(text)

    def __call__(self, image, text, train: bool = False):
        return self.encode_image(image, train), self.encode_text(text)

    def contrastive_logits(self, image, text, train: bool = False):
        """Standalone CLIP similarity logits (clip.py:458-474). The dense
        ModifiedResNet returns feature maps; its pooled embedding is the
        attention-pooled map averaged over space."""
        image_features = self.encode_image(image, train)
        if isinstance(image_features, tuple):
            image_features = jnp.mean(image_features[-1], axis=(1, 2))
        _, text_features = self.encode_text(text)

        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        logit_scale = jnp.exp(self.logit_scale)
        logits_per_image = logit_scale * (
            image_features.astype(jnp.float32) @ text_features.astype(jnp.float32).T
        )
        return logits_per_image, logits_per_image.T
