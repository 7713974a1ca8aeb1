"""One-way PyTorch -> JAX weight converters.

Covers both released-weight formats the reference consumes:
- OpenAI CLIP TorchScript archives (RN50.pt / RN101.pt), loaded by the
  reference at /root/reference/model/segmenter.py:14-16 with architecture
  hyperparameters inferred from tensor shapes
  (/root/reference/model/clip.py:503-554) -- the same inference lives in
  ``infer_clip_config``;
- trained CRIS checkpoints (.pth dicts with a DDP 'module.'-prefixed
  state_dict, /root/reference/train.py:192-207).

Layout transforms:
  torch Conv2d weight (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  torch Linear weight (O, I)          -> flax kernel (I, O)
  packed MultiheadAttention in_proj   -> q/k/v Dense kernels (row thirds)
  BatchNorm running_mean/var          -> batch_stats {mean, var}

Outputs are {'params': ..., 'batch_stats': ...} variable pytrees matching
cris_tpu.models module structure. 'num_batches_tracked' is dropped (our
BatchNorm uses constant momentum, as the reference's does in practice).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from ..models.clip import CLIPConfig
from .stacking import stack_scanned


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    x = np.asarray(x)
    if x.dtype == np.float16:
        x = x.astype(np.float32)
    return x


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _dense(w) -> np.ndarray:
    return _np(w).T


def infer_clip_config(sd: Mapping[str, Any]) -> CLIPConfig:
    """Shape-based architecture inference, mirroring clip.py:503-554."""
    if "visual.proj" in sd:
        vision_width = _np(sd["visual.conv1.weight"]).shape[0]
        vision_layers = len(
            [
                k
                for k in sd
                if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")
            ]
        )
        vision_patch_size = _np(sd["visual.conv1.weight"]).shape[-1]
        grid = round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [
            len(
                {
                    k.split(".")[2]
                    for k in sd
                    if k.startswith(f"visual.layer{b}")
                }
            )
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = _np(sd["visual.layer1.0.conv1.weight"]).shape[0]
        output_width = round(
            (_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5
        )
        vision_patch_size = None
        image_resolution = output_width * 32

    embed_dim = _np(sd["text_projection"]).shape[1]
    context_length = _np(sd["positional_embedding"]).shape[0]
    vocab_size = _np(sd["token_embedding.weight"]).shape[0]
    transformer_width = _np(sd["ln_final.weight"]).shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def _put(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def param(self, path, value):
        self._put(self.params, path, _np(value))

    def stat(self, path, value):
        self._put(self.stats, path, _np(value))

    def bn(self, path, torch_sd, torch_prefix):
        """BatchNorm: weight/bias -> params scale/bias; running stats."""
        self.param(path + ("scale",), torch_sd[torch_prefix + ".weight"])
        self.param(path + ("bias",), torch_sd[torch_prefix + ".bias"])
        self.stat(path + ("mean",), torch_sd[torch_prefix + ".running_mean"])
        self.stat(path + ("var",), torch_sd[torch_prefix + ".running_var"])

    def ln(self, path, torch_sd, torch_prefix):
        self.param(path + ("scale",), torch_sd[torch_prefix + ".weight"])
        self.param(path + ("bias",), torch_sd[torch_prefix + ".bias"])

    def conv(self, path, torch_sd, torch_prefix, bias=False):
        self.param(path + ("kernel",), _conv(torch_sd[torch_prefix + ".weight"]))
        if bias:
            self.param(path + ("bias",), torch_sd[torch_prefix + ".bias"])

    def dense(self, path, torch_sd, torch_prefix, bias=True):
        self.param(path + ("kernel",), _dense(torch_sd[torch_prefix + ".weight"]))
        if bias and torch_prefix + ".bias" in torch_sd:
            self.param(path + ("bias",), torch_sd[torch_prefix + ".bias"])

    def packed_attn(self, path, torch_sd, torch_prefix):
        """torch packed in_proj -> single packed Dense (CLIP text blocks)."""
        self.param(
            path + ("attn_in_proj", "kernel"),
            _dense(torch_sd[torch_prefix + ".attn.in_proj_weight"]),
        )
        self.param(
            path + ("attn_in_proj", "bias"),
            torch_sd[torch_prefix + ".attn.in_proj_bias"],
        )
        self.dense(path + ("attn_out_proj",), torch_sd, torch_prefix + ".attn.out_proj")

    def split_attn(self, path, torch_sd, torch_prefix):
        """torch packed in_proj -> separate q/k/v Dense (decoder blocks)."""
        w = _np(torch_sd[torch_prefix + ".in_proj_weight"])
        b = _np(torch_sd[torch_prefix + ".in_proj_bias"])
        e = w.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self.param(path + (name, "kernel"), w[i * e : (i + 1) * e].T)
            self.param(path + (name, "bias"), b[i * e : (i + 1) * e])
        self.dense(path + ("out_proj",), torch_sd, torch_prefix + ".out_proj")


def _convert_resnet_visual(tb: _TreeBuilder, sd, src: str, dst: Tuple[str, ...],
                           vision_layers):
    for i in (1, 2, 3):
        tb.conv(dst + (f"conv{i}",), sd, f"{src}.conv{i}")
        tb.bn(dst + (f"bn{i}",), sd, f"{src}.bn{i}")
    for stage, blocks in enumerate(vision_layers, start=1):
        for j in range(blocks):
            bsrc = f"{src}.layer{stage}.{j}"
            bdst = dst + (f"layer{stage}_{j}",)
            for i in (1, 2, 3):
                tb.conv(bdst + (f"conv{i}",), sd, f"{bsrc}.conv{i}")
                tb.bn(bdst + (f"bn{i}",), sd, f"{bsrc}.bn{i}")
            if f"{bsrc}.downsample.0.weight" in sd:
                tb.conv(bdst + ("downsample_conv",), sd, f"{bsrc}.downsample.0")
                tb.bn(bdst + ("downsample_bn",), sd, f"{bsrc}.downsample.1")
    ap_src, ap_dst = f"{src}.attnpool", dst + ("attnpool",)
    tb.param(ap_dst + ("positional_embedding",), sd[f"{ap_src}.positional_embedding"])
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        tb.dense(ap_dst + (name,), sd, f"{ap_src}.{name}")
    tb.conv(ap_dst + ("connect_conv",), sd, f"{ap_src}.connect.0")
    tb.bn(ap_dst + ("connect_bn",), sd, f"{ap_src}.connect.1")


def _convert_vit_visual(tb: _TreeBuilder, sd, src: str, dst: Tuple[str, ...],
                        layers: int):
    tb.param(dst + ("class_embedding",), sd[f"{src}.class_embedding"])
    tb.param(dst + ("positional_embedding",), sd[f"{src}.positional_embedding"])
    tb.param(dst + ("proj",), sd[f"{src}.proj"])
    tb.conv(dst + ("conv1",), sd, f"{src}.conv1")
    tb.ln(dst + ("ln_pre",), sd, f"{src}.ln_pre")
    tb.ln(dst + ("ln_post",), sd, f"{src}.ln_post")
    for i in range(layers):
        bsrc = f"{src}.transformer.resblocks.{i}"
        bdst = dst + ("transformer", f"resblocks_{i}")
        tb.packed_attn(bdst, sd, bsrc)
        tb.ln(bdst + ("ln_1",), sd, f"{bsrc}.ln_1")
        tb.ln(bdst + ("ln_2",), sd, f"{bsrc}.ln_2")
        tb.dense(bdst + ("mlp_c_fc",), sd, f"{bsrc}.mlp.c_fc")
        tb.dense(bdst + ("mlp_c_proj",), sd, f"{bsrc}.mlp.c_proj")


def _convert_text(tb: _TreeBuilder, sd, src_prefix: str, dst: Tuple[str, ...],
                  layers: int):
    p = lambda k: (src_prefix + k) if src_prefix else k
    tb.param(dst + ("token_embedding",), sd[p("token_embedding.weight")])
    tb.param(dst + ("positional_embedding",), sd[p("positional_embedding")])
    tb.param(dst + ("text_projection",), sd[p("text_projection")])
    tb.ln(dst + ("ln_final",), sd, p("ln_final"))
    for i in range(layers):
        bsrc = p(f"transformer.resblocks.{i}")
        bdst = dst + ("transformer", f"resblocks_{i}")
        tb.packed_attn(bdst, sd, bsrc)
        tb.ln(bdst + ("ln_1",), sd, f"{bsrc}.ln_1")
        tb.ln(bdst + ("ln_2",), sd, f"{bsrc}.ln_2")
        tb.dense(bdst + ("mlp_c_fc",), sd, f"{bsrc}.mlp.c_fc")
        tb.dense(bdst + ("mlp_c_proj",), sd, f"{bsrc}.mlp.c_proj")


def convert_clip(sd: Mapping[str, Any], dst_prefix: Tuple[str, ...] = ()):
    """CLIP state_dict -> (variables, CLIPConfig). dst_prefix lets the same
    mapping serve standalone CLIP (()) and CRIS ('backbone',)."""
    cfg = infer_clip_config(sd)
    tb = _TreeBuilder()
    if cfg.is_vit:
        _convert_vit_visual(tb, sd, "visual", dst_prefix + ("visual",), _vit_layers(sd))
    else:
        _convert_resnet_visual(
            tb, sd, "visual", dst_prefix + ("visual",), cfg.vision_layers
        )
    _convert_text(tb, sd, "", dst_prefix + ("text",), cfg.transformer_layers)
    if "logit_scale" in sd:
        tb.param(dst_prefix + ("logit_scale",), sd["logit_scale"])
    return {
        "params": stack_scanned(tb.params),
        "batch_stats": stack_scanned(tb.stats),
    }, cfg


def _vit_layers(sd) -> int:
    # 'visual.transformer.resblocks.<i>.xxx' -> block index is component 3
    return len(
        {
            k.split(".")[3]
            for k in sd
            if k.startswith("visual.transformer.resblocks")
        }
    )



def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name

def _conv_bn_block(tb, sd, src: str, dst: Tuple[str, ...]):
    """conv_layer Sequential: .0 conv(bias=False), .1 BN -> ConvBNReLU."""
    tb.conv(dst + ("conv",), sd, _j(src, "0"))
    tb.bn(dst + ("bn",), sd, _j(src, "1"))


def convert_neck(tb: _TreeBuilder, sd, src: str, dst: Tuple[str, ...]):
    tb.dense(dst + ("txt_proj", "linear"), sd, _j(src, "txt_proj.0"), bias=False)
    tb.bn(dst + ("txt_proj", "bn"), sd, _j(src, "txt_proj.1"))
    _conv_bn_block(tb, sd, _j(src, "f1_v_proj"), dst + ("f1_v_proj",))
    tb.bn(dst + ("norm_layer",), sd, _j(src, "norm_layer.0"))
    for name in ("f2_v_proj", "f2_cat", "f3_v_proj", "f3_cat",
                 "f4_proj5", "f4_proj4", "f4_proj3", "aggr"):
        _conv_bn_block(tb, sd, _j(src, name), dst + (name,))
    _conv_bn_block(tb, sd, _j(src, "coordconv.0.conv1"), dst + ("coordconv_0", "conv1"))
    _conv_bn_block(tb, sd, _j(src, "coordconv.1"), dst + ("coordconv_1",))


def convert_decoder(tb: _TreeBuilder, sd, src: str, dst: Tuple[str, ...],
                    num_layers: int):
    for i in range(num_layers):
        lsrc = _j(src, f"layers.{i}")
        ldst = dst + (f"layers_{i}",)
        tb.split_attn(ldst + ("self_attn",), sd, f"{lsrc}.self_attn")
        tb.split_attn(ldst + ("multihead_attn",), sd, f"{lsrc}.multihead_attn")
        for name in ("norm1", "norm2", "norm3", "self_attn_norm", "cross_attn_norm"):
            tb.ln(ldst + (name,), sd, f"{lsrc}.{name}")
        tb.dense(ldst + ("ffn_fc1",), sd, f"{lsrc}.ffn.0")
        tb.ln(ldst + ("ffn_norm",), sd, f"{lsrc}.ffn.3")
        tb.dense(ldst + ("ffn_fc2",), sd, f"{lsrc}.ffn.4")
    tb.ln(dst + ("norm",), sd, _j(src, "norm"))


def convert_projector(tb: _TreeBuilder, sd, src: str, dst: Tuple[str, ...]):
    _conv_bn_block(tb, sd, _j(src, "vis.1"), dst + ("vis_conv1",))
    _conv_bn_block(tb, sd, _j(src, "vis.3"), dst + ("vis_conv2",))
    tb.conv(dst + ("vis_out",), sd, _j(src, "vis.4"), bias=True)
    tb.dense(dst + ("txt",), sd, _j(src, "txt"))


def convert_cris_state_dict(sd: Mapping[str, Any], num_decoder_layers: int = 3):
    """Full trained-CRIS state_dict (optionally 'module.'-prefixed) ->
    variables pytree + CLIPConfig."""
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    clip_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    variables, cfg = convert_clip(clip_sd, dst_prefix=("backbone",))
    tb = _TreeBuilder()
    tb.params = variables["params"]
    tb.stats = variables["batch_stats"]
    convert_neck(tb, sd, "neck", ("neck",))
    convert_decoder(tb, sd, "decoder", ("decoder",), num_decoder_layers)
    convert_projector(tb, sd, "proj", ("proj",))
    return {
        "params": stack_scanned(tb.params),
        "batch_stats": stack_scanned(tb.stats),
    }, cfg


def load_clip_torchscript(path: str):
    """Load an OpenAI CLIP TorchScript archive and convert
    (reference load at /root/reference/model/segmenter.py:14-16)."""
    import torch

    model = torch.jit.load(path, map_location="cpu").eval()
    sd = dict(model.state_dict())
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    return convert_clip(sd)


def load_cris_checkpoint(path: str, num_decoder_layers: int = 3):
    """Load a trained CRIS .pth checkpoint (train.py:192-207 format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_cris_state_dict(sd, num_decoder_layers)
