"""E2E released-checkpoint workflow: reference-format CRIS .pth ->
tools/convert_weights.py -> orbax dir -> restore + forward."""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from conftest import add_reference_to_path, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)

if has_reference():
    add_reference_to_path()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_cris_pth_to_orbax(tmp_path):
    import dataclasses

    from model.clip import CLIP as RefCLIP
    from model.layers import FPN as RefFPN
    from model.layers import Projector as RefProjector
    from model.layers import TransformerDecoder as RefDecoder

    import jax
    import jax.numpy as jnp

    from cris_tpu.checkpoint import restore_model
    from cris_tpu.models import CLIPConfig, CRIS

    torch.manual_seed(9)
    ref_clip = RefCLIP(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=77,
        txt_length=17, vocab_size=49408, transformer_width=64,
        transformer_heads=4, transformer_layers=2,
    ).float()
    ref_neck = RefFPN(in_channels=[128, 256, 64], out_channels=[32, 64, 128]).float()
    ref_dec = RefDecoder(num_layers=2, d_model=64, nhead=4, dim_ffn=128,
                         dropout=0.0).float()
    ref_proj = RefProjector(word_dim=64, in_dim=32, kernel_size=3).float()

    sd = {}
    for prefix, module in (("backbone", ref_clip), ("neck", ref_neck),
                           ("decoder", ref_dec), ("proj", ref_proj)):
        for k, v in module.state_dict().items():
            sd[f"module.{prefix}.{k}"] = v
    pth = str(tmp_path / "best_model.pth")
    torch.save({"state_dict": sd, "epoch": 50}, pth)

    out = str(tmp_path / "best_model")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_weights.py"),
         "--config", os.path.join(REPO, "config", "synthetic", "cris_tiny.yaml"),
         "--torch", pth, "--out", out],
        capture_output=True, text=True,
        env=dict(os.environ, CRIS_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr
    assert os.path.isdir(os.path.join(out, "model"))

    # restore into a live model and run a forward
    model = CRIS(
        clip_config=CLIPConfig(
            embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
            vision_width=16, vision_patch_size=None, context_length=77,
            vocab_size=49408, transformer_width=64, transformer_heads=4,
            transformer_layers=2,
        ),
        fpn_in=(128, 256, 64), fpn_out=(32, 64, 128), vis_dim=64,
        num_layers=2, num_head=4, dim_ffn=128, dropout=0.0, dtype=None,
    )
    img = jnp.zeros((1, 64, 64, 3))
    word = jnp.ones((1, 17), jnp.int32)
    init_vars = model.init(jax.random.PRNGKey(0), img, word)
    variables = restore_model(
        out, {"params": init_vars["params"], "batch_stats": init_vars["batch_stats"]}
    )
    pred = model.apply(variables, img, word)
    assert pred.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(pred)).all()

    # restored leaves equal the torch originals (spot check)
    conv1 = np.asarray(variables["params"]["backbone"]["visual"]["conv1"]["kernel"])
    ref_conv1 = ref_clip.visual.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(conv1, ref_conv1)


def test_load_clip_torchscript_archive(tmp_path):
    """End-to-end TorchScript path: trace a reference CLIP, save a .pt
    archive (the released RN50.pt format), load + convert + forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from model.clip import CLIP as RefCLIP

    from cris_tpu.checkpoint import load_clip_torchscript
    from cris_tpu.models import CLIP

    torch.manual_seed(11)
    ref = RefCLIP(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=20,
        txt_length=10, vocab_size=100, transformer_width=64,
        transformer_heads=4, transformer_layers=2,
    ).float().eval()

    class Traceable(torch.nn.Module):
        """Same attribute layout as CLIP (so the TorchScript state_dict has
        the released-archive key names) with a traceable forward."""

        def __init__(self, clip):
            super().__init__()
            self.visual = clip.visual
            self.transformer = clip.transformer
            self.token_embedding = clip.token_embedding
            self.positional_embedding = clip.positional_embedding
            self.ln_final = clip.ln_final
            self.text_projection = clip.text_projection
            self.logit_scale = clip.logit_scale

        def forward(self, image):
            return self.visual(image)[2]

    img = torch.randn(1, 3, 64, 64)
    traced = torch.jit.trace(
        Traceable(ref), (img,), check_trace=False, strict=False
    )
    path = str(tmp_path / "RN_tiny.pt")
    torch.jit.save(traced, path)

    variables, cfg = load_clip_torchscript(path)
    assert cfg.vision_layers == (1, 1, 1, 1)
    cfg = dataclasses.replace(cfg, transformer_heads=4)

    model = CLIP(cfg, dtype=None)
    rng = np.random.RandomState(3)
    jimg = rng.randn(2, 64, 64, 3).astype(np.float32)
    jids = rng.randint(1, 99, (2, 10)).astype(np.int32)
    with torch.no_grad():
        r2, r3, r4 = ref.encode_image(
            torch.from_numpy(jimg).permute(0, 3, 1, 2)
        )
    (x2, x3, x4), _ = model.apply(
        variables, jnp.asarray(jimg), jnp.asarray(jids)
    )
    np.testing.assert_allclose(
        np.asarray(x4), r4.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
