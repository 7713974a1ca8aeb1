"""Numerical parity of cris_tpu.models against the reference torch modules.

Builds small reference modules (torch CPU), converts their weights with
cris_tpu.checkpoint.torch_convert, and compares outputs in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from conftest import add_reference_to_path, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)

if has_reference():
    add_reference_to_path()


def _populate_bn_stats(model, feed_fn, steps=3):
    """Run a few train-mode forwards so BN running stats are non-trivial."""
    model.train()
    with torch.no_grad():
        for _ in range(steps):
            feed_fn(model)
    model.eval()


def _tree_shapes(tree):
    return {
        "/".join(map(str, k)): tuple(v.shape)
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _assert_same_structure(converted, initialized):
    got = _tree_shapes(converted)
    want = _tree_shapes(initialized)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing and not extra, f"missing={missing}\nextra={extra}"
    for k in want:
        assert got[k] == want[k], f"{k}: {got[k]} vs {want[k]}"


@pytest.fixture(scope="module")
def tiny_ref_clip():
    from model.clip import CLIP as RefCLIP

    torch.manual_seed(0)
    model = RefCLIP(
        embed_dim=64,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        vision_patch_size=None,
        context_length=20,
        txt_length=10,
        vocab_size=100,
        # width == decoder d_model, as in the real model (512)
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
    ).float()

    def feed(m):
        m.encode_image(torch.randn(4, 3, 128, 128))

    _populate_bn_stats(model, feed)
    return model


def _tokens(batch=2, length=10, vocab=100, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, vocab - 2, size=(batch, length)).astype(np.int64)
    ids[:, 0] = vocab - 2  # SOT-ish
    ids[0, 6] = vocab - 1  # EOT = max id
    ids[0, 7:] = 0  # padding
    ids[1, 9] = vocab - 1
    return ids


def test_clip_parity(tiny_ref_clip):
    from cris_tpu.checkpoint import convert_clip
    from cris_tpu.models import CLIP

    import dataclasses

    sd = dict(tiny_ref_clip.state_dict())
    variables, cfg = convert_clip(sd)
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.embed_dim == 64
    assert cfg.transformer_width == 64
    # width//64 head inference only holds for real CLIP widths; the tiny
    # test model used 4 heads.
    cfg = dataclasses.replace(cfg, transformer_heads=4)

    model = CLIP(cfg, dtype=None)

    # structure check vs a fresh init
    rng = np.random.RandomState(1)
    img = rng.randn(2, 128, 128, 3).astype(np.float32)
    ids = _tokens()
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(ids))
    _assert_same_structure(variables["params"], init_vars["params"])
    _assert_same_structure(variables["batch_stats"], init_vars["batch_stats"])

    # image encoder parity
    with torch.no_grad():
        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        rx2, rx3, rx4 = tiny_ref_clip.encode_image(t_img)
        rword, rstate = tiny_ref_clip.encode_text(torch.from_numpy(ids))

    (x2, x3, x4), (word, state) = model.apply(
        variables, jnp.asarray(img), jnp.asarray(ids)
    )
    np.testing.assert_allclose(
        np.asarray(x2), rx2.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(x3), rx3.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(x4), rx4.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(word), rword.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state), rstate.numpy(), rtol=1e-4, atol=1e-4
    )


def test_fpn_parity():
    from model.layers import FPN as RefFPN

    from cris_tpu.checkpoint.torch_convert import _TreeBuilder, convert_neck
    from cris_tpu.models import FPN

    torch.manual_seed(1)
    ref = RefFPN(in_channels=[64, 128, 256], out_channels=[32, 64, 128]).float()

    rng = np.random.RandomState(2)
    v3 = rng.randn(2, 16, 16, 64).astype(np.float32)
    v4 = rng.randn(2, 8, 8, 128).astype(np.float32)
    v5 = rng.randn(2, 4, 4, 256).astype(np.float32)
    state = rng.randn(2, 256).astype(np.float32)

    def feed(m):
        m(
            (
                torch.from_numpy(v3).permute(0, 3, 1, 2),
                torch.from_numpy(v4).permute(0, 3, 1, 2),
                torch.from_numpy(v5).permute(0, 3, 1, 2),
            ),
            torch.from_numpy(state),
        )

    _populate_bn_stats(ref, feed)
    with torch.no_grad():
        rout = feed(ref)
        rout = ref(
            (
                torch.from_numpy(v3).permute(0, 3, 1, 2),
                torch.from_numpy(v4).permute(0, 3, 1, 2),
                torch.from_numpy(v5).permute(0, 3, 1, 2),
            ),
            torch.from_numpy(state),
        )

    tb = _TreeBuilder()
    convert_neck(tb, dict(ref.state_dict()), "", ())
    variables = {"params": tb.params, "batch_stats": tb.stats}

    model = FPN((64, 128, 256), (32, 64, 128), dtype=None)
    out = model.apply(
        variables, (jnp.asarray(v3), jnp.asarray(v4), jnp.asarray(v5)),
        jnp.asarray(state),
    )
    np.testing.assert_allclose(
        np.asarray(out), rout.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_decoder_parity():
    from model.layers import TransformerDecoder as RefDecoder

    from cris_tpu.checkpoint.stacking import stack_scanned
    from cris_tpu.checkpoint.torch_convert import _TreeBuilder, convert_decoder
    from cris_tpu.models import TransformerDecoder

    torch.manual_seed(2)
    ref = RefDecoder(
        num_layers=2, d_model=64, nhead=4, dim_ffn=128, dropout=0.0,
        return_intermediate=False,
    ).float().eval()

    rng = np.random.RandomState(3)
    vis = rng.randn(2, 4, 4, 64).astype(np.float32)
    txt = rng.randn(2, 5, 64).astype(np.float32)
    pad = np.zeros((2, 5), bool)
    pad[0, 3:] = True

    with torch.no_grad():
        rout = ref(
            torch.from_numpy(vis).permute(0, 3, 1, 2),
            torch.from_numpy(txt),
            torch.from_numpy(pad),
        )  # (B, C, HW)

    tb = _TreeBuilder()
    convert_decoder(tb, dict(ref.state_dict()), "", (), num_layers=2)
    # sub-converters emit per-layer entries; the model executes the stack
    # as one nn.scan over a stacked 'layers' subtree
    variables = {"params": stack_scanned(tb.params)}

    model = TransformerDecoder(
        num_layers=2, d_model=64, nhead=4, dim_ffn=128, dropout=0.0, dtype=None
    )
    out = model.apply(
        variables, jnp.asarray(vis), jnp.asarray(txt), jnp.asarray(pad)
    )  # (B, H, W, C)
    out_flat = np.asarray(out).reshape(2, 16, 64).transpose(0, 2, 1)
    np.testing.assert_allclose(out_flat, rout.numpy(), rtol=1e-4, atol=1e-4)


def test_projector_parity():
    from model.layers import Projector as RefProjector

    from cris_tpu.checkpoint.torch_convert import _TreeBuilder, convert_projector
    from cris_tpu.models import Projector

    torch.manual_seed(3)
    ref = RefProjector(word_dim=96, in_dim=32, kernel_size=3).float()

    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 64).astype(np.float32)
    word = rng.randn(2, 96).astype(np.float32)

    def feed(m):
        m(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(word))

    _populate_bn_stats(ref, feed)
    with torch.no_grad():
        rout = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(word)
        )  # (B, 1, 32, 32)

    tb = _TreeBuilder()
    convert_projector(tb, dict(ref.state_dict()), "", ())
    variables = {"params": tb.params, "batch_stats": tb.stats}

    model = Projector(word_dim=96, in_dim=32, kernel_size=3, dtype=None)
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(word))
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], rout.squeeze(1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_full_cris_parity(tiny_ref_clip):
    """Chains the reference modules exactly as reference CRIS.forward does
    (/root/reference/model/segmenter.py:29-62) and compares with our CRIS."""
    import torch.nn.functional as F
    from model.layers import FPN as RefFPN
    from model.layers import Projector as RefProjector
    from model.layers import TransformerDecoder as RefDecoder

    from cris_tpu.checkpoint import convert_cris_state_dict
    from cris_tpu.models import CRIS

    torch.manual_seed(4)
    # dims consistent with tiny_ref_clip: v3=128ch, v4=256ch, v5(embed)=64ch
    ref_neck = RefFPN(in_channels=[128, 256, 64], out_channels=[32, 64, 128]).float()
    ref_dec = RefDecoder(
        num_layers=2, d_model=64, nhead=4, dim_ffn=128, dropout=0.0,
        return_intermediate=False,
    ).float()
    ref_proj = RefProjector(word_dim=64, in_dim=32, kernel_size=3).float()

    rng = np.random.RandomState(5)
    img = rng.randn(2, 128, 128, 3).astype(np.float32)
    ids = _tokens()
    mask = (rng.rand(2, 128, 128, 1) > 0.5).astype(np.float32)

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_ids = torch.from_numpy(ids)
    t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2)

    def ref_forward(train):
        pad_mask = t_ids == 0
        x2, x3, x4 = tiny_ref_clip.encode_image(t_img)
        word, state = tiny_ref_clip.encode_text(t_ids)
        fq = ref_neck((x2, x3, x4), state)
        b, c, h, w = fq.size()
        fq = ref_dec(fq, word, pad_mask)
        fq = fq.reshape(b, c, h, w)
        pred = ref_proj(fq, state)
        if train:
            tgt = F.interpolate(t_mask, pred.shape[-2:], mode="nearest")
            loss = F.binary_cross_entropy_with_logits(pred, tgt)
            return pred, tgt, loss
        return pred

    # populate BN stats of neck/proj through full-chain train steps
    tiny_ref_clip.eval()
    for m in (ref_neck, ref_proj):
        m.train()
    with torch.no_grad():
        for _ in range(3):
            ref_forward(False)
    for m in (ref_neck, ref_dec, ref_proj):
        m.eval()
    with torch.no_grad():
        rpred, rtgt, rloss = ref_forward(True)

    # assemble a reference-format CRIS state_dict (as torch.save would emit)
    sd = {}
    for prefix, module in (
        ("backbone", tiny_ref_clip),
        ("neck", ref_neck),
        ("decoder", ref_dec),
        ("proj", ref_proj),
    ):
        for k, v in module.state_dict().items():
            sd[f"module.{prefix}.{k}"] = v

    import dataclasses

    variables, clip_cfg = convert_cris_state_dict(sd, num_decoder_layers=2)
    clip_cfg = dataclasses.replace(clip_cfg, transformer_heads=4)
    model = CRIS(
        clip_config=clip_cfg,
        fpn_in=(128, 256, 64),
        fpn_out=(32, 64, 128),
        vis_dim=64,
        num_layers=2,
        num_head=4,
        dim_ffn=128,
        dropout=0.0,
        dtype=None,
    )
    pred, tgt, loss = model.apply(
        variables, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(pred)[..., 0], rpred.squeeze(1).numpy(), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(tgt)[..., 0], rtgt.squeeze(1).numpy()
    )
    np.testing.assert_allclose(float(loss), float(rloss), rtol=1e-5, atol=1e-6)
