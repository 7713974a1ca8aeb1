"""End-to-end training parity vs the reference stack.

Builds the reference module chain (tiny CLIP + FPN + decoder + projector,
dropout 0), replicates the reference's optimizer setup (torch Adam with
backbone/head LR groups, model/__init__.py:32-49 + train.py:105-107), runs
3 optimization steps on identical data in both frameworks, and compares the
loss trajectories and final predictions. This exercises: forward parity in
train mode (batch-stat BN), BCE loss, gradients, Adam semantics, LR groups,
and BN running-stat updates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from conftest import add_reference_to_path, has_reference, tiny_train_cfg

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)

if has_reference():
    add_reference_to_path()


def test_three_step_training_parity():
    import dataclasses

    from model.clip import CLIP as RefCLIP
    from model.layers import FPN as RefFPN
    from model.layers import Projector as RefProjector
    from model.layers import TransformerDecoder as RefDecoder

    from cris_tpu.checkpoint import convert_cris_state_dict
    from cris_tpu.engine import create_train_state, make_optimizer, train_step
    from cris_tpu.models import CRIS
    from cris_tpu.utils import CfgNode

    torch.manual_seed(0)
    ref_clip = RefCLIP(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=20,
        txt_length=10, vocab_size=100, transformer_width=64,
        transformer_heads=4, transformer_layers=2,
    ).float()
    ref_neck = RefFPN(in_channels=[128, 256, 64], out_channels=[32, 64, 128]).float()
    ref_dec = RefDecoder(
        num_layers=2, d_model=64, nhead=4, dim_ffn=128, dropout=0.0,
        return_intermediate=False,
    ).float()
    ref_proj = RefProjector(word_dim=64, in_dim=32, kernel_size=3).float()

    modules = {"backbone": ref_clip, "neck": ref_neck,
               "decoder": ref_dec, "proj": ref_proj}

    # convert the initial state BEFORE any torch steps
    sd = {}
    for prefix, module in modules.items():
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v.clone()
    variables, clip_cfg = convert_cris_state_dict(sd, num_decoder_layers=2)
    clip_cfg = dataclasses.replace(clip_cfg, transformer_heads=4)

    # fixed data: 3 batches
    rng = np.random.RandomState(7)
    batches = []
    for _ in range(3):
        batches.append(
            {
                "image": rng.randn(2, 128, 128, 3).astype(np.float32),
                "word": np.concatenate(
                    [
                        np.full((2, 1), 98, np.int64),
                        rng.randint(1, 97, (2, 8)),
                        np.full((2, 1), 99, np.int64),
                    ],
                    axis=1,
                ),
                "mask": (rng.rand(2, 128, 128, 1) > 0.5).astype(np.float32),
            }
        )

    # ---- torch side: reference param groups + Adam (base_lr from cfg)
    cfg = tiny_train_cfg(base_lr=1e-3, lr_multi=0.1, milestones=[100])
    backbone_params, head_params = [], []
    for k, v in ref_clip.named_parameters():
        # reference split is on the CRIS-level name 'backbone.*'
        if "positional_embedding" not in k:
            backbone_params.append(v)
        else:
            head_params.append(v)
    for m in (ref_neck, ref_dec, ref_proj):
        head_params.extend(m.parameters())
    opt = torch.optim.Adam(
        [
            {"params": backbone_params, "lr": cfg.base_lr * cfg.lr_multi},
            {"params": head_params, "lr": cfg.base_lr},
        ],
        lr=cfg.base_lr, weight_decay=0.0,
    )

    def ref_forward(batch):
        img = torch.from_numpy(batch["image"]).permute(0, 3, 1, 2)
        ids = torch.from_numpy(batch["word"])
        msk = torch.from_numpy(batch["mask"]).permute(0, 3, 1, 2)
        pad_mask = ids == 0
        x2, x3, x4 = ref_clip.encode_image(img)
        word, state = ref_clip.encode_text(ids)
        fq = ref_neck((x2, x3, x4), state)
        b, c, h, w = fq.size()
        fq = ref_dec(fq, word, pad_mask).reshape(b, c, h, w)
        pred = ref_proj(fq, state)
        tgt = F.interpolate(msk, pred.shape[-2:], mode="nearest")
        return pred, F.binary_cross_entropy_with_logits(pred, tgt)

    for m in modules.values():
        m.train()
    torch_losses = []
    for batch in batches:
        opt.zero_grad()
        pred, loss = ref_forward(batch)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # ---- jax side
    model = CRIS(
        clip_config=clip_cfg, fpn_in=(128, 256, 64), fpn_out=(32, 64, 128),
        vis_dim=64, num_layers=2, num_head=4, dim_ffn=128, dropout=0.0,
        dtype=None,
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, variables, tx)
    step = jax.jit(train_step)
    jax_losses = []
    for batch in batches:
        state, metrics = step(
            state,
            {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(0),
        )
        jax_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)

    # final eval-mode predictions also agree (BN running stats updated the
    # same way through 3 train steps)
    for m in modules.values():
        m.eval()
    with torch.no_grad():
        img = torch.from_numpy(batches[0]["image"]).permute(0, 3, 1, 2)
        ids = torch.from_numpy(batches[0]["word"])
        pad_mask = ids == 0
        x2, x3, x4 = ref_clip.encode_image(img)
        word, st = ref_clip.encode_text(ids)
        fq = ref_neck((x2, x3, x4), st)
        b, c, h, w = fq.size()
        fq = ref_dec(fq, word, pad_mask).reshape(b, c, h, w)
        ref_pred = ref_proj(fq, st)

    jax_pred = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batches[0]["image"]),
        jnp.asarray(batches[0]["word"]),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(jax_pred)[..., 0],
        ref_pred.squeeze(1).numpy(),
        rtol=1e-2, atol=2e-3,
    )
