"""Numerical parity of cris_tpu.ops against torch reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cris_tpu.ops import (
    avg_pool2d,
    causal_mask,
    dot_product_attention,
    dynamic_conv2d,
    resize2d,
    sincos_1d,
    sincos_2d,
    upsample2x,
)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize(
    "in_hw,out_hw,method,align",
    [
        ((13, 13), (26, 26), "bilinear", False),   # FPN f5 upsample
        ((26, 26), (52, 52), "bilinear", False),   # Projector upsample 1
        ((52, 52), (104, 104), "bilinear", False), # Projector upsample 2
        ((104, 104), (416, 416), "bicubic", True), # eval upsample
        ((7, 7), (13, 13), "bicubic", False),      # attnpool pos-embed resize
        ((20, 30), (17, 11), "bilinear", False),   # downsample, non-square
        ((9, 9), (5, 5), "bicubic", True),
        ((26, 26), (104, 104), "nearest", False),  # not used but supported
    ],
)
def test_resize2d_matches_torch(in_hw, out_hw, method, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, in_hw[0], in_hw[1], 3).astype(np.float32)
    kwargs = {} if method == "nearest" else {"align_corners": align}
    ref = to_nhwc(
        F.interpolate(nchw(x), size=out_hw, mode=method, **kwargs)
    )
    got = np.asarray(resize2d(jnp.asarray(x), out_hw, method, align))
    # separable-matrix formulation accumulates taps in a different order
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-5)


def test_upsample2x_matches_torch_upsample_module():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 26, 26, 8).astype(np.float32)
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear")
    ref = to_nhwc(up(nchw(x)))
    got = np.asarray(upsample2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mask_downsample_nearest_matches_torch():
    # segmenter.py:56-58 downsamples the GT mask with mode='nearest'.
    rng = np.random.RandomState(2)
    m = (rng.rand(2, 416, 416, 1) > 0.5).astype(np.float32)
    ref = to_nhwc(F.interpolate(nchw(m), size=(104, 104), mode="nearest"))
    got = np.asarray(resize2d(jnp.asarray(m), (104, 104), "nearest"))
    np.testing.assert_array_equal(got, ref)


def test_avg_pool2d_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 52, 52, 16).astype(np.float32)
    ref = to_nhwc(F.avg_pool2d(nchw(x), 2, 2))
    got = np.asarray(avg_pool2d(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_attention_matches_torch_mha():
    torch.manual_seed(0)
    B, S, E, H = 2, 10, 32, 4
    mha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = torch.randn(B, S, E)
    key_pad = torch.zeros(B, S, dtype=torch.bool)
    key_pad[0, 7:] = True
    with torch.no_grad():
        ref, _ = mha(x, x, x, key_padding_mask=key_pad, need_weights=False)
        # replicate the packed in-projection on the jax side
        qkv = F.linear(x, mha.in_proj_weight, mha.in_proj_bias)
        q, k, v = qkv.chunk(3, dim=-1)
    out = dot_product_attention(
        jnp.asarray(q.numpy()),
        jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
        num_heads=H,
        key_padding_mask=jnp.asarray(key_pad.numpy()),
    )
    out = out @ jnp.asarray(mha.out_proj.weight.detach().numpy()).T + jnp.asarray(
        mha.out_proj.bias.detach().numpy()
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_attention_causal_matches_torch():
    torch.manual_seed(1)
    B, S, E, H = 2, 17, 64, 8
    mha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = torch.randn(B, S, E)
    tmask = torch.triu(torch.full((S, S), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref, _ = mha(x, x, x, attn_mask=tmask, need_weights=False)
        qkv = F.linear(x, mha.in_proj_weight, mha.in_proj_bias)
        q, k, v = qkv.chunk(3, dim=-1)
    out = dot_product_attention(
        jnp.asarray(q.numpy()),
        jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
        num_heads=H,
        attn_mask=causal_mask(S),
    )
    out = out @ jnp.asarray(mha.out_proj.weight.detach().numpy()).T + jnp.asarray(
        mha.out_proj.bias.detach().numpy()
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_dynamic_conv_matches_grouped_conv():
    # Reference formulation: F.conv2d(x.reshape(1, B*C, H, W), w, groups=B)
    # (/root/reference/model/layers.py:71-82).
    rng = np.random.RandomState(4)
    B, H, W, C, K = 3, 16, 16, 8, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    w = rng.randn(B, C, K, K).astype(np.float32)
    bias = rng.randn(B).astype(np.float32)
    xt = nchw(x).reshape(1, B * C, H, W)
    ref = F.conv2d(
        xt, torch.from_numpy(w), bias=torch.from_numpy(bias), padding=K // 2, groups=B
    ).transpose(0, 1)  # (B, 1, H, W)
    got = np.asarray(
        dynamic_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), K)
    )
    np.testing.assert_allclose(
        got[..., 0], ref.squeeze(1).numpy(), rtol=1e-4, atol=1e-4
    )


def _ref_pos1d(d_model, length):
    import math

    pe = torch.zeros(length, d_model)
    position = torch.arange(0, length).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float)
        * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = torch.sin(position.float() * div_term)
    pe[:, 1::2] = torch.cos(position.float() * div_term)
    return pe


def test_sincos_1d_matches_reference_layout():
    ref = _ref_pos1d(512, 22).numpy()
    np.testing.assert_allclose(sincos_1d(512, 22), ref, rtol=1e-5, atol=1e-6)


def _ref_pos2d(d_model, height, width):
    import math

    pe = torch.zeros(d_model, height, width)
    d_half = int(d_model / 2)
    div_term = torch.exp(
        torch.arange(0.0, d_half, 2) * -(math.log(10000.0) / d_half)
    )
    pos_w = torch.arange(0.0, width).unsqueeze(1)
    pos_h = torch.arange(0.0, height).unsqueeze(1)
    pe[0:d_half:2, :, :] = (
        torch.sin(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    )
    pe[1:d_half:2, :, :] = (
        torch.cos(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    )
    pe[d_half::2, :, :] = (
        torch.sin(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    )
    pe[d_half + 1 :: 2, :, :] = (
        torch.cos(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    )
    return pe.reshape(d_model, height * width).T  # (HW, C)


def test_sincos_2d_matches_reference_layout():
    ref = _ref_pos2d(512, 26, 26).numpy()
    np.testing.assert_allclose(sincos_2d(512, 26, 26), ref, rtol=1e-5, atol=1e-6)


def test_upsample2x_conv3x3_matches_chain():
    """Fused lhs_dilated conv == upsample2x + conv3x3 (exact, incl. the
    clamped-edge ring and bias), odd/rect shapes included."""
    from cris_tpu.ops.resize import upsample2x
    from cris_tpu.ops.upsample_conv import upsample2x_conv3x3

    dn = ("NHWC", "HWIO", "NHWC")
    r = np.random.RandomState(2)
    for (h, w, ci, co) in [(10, 10, 8, 6), (7, 9, 4, 4), (5, 5, 3, 7)]:
        x = jnp.asarray(r.randn(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(r.randn(3, 3, ci, co).astype(np.float32) * 0.2)
        b = jnp.asarray(r.randn(co).astype(np.float32))
        u = upsample2x(x)
        ref = jax.lax.conv_general_dilated(
            u, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + b
        got = upsample2x_conv3x3(x, k, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_phase_decomposition_matches_ld2_cores():
    """interleave2x2 of the four non-dilated phase convs == the
    lhs_dilated fold cores EXACTLY, borders included (the dilated core's
    implicit zero extension is linear in in-range x, which the phase
    convs' zero padding reproduces) -- the int8 serving form of the
    upsample-fold sites (the ld2 conv itself runs at bf16 rate under
    int8; round-5 negative)."""
    from cris_tpu.ops.upsample_conv import (
        PHASE_PADS4, PHASE_PADS6, fold_kernel4, fold_kernel6, interleave2x2,
        phase_kernels4, phase_kernels6,
    )

    dn = ("NHWC", "HWIO", "NHWC")
    r = np.random.RandomState(4)
    for (h, w, ci, co) in [(10, 10, 8, 6), (7, 9, 4, 4), (5, 5, 3, 7)]:
        x = jnp.asarray(r.randn(2, h, w, ci).astype(np.float32))
        k3 = jnp.asarray(r.randn(3, 3, ci, co).astype(np.float32) * 0.2)
        k1 = jnp.asarray(r.randn(1, 1, ci, co).astype(np.float32) * 0.2)

        for pk, pads, kfold, fpad in (
            (phase_kernels6(k3), PHASE_PADS6, fold_kernel6(k3), 3),
            (phase_kernels4(k1), PHASE_PADS4, fold_kernel4(k1), 2),
        ):
            ref = jax.lax.conv_general_dilated(
                x, kfold, (1, 1), [(fpad, fpad)] * 2, lhs_dilation=(2, 2),
                dimension_numbers=dn)
            ys = [
                jax.lax.conv_general_dilated(
                    x, pk[di, dj], (1, 1), [pads[di], pads[dj]],
                    dimension_numbers=dn)
                for di in (0, 1) for dj in (0, 1)
            ]
            got = interleave2x2(*ys)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


def test_int8_phase_conv_static_close_to_ld2_core():
    """The quantized phase core stays within the PTQ error band of the
    exact ld2 core (same bound style as test_int8_conv2d_*)."""
    from cris_tpu.ops.quant import int8_phase_conv_static
    from cris_tpu.ops.upsample_conv import (
        PHASE_PADS6, fold_kernel6, phase_kernels6,
    )

    dn = ("NHWC", "HWIO", "NHWC")
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(2, 9, 9, 8).astype(np.float32))
    k3 = jnp.asarray(r.randn(3, 3, 8, 6).astype(np.float32) * 0.2)
    ref = jax.lax.conv_general_dilated(
        x, fold_kernel6(k3), (1, 1), [(3, 3)] * 2, lhs_dilation=(2, 2),
        dimension_numbers=dn)
    s = jnp.max(jnp.abs(x)) / 127.0
    got = int8_phase_conv_static(x, phase_kernels6(k3), PHASE_PADS6, s)
    rel = np.linalg.norm(np.asarray(got) - np.asarray(ref)) / (
        np.linalg.norm(np.asarray(ref)) + 1e-9)
    assert 0 < rel < 0.03, rel


def test_upsample2x_conv3x3_gradients_match_chain():
    from cris_tpu.ops.resize import upsample2x
    from cris_tpu.ops.upsample_conv import upsample2x_conv3x3

    dn = ("NHWC", "HWIO", "NHWC")
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(2, 6, 6, 4).astype(np.float32))
    k = jnp.asarray(r.randn(3, 3, 4, 5).astype(np.float32) * 0.2)

    def loss_chain(xx, kk):
        u = upsample2x(xx)
        y = jax.lax.conv_general_dilated(
            u, kk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        return jnp.sum(jnp.sin(y))

    def loss_fused(xx, kk):
        return jnp.sum(jnp.sin(upsample2x_conv3x3(xx, kk)))

    gx_r, gk_r = jax.grad(loss_chain, argnums=(0, 1))(x, k)
    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_projector_fused_upsample_matches_reference_order():
    """Projector with fuse_upsample on/off: same params, same output
    (both train-mode BN stats and eval), f32."""
    import dataclasses

    from cris_tpu.models.projector import Projector

    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(2, 8, 8, 16).astype(np.float32))
    word = jnp.asarray(r.randn(2, 32).astype(np.float32))
    base = Projector(word_dim=32, in_dim=8, dtype=None, fuse_upsample=False)
    variables = base.init(jax.random.PRNGKey(0), x, word, train=False)
    ref = base.apply(variables, x, word, train=False)

    fused = dataclasses.replace(base, fuse_upsample=True)
    got = fused.apply(variables, x, word, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # train-mode: BN batch stats must also agree
    _, st_r = base.apply(variables, x, word, train=True,
                         mutable=["batch_stats"])
    _, st_f = fused.apply(variables, x, word, train=True,
                          mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5),
        st_r, st_f)


def test_upsample2x_conv1x1_matches_chain():
    from cris_tpu.ops.resize import upsample2x
    from cris_tpu.ops.upsample_conv import upsample2x_conv1x1

    r = np.random.RandomState(5)
    for (h, w, ci, co) in [(13, 13, 8, 6), (7, 9, 4, 4), (5, 6, 3, 7)]:
        x = jnp.asarray(r.randn(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(r.randn(1, 1, ci, co).astype(np.float32) * 0.3)
        ref = jnp.einsum("bhwc,cd->bhwd", upsample2x(x), k[0, 0])
        got = upsample2x_conv1x1(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_fpn_fused_upsample_matches_reference_order():
    """FPN with fuse_upsample on/off: same params, same output, f32."""
    import dataclasses

    from cris_tpu.models.neck import FPN

    r = np.random.RandomState(6)
    v3 = jnp.asarray(r.randn(2, 16, 16, 24).astype(np.float32))
    v4 = jnp.asarray(r.randn(2, 8, 8, 32).astype(np.float32))
    v5 = jnp.asarray(r.randn(2, 4, 4, 32).astype(np.float32))
    state = jnp.asarray(r.randn(2, 32).astype(np.float32))
    base = FPN(in_channels=(24, 32, 32), out_channels=(16, 24, 32),
               dtype=None, fuse_upsample=False)
    variables = base.init(jax.random.PRNGKey(0), (v3, v4, v5), state,
                          train=False)
    ref = base.apply(variables, (v3, v4, v5), state, train=False)

    fused = dataclasses.replace(base, fuse_upsample=True)
    got = fused.apply(variables, (v3, v4, v5), state, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    _, st_r = base.apply(variables, (v3, v4, v5), state, train=True,
                         mutable=["batch_stats"])
    _, st_f = fused.apply(variables, (v3, v4, v5), state, train=True,
                          mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5),
        st_r, st_f)


# ---------------------------------------------------------------------------
# int8 quantized conv (ops/quant.py) -- the opt-in serving path


def test_int8_conv2d_exact_on_representable_inputs():
    """With integer-valued inputs/kernels whose maxabs hits 127, the
    int8 path introduces no quantization error at all."""
    from cris_tpu.ops.quant import int8_conv2d

    r = np.random.RandomState(0)
    x = r.randint(-127, 128, (2, 8, 8, 16)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0  # pin the dynamic scale to 1
    x = jnp.asarray(x)
    k = r.randint(-127, 128, (3, 3, 16, 8)).astype(np.float32)
    k[0, 0, 0, :] = 127.0  # pin every per-channel scale to 1
    k = jnp.asarray(k)
    b = jnp.asarray(r.randn(8).astype(np.float32))

    got = int8_conv2d(x, k, (1, 1), [(1, 1), (1, 1)], b)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8_conv2d_error_bound_on_random_inputs():
    from cris_tpu.ops.quant import int8_conv2d

    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 10, 10, 32).astype(np.float32))
    k = jnp.asarray((r.randn(3, 3, 32, 24) * 0.1).astype(np.float32))
    got = np.asarray(int8_conv2d(x, k, (1, 1), "SAME"))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_quantconv_param_tree_and_fallback_match_nn_conv():
    """QuantConv declares the exact nn.Conv param tree (checkpoint
    compatibility) and its sub-threshold fallback path reproduces
    nn.Conv's output."""
    from flax import linen as nn

    from cris_tpu.models.layers import QuantConv

    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 6, 6, 12).astype(np.float32))
    qc = QuantConv(10, 3, use_bias=True, dtype=None, min_channels=4096)
    ref_conv = nn.Conv(10, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                       dtype=None, param_dtype=jnp.float32)
    v_q = qc.init(jax.random.PRNGKey(0), x)
    v_c = ref_conv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_q) == jax.tree_util.tree_structure(v_c)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v_q)
            == jax.tree_util.tree_map(lambda a: a.shape, v_c))

    got = qc.apply(v_c, x)  # nn.Conv's params through QuantConv
    ref = ref_conv.apply(v_c, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantconv_quantized_path_close():
    from cris_tpu.models.layers import QuantConv

    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(2, 6, 6, 16).astype(np.float32))
    qc = QuantConv(16, 1, use_bias=True, dtype=None, min_channels=1)
    v = qc.init(jax.random.PRNGKey(0), x)
    got = np.asarray(qc.apply(v, x))
    plain = QuantConv(16, 1, use_bias=True, dtype=None, min_channels=4096)
    ref = np.asarray(plain.apply(v, x))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.02, rel


@pytest.mark.parametrize("env,dtype", [
    ("1", np.float32),       # opted-in flat at f32
    (None, np.float32),      # default: 3D reference form
    ("1", "bfloat16"),       # opted-in flat at bf16
])
def test_token_flat_matches_3d_dense(monkeypatch, env, dtype):
    """layers.token_flat: the flattened (B*S, E) Dense must equal the
    3D-batched form (the flatten exists purely because XLA:TPU lowers the
    3D projection dot ~2.4x slower -- CLAUDE.md round-5 train audit)."""
    from flax import linen as nn

    from cris_tpu.models.layers import token_flat

    if env is None:
        monkeypatch.delenv("CRIS_FLAT_DOTS", raising=False)
    else:
        monkeypatch.setenv("CRIS_FLAT_DOTS", env)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 7, 24).astype(np.float32)).astype(
        jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    dense = nn.Dense(16, dtype=x.dtype, param_dtype=jnp.float32)
    v = dense.init(jax.random.PRNGKey(1), x)
    fn = lambda t: dense.apply(v, t)
    got = np.asarray(token_flat(fn, x), np.float32)
    ref = np.asarray(fn(x), np.float32)
    assert got.shape == ref.shape == (2, 7, 16)
    np.testing.assert_allclose(got, ref, rtol=2e-2 if dtype == "bfloat16"
                               else 1e-5, atol=1e-5)
