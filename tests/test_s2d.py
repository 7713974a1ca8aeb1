"""The space-to-depth stem (ops/s2d.py) must be numerically
interchangeable with the reference op order.

The reference stem (/root/reference/model/clip.py:147-172, 207-215) is
conv1(s2)-bn-relu, conv2-bn-relu, conv3-bn-relu, avgpool(2); production
(bf16) runs it in s2d layout — conv1 emits the layout directly (k5/s4),
conv2/conv3 are dense k3 cell convs, layer1_0's fused-pool convs exit as
exact 1x1s. Every transform is a pure weight rearrangement, so the f32
graphs must agree to float tolerance with an UNCHANGED parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cris_tpu.models.clip_resnet import Bottleneck, ModifiedResNet
from cris_tpu.models.layers import PooledConv1x1, S2dPooledConv1x1
from cris_tpu.ops.resize import avg_pool2d
from cris_tpu.ops.s2d import (
    conv3x3_s2d,
    depth_to_space,
    space_to_depth,
    stem_conv1_s2d,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


def _conv(x, k, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip():
    x = _rand((2, 8, 12, 5))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))
    # channel semantics: cell (i, j) phase (rp, cp) is pixel (2i+rp, 2j+cp)
    s = space_to_depth(x)
    np.testing.assert_array_equal(
        np.asarray(s[0, 1, 2, (1 * 2 + 0) * 5 + 3]),
        np.asarray(x[0, 3, 4, 3]))


def test_stem_conv1_s2d_matches_strided_conv():
    x = _rand((2, 16, 24, 3), 1)
    k = _rand((3, 3, 3, 7), 2) * 0.2
    b = _rand((7,), 3)
    ref = space_to_depth(_conv(x, k, stride=2) + b)
    got = stem_conv1_s2d(x, k, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv3x3_s2d_matches_plain():
    x = _rand((2, 12, 16, 5), 4)
    k = _rand((3, 3, 5, 9), 5) * 0.2
    ref = space_to_depth(_conv(x, k))
    got = conv3x3_s2d(space_to_depth(x), k, None, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_s2d_pooled_conv_matches_pooled_conv():
    x = _rand((2, 12, 12, 16), 6)
    plain = PooledConv1x1(24, pool=2, use_bias=True)
    s2d = S2dPooledConv1x1(24, use_bias=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    vs = s2d.init(jax.random.PRNGKey(0), space_to_depth(x))
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, v, vs))
    ref = plain.apply(v, x)
    got = s2d.apply(v, space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bottleneck_in_s2d_matches_external_pool():
    y = _rand((2, 16, 16, 8), 7)
    ref = Bottleneck(planes=4, stride=1)
    s2d = Bottleneck(planes=4, stride=1, in_pool=2, fuse_pool=True,
                     in_s2d=True)
    v = ref.init(jax.random.PRNGKey(2), avg_pool2d(y, 2), train=False)
    a = ref.apply(v, avg_pool2d(y, 2), train=False)
    b = s2d.apply(v, space_to_depth(y), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bottleneck_s2d_entry_matches_external_pool():
    """Tier-2 ENTRY: pooled convs emit s2d one cell level down."""
    y = _rand((2, 16, 16, 8), 17)
    ref = Bottleneck(planes=4, stride=1)
    ent = Bottleneck(planes=4, stride=1, in_pool=2, fuse_pool=True,
                     in_s2d=True, s2d_out=True)
    v = ref.init(jax.random.PRNGKey(2), avg_pool2d(y, 2), train=False)
    a = ref.apply(v, avg_pool2d(y, 2), train=False)
    b = ent.apply(v, space_to_depth(y), train=False)
    np.testing.assert_allclose(
        np.asarray(space_to_depth(a)), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("train", [False, True])
def test_bottleneck_s2d_resident_matches_plain(train):
    """Tier-2 RESIDENT: stride-1 identity block entirely in s2d layout
    (the layer1 tail scan body)."""
    x = _rand((2, 8, 8, 16), 18)
    ref = Bottleneck(planes=4, stride=1)
    res = Bottleneck(planes=4, stride=1, fuse_pool=True,
                     in_s2d=True, s2d_out=True)
    v = ref.init(jax.random.PRNGKey(3), x, train=False)
    kw = dict(mutable=["batch_stats"]) if train else {}
    a = ref.apply(v, x, train=train, **kw)
    b = res.apply(v, space_to_depth(x), train=train, **kw)
    if train:
        (a, sa), (b, sb) = a, b
        stats = jax.tree_util.tree_map(
            lambda p, q: float(jnp.abs(p - q).max()), sa, sb)
        assert max(jax.tree_util.tree_leaves(stats)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(space_to_depth(a)), np.asarray(b), atol=1e-4)


def test_bottleneck_s2d_exit_matches_plain():
    """Tier-2 EXIT: stride-2 block consuming s2d input, normal output."""
    x = _rand((2, 8, 8, 16), 19)
    ref = Bottleneck(planes=4, stride=2, fuse_pool=True)
    ext = Bottleneck(planes=4, stride=2, fuse_pool=True, in_s2d=True)
    v = ref.init(jax.random.PRNGKey(4), x, train=False)
    a = ref.apply(v, x, train=False)
    b = ext.apply(v, space_to_depth(x), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("l1", ["0", "1"])
def test_modified_resnet_s2d_matches_plain(train, l1, monkeypatch):
    # l1="1" (opt-in tier 2) exercises the scanned s2d-RESIDENT tail;
    # layers[0] = 2 so the tail scan has depth
    monkeypatch.setenv("CRIS_S2D_L1", l1)
    net_kw = dict(layers=(2, 1, 1, 1), output_dim=32, heads=2,
                  input_resolution=64, width=16)
    ref = ModifiedResNet(**net_kw)
    s2d = ModifiedResNet(fuse_pool=True, s2d_stem=True, **net_kw)
    x = _rand((2, 64, 64, 3), 8)
    v = ref.init(jax.random.PRNGKey(1), x, train=False)
    vs = s2d.init(jax.random.PRNGKey(1), x, train=False)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, v, vs))
    kw = dict(mutable=["batch_stats"]) if train else {}
    a = ref.apply(v, x, train=train, **kw)
    b = s2d.apply(v, x, train=train, **kw)
    if train:
        (a, sa), (b, sb) = a, b
        # phase-aware stem BNs must update the running stats identically
        stats = jax.tree_util.tree_map(
            lambda p, q: float(jnp.abs(p - q).max()), sa, sb)
        assert max(jax.tree_util.tree_leaves(stats)) < 1e-4
    for p, q in zip(a, b):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=5e-4)


def test_s2d_init_matches_plain_init():
    """Initializing THROUGH the s2d path must produce the same parameter
    values as the plain path (ConvParams and nn.Conv share init/rng)."""
    net_kw = dict(layers=(1, 1, 1, 1), output_dim=32, heads=2,
                  input_resolution=64, width=16)
    x = _rand((1, 64, 64, 3), 9)
    v = ModifiedResNet(**net_kw).init(jax.random.PRNGKey(3), x, train=False)
    vs = ModifiedResNet(fuse_pool=True, s2d_stem=True, **net_kw).init(
        jax.random.PRNGKey(3), x, train=False)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32)).max()), v, vs)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_auto_gate_defaults():
    """f32 keeps the reference order; bf16 runs the s2d stem."""
    from cris_tpu.models.clip_resnet import _auto_s2d

    assert _auto_s2d(None, None) is False
    assert _auto_s2d(None, jnp.float32) is False
    assert _auto_s2d(None, jnp.bfloat16) is True
    assert _auto_s2d(False, jnp.bfloat16) is False
    assert _auto_s2d(True, None) is True
