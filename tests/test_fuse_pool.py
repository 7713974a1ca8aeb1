"""The fused anti-aliasing pool (PooledConv1x1 / Bottleneck fuse_pool) must
be numerically interchangeable with the reference pool->conv op order.

The reference computes F.avg_pool2d followed by a 1x1 conv at every
anti-aliased downsampling site (/root/reference/model/clip.py:10-57 and
the stem pool at clip.py:207-215); on TPU we fold the pool into the conv
(see cris_tpu/models/layers.py:PooledConv1x1). Production (bf16) uses the
fused graph, the f32 parity harness the reference order, so this test
pins the two graphs together in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cris_tpu.models.clip_resnet import Bottleneck, ModifiedResNet
from cris_tpu.models.layers import PooledConv1x1
from cris_tpu.ops.resize import avg_pool2d


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_pooled_conv1x1_matches_pool_then_conv():
    x = _rand((2, 12, 12, 16), 0)
    from flax import linen as nn

    conv = nn.Conv(24, (1, 1), use_bias=True, param_dtype=jnp.float32)
    fused = PooledConv1x1(24, pool=2, use_bias=True)
    v = conv.init(jax.random.PRNGKey(0), avg_pool2d(x, 2))
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, v, vf)
    )
    ref = conv.apply(v, avg_pool2d(x, 2))
    out = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("train", [False, True])
def test_bottleneck_fused_stride_matches_reference_order(train):
    x = _rand((2, 16, 16, 32), 1)
    ref = Bottleneck(planes=16, stride=2)
    fused = Bottleneck(planes=16, stride=2, fuse_pool=True)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)
    kw = dict(mutable=["batch_stats"]) if train else {}
    a = ref.apply(v, x, train=train, **kw)
    b = fused.apply(v, x, train=train, **kw)
    if train:
        (a, sa), (b, sb) = a, b
        stats = jax.tree_util.tree_map(
            lambda p, q: float(jnp.abs(p - q).max()), sa, sb
        )
        assert max(jax.tree_util.tree_leaves(stats)) < 1e-5
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bottleneck_fused_input_pool_matches_external_pool():
    y = _rand((2, 16, 16, 8), 2)
    ref = Bottleneck(planes=4, stride=1)
    fused = Bottleneck(planes=4, stride=1, in_pool=2, fuse_pool=True)
    v = ref.init(jax.random.PRNGKey(2), avg_pool2d(y, 2), train=False)
    a = ref.apply(v, avg_pool2d(y, 2), train=False)
    b = fused.apply(v, y, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_modified_resnet_fused_matches_unfused():
    net_kw = dict(layers=(1, 1, 1, 1), output_dim=32, heads=2,
                  input_resolution=64, width=16)
    ref = ModifiedResNet(**net_kw)
    fused = ModifiedResNet(fuse_pool=True, **net_kw)
    x = _rand((2, 64, 64, 3), 3)
    v = ref.init(jax.random.PRNGKey(1), x, train=False)
    for a, b in zip(ref.apply(v, x, train=False),
                    fused.apply(v, x, train=False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_auto_gate_defaults():
    """f32 keeps the reference order; bf16 fuses (production TPU path)."""
    from cris_tpu.models.clip_resnet import _auto_fuse_pool

    assert _auto_fuse_pool(None, None) is False
    assert _auto_fuse_pool(None, jnp.float32) is False
    assert _auto_fuse_pool(None, jnp.bfloat16) is True
    assert _auto_fuse_pool(False, jnp.bfloat16) is False
    assert _auto_fuse_pool(True, None) is True
