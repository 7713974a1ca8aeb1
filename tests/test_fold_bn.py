"""BN folding: folded variables + fold_bn model == unfolded eval outputs."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import tiny_cris


def test_fold_batchnorm_exact():
    from cris_tpu.checkpoint import fold_batchnorm

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    mask = jnp.asarray((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), img, word, mask, train=False)
    # make BN stats non-trivial by running a couple of train steps
    for i in range(2):
        _, mutated = model.apply(
            variables, img + i, word, mask, train=True, mutable=["batch_stats"]
        )
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}

    ref = model.apply(variables, img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True)
    folded_vars = fold_batchnorm(
        jax.tree_util.tree_map(np.asarray, variables)
    )

    # structure must match a fresh fold_bn init
    init_folded = folded_model.init(jax.random.PRNGKey(0), img, word)
    flat_a = set(
        "/".join(map(str, k))
        for k, _ in jax.tree_util.tree_flatten_with_path(folded_vars)[0]
    )
    flat_b = set(
        "/".join(map(str, k))
        for k, _ in jax.tree_util.tree_flatten_with_path(
            {"params": init_folded["params"],
             "batch_stats": init_folded.get("batch_stats", {})}
        )[0]
    )
    assert flat_a == flat_b, (sorted(flat_b - flat_a)[:5], sorted(flat_a - flat_b)[:5])

    got = folded_model.apply(folded_vars, img, word, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_fused_matmul_kernel_matches_xla():
    """Direct interpret-mode check of the fused matmul building block
    (bias + residual + relu applied in-kernel)."""
    from cris_tpu.ops.pallas import fused_matmul

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(300, 70).astype(np.float32))
    w = jnp.asarray(rng.randn(70, 130).astype(np.float32))
    b = jnp.asarray(rng.randn(130).astype(np.float32))
    r = jnp.asarray(rng.randn(300, 130).astype(np.float32))
    got = fused_matmul(x, w, b, r, relu=True, interpret=True)
    ref = jnp.maximum(x @ w + b + r, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_pos_embed_and_fused_pool_eval_graph():
    """Full production-eval transform chain on a tiny CRIS: BN fold +
    pos-embed pre-resize (input_resolution) + fused anti-aliasing pools
    must reproduce the reference-order f32 forward."""
    from cris_tpu.checkpoint import fold_batchnorm

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    ref = model.apply(variables, img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True, pos_grid=64 // 32)
    # the tiny model trains at its native 64px resolution, so the pre-fold
    # resizes the (2x2+1) embedding onto itself -- the point here is the
    # full pipeline (shape plumbing + fused pools) stays numerically exact
    fused_model = dataclasses.replace(folded_model, fuse_pool=True)
    folded_vars = fold_batchnorm(
        jax.tree_util.tree_map(np.asarray, variables), input_resolution=64
    )
    for m in (folded_model, fused_model):
        got = m.apply(folded_vars, img, word, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_fold_pos_embed_resizes_to_inference_grid():
    """When the inference resolution differs from the trained one, the
    pre-folded embedding must equal the model's own runtime bicubic resize
    (/root/reference/model/clip.py:110-144 semantics)."""
    from cris_tpu.checkpoint.fold import _fold_pos_embed
    from cris_tpu.ops.resize import resize2d

    rng = np.random.RandomState(2)
    pe = rng.randn(7 * 7 + 1, 24).astype(np.float32)
    folded = _fold_pos_embed(pe, 13)
    assert folded.shape == (13 * 13 + 1, 24)
    np.testing.assert_array_equal(folded[0], pe[0])  # CLS row untouched
    runtime = resize2d(
        jnp.asarray(pe[1:].reshape(1, 7, 7, 24)), (13, 13), "bicubic", False
    )
    np.testing.assert_allclose(
        folded[1:].reshape(13, 13, 24), np.asarray(runtime[0]),
        rtol=1e-5, atol=1e-5,
    )


def test_quant_int8_serving_path(monkeypatch):
    """fold_bn + quant_int8 (precision: int8 serving mode): loads the very
    same folded checkpoint (param tree unchanged) and reproduces the f32
    eval forward to within the documented dynamic-quantization error."""
    from cris_tpu.checkpoint import fold_batchnorm

    # tiny channels never reach the production >=128 threshold
    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))

    quant_model = dataclasses.replace(folded_model, quant_int8=True)
    # identical tree: the folded checkpoint loads as-is
    init_q = quant_model.init(jax.random.PRNGKey(0), img, word)
    assert (
        jax.tree_util.tree_map(lambda a: a.shape, init_q["params"])
        == jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).shape, folded_vars["params"])
    )
    got = np.asarray(quant_model.apply(folded_vars, img, word, train=False))

    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel
    # the predicted masks must agree: same sign structure at the 0.35
    # sigmoid threshold for the overwhelming majority of pixels
    thr = np.log(0.35 / 0.65)
    agree = np.mean((got > thr) == (ref > thr))
    assert agree > 0.97, agree


def test_quant_int8_static_calibration(monkeypatch):
    """Calibrated static scales: calibrate_act_scales produces the
    "quant" collection, the static path engages, and the output stays
    within the quantization error bound of the f32 eval forward."""
    from cris_tpu.checkpoint import calibrate_act_scales, fold_batchnorm

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))

    quant_model = dataclasses.replace(folded_model, quant_int8=True)
    scales = calibrate_act_scales(
        quant_model, folded_vars, [(img, word), (img2, word)]
    )
    leaves = jax.tree_util.tree_leaves(scales)
    assert leaves and all(np.all(np.asarray(l) > 0) for l in leaves)

    got = np.asarray(quant_model.apply(
        {**folded_vars, "quant": scales}, img, word, train=False))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel
    thr = np.log(0.35 / 0.65)
    assert np.mean((got > thr) == (ref > thr)) > 0.97


def test_quant_int8_pooled_and_s2d_sites(monkeypatch):
    """int8 coverage of the pooled (k2/s2-fold) and s2d-stem conv sites
    (PooledConv1x1 / S2dPooledConv1x1 / S2dConv3x3): calibration sows
    their activation scales, the static path engages and stays within the
    PTQ error band, and WITHOUT stored scales the sites fall back to
    plain bf16 (never dynamic -- the wide-tensor maxabs reduce measured
    slower than bf16, CLAUDE.md round-4)."""
    from cris_tpu.checkpoint import calibrate_act_scales, fold_batchnorm

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")
    monkeypatch.setenv("CRIS_INT8_POOLED_MIN_CH", "1")
    monkeypatch.setenv("CRIS_S2D_STEM", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True, fuse_pool=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))

    quant_model = dataclasses.replace(folded_model, quant_int8=True)
    # no stored scales: pooled/s2d sites run PLAIN (QuantConv sites go
    # dynamic) -- must stay within the documented band
    got_nostatic = np.asarray(
        quant_model.apply(folded_vars, img, word, train=False))
    rel = np.linalg.norm(got_nostatic - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel

    scales = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    flat = {
        "/".join(map(str, k)).replace("['", "").replace("']", "")
        for k, _ in jax.tree_util.tree_flatten_with_path(scales)[0]
    }
    # the new site families must all be calibrated
    for site in (
        "backbone/visual/conv2/act_scale",          # S2dConv3x3 (stem)
        "backbone/visual/conv3/act_scale",
        "backbone/visual/layer1_0/conv1/act_scale",  # S2dPooledConv1x1
        "backbone/visual/layer1_0/downsample_conv/act_scale",
        "backbone/visual/layer2_0/conv3/act_scale",  # PooledConv1x1
        "backbone/visual/layer2_0/downsample_conv/act_scale",
    ):
        assert site in flat, (site, sorted(flat)[:10])

    got = np.asarray(quant_model.apply(
        {**folded_vars, "quant": scales}, img, word, train=False))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel
    thr = np.log(0.35 / 0.65)
    assert np.mean((got > thr) == (ref > thr)) > 0.97
    # the static program must actually differ from the scale-less one
    # (the pooled/s2d sites engaged)
    assert not np.array_equal(got, got_nostatic)

    # raising the pooled threshold excludes the pooled sites again: their
    # scales go unread and the calibration no longer sows them
    monkeypatch.setenv("CRIS_INT8_POOLED_MIN_CH", "4096")
    scales_hi = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    flat_hi = {
        "/".join(map(str, k)).replace("['", "").replace("']", "")
        for k, _ in jax.tree_util.tree_flatten_with_path(scales_hi)[0]
    }
    assert "backbone/visual/layer2_0/downsample_conv/act_scale" not in flat_hi
    assert "backbone/visual/conv2/act_scale" in flat_hi  # stem unaffected


def test_quant_int8_upfold_sites(monkeypatch):
    """int8 coverage of the upsample-fold (lhs_dilated) conv sites
    (UpConvBNReLU / CatUpConvBNReLU up-cores): calibration sows their
    activation scales, the static path engages (border corrections stay
    exact) and stays within the PTQ error band, scale-less runs fall
    back to plain, and CRIS_INT8_UPFOLD=0 excludes the family."""
    from cris_tpu.checkpoint import calibrate_act_scales, fold_batchnorm

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")
    monkeypatch.setenv("CRIS_INT8_UPFOLD_MIN_CH", "1")
    # the family defaults OFF (measured in-model negative, ab_int8 r5);
    # this test opts in to keep the path correct for CRIS_INT8_UPFOLD=1
    monkeypatch.setenv("CRIS_INT8_UPFOLD", "1")
    # engage the fused-upsample graph in the f32 test harness
    monkeypatch.setenv("CRIS_FUSE_UPSAMPLE", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))

    quant_model = dataclasses.replace(folded_model, quant_int8=True)
    # no stored scales: upfold sites run PLAIN (QuantConv sites dynamic)
    got_nostatic = np.asarray(
        quant_model.apply(folded_vars, img, word, train=False))
    rel = np.linalg.norm(got_nostatic - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel

    scales = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    flat = {
        "/".join(map(str, k)).replace("['", "").replace("']", "")
        for k, _ in jax.tree_util.tree_flatten_with_path(scales)[0]
    }
    for site in (
        "neck/f2_cat/act_scale",        # CatUpConvBNReLU up-core
        "neck/aggr/act_scale",
        "proj/vis_conv1/act_scale",     # UpConvBNReLU ld2 core
        "proj/vis_conv2/act_scale",
    ):
        assert site in flat, (site, sorted(flat)[:12])

    got = np.asarray(quant_model.apply(
        {**folded_vars, "quant": scales}, img, word, train=False))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel
    thr = np.log(0.35 / 0.65)
    assert np.mean((got > thr) == (ref > thr)) > 0.97
    # the static program must actually differ (the upfold sites engaged)
    assert not np.array_equal(got, got_nostatic)

    # the family gate excludes the sites from calibration again
    monkeypatch.setenv("CRIS_INT8_UPFOLD", "0")
    scales_off = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    flat_off = {
        "/".join(map(str, k)).replace("['", "").replace("']", "")
        for k, _ in jax.tree_util.tree_flatten_with_path(scales_off)[0]
    }
    assert "proj/vis_conv1/act_scale" not in flat_off
    assert "neck/f2_cat/act_scale" not in flat_off


def test_act_scales_save_load_roundtrip(tmp_path):
    from cris_tpu.checkpoint import load_act_scales, save_act_scales

    tree = {
        "backbone": {
            "visual": {
                "layer2_tail": {"conv1": {"act_scale": jnp.asarray(
                    np.asarray([0.01, 0.02, 0.03], np.float32))}},
                "layer3_0": {"conv2": {"act_scale": jnp.asarray(
                    np.float32(0.5))}},
            }
        }
    }
    path = str(tmp_path / "quant_scales.npz")
    save_act_scales(path, tree)
    back = load_act_scales(path)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(tree)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), back, tree)


def test_act_scales_min_ch_roundtrip(tmp_path, monkeypatch):
    """The calibration-time min_ch rides in the .npz and applies to
    CRIS_INT8_MIN_CH at load unless the env var was set explicitly."""
    from cris_tpu.checkpoint import load_act_scales, save_act_scales

    tree = {"conv1": {"act_scale": jnp.asarray(np.float32(0.5))}}
    path = str(tmp_path / "quant_scales.npz")
    save_act_scales(path, tree, min_ch=64, pooled_min_ch=256)

    monkeypatch.delenv("CRIS_INT8_MIN_CH", raising=False)
    monkeypatch.delenv("CRIS_INT8_POOLED_MIN_CH", raising=False)
    back = load_act_scales(path)
    assert os.environ["CRIS_INT8_MIN_CH"] == "64"
    assert os.environ["CRIS_INT8_POOLED_MIN_CH"] == "256"
    assert list(back) == ["conv1"]  # __min_ch__ is not a scale entry

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "128")  # explicit env wins
    load_act_scales(path)
    assert os.environ["CRIS_INT8_MIN_CH"] == "128"


def test_int8_audit_hook(monkeypatch):
    """CRIS_INT8_AUDIT: every quantized site sows (max|err|, rms_err,
    max|ref|, rms_ref); 'local' returns the bf16 result downstream
    (pred == bf16 path exactly), 'compound' the int8 one."""
    from cris_tpu.checkpoint import fold_batchnorm

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))
    quant_model = dataclasses.replace(folded_model, quant_int8=True)
    q = np.asarray(quant_model.apply(folded_vars, img, word, train=False))

    monkeypatch.setenv("CRIS_INT8_AUDIT", "local")
    pred, mutated = quant_model.apply(
        folded_vars, img, word, train=False, mutable=["quant_audit"])
    leaves = jax.tree_util.tree_leaves(mutated["quant_audit"])
    assert leaves, "no site engaged the audit hook"
    for leaf in leaves:
        v = np.asarray(leaf).reshape(-1)
        assert v.shape == (4,)
        max_err, rms_err, ref_max, ref_rms = v
        assert 0 <= rms_err <= max_err
        assert ref_max > 0 and ref_rms > 0
        # per-site intrinsic error stays in the documented ~1% band
        assert rms_err / ref_rms < 0.05, rms_err / ref_rms
    # local mode: downstream sees the bf16 path -> output == bf16 output
    np.testing.assert_allclose(np.asarray(pred), ref, rtol=1e-5, atol=1e-5)

    monkeypatch.setenv("CRIS_INT8_AUDIT", "compound")
    pred_c, mutated_c = quant_model.apply(
        folded_vars, img, word, train=False, mutable=["quant_audit"])
    assert jax.tree_util.tree_leaves(mutated_c["quant_audit"])
    # compound mode: downstream sees the int8 path -> output == plain
    # (audit-off) int8 output
    np.testing.assert_allclose(np.asarray(pred_c), q, rtol=1e-5, atol=1e-5)


def test_percentile_calibration(monkeypatch):
    """CRIS_INT8_CALIB_PCT: percentile scales are strictly below maxabs
    scales on heavy-tailed activations, and the static path still
    reproduces the f32 forward within the PTQ error band."""
    from cris_tpu.checkpoint import calibrate_act_scales, fold_batchnorm

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))
    quant_model = dataclasses.replace(folded_model, quant_int8=True)

    scales_max = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    monkeypatch.setenv("CRIS_INT8_CALIB_PCT", "99.0")
    scales_pct = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    monkeypatch.delenv("CRIS_INT8_CALIB_PCT")

    pairs = list(zip(jax.tree_util.tree_leaves(scales_pct),
                     jax.tree_util.tree_leaves(scales_max)))
    assert pairs
    assert all(float(p) <= float(m) for p, m in pairs)
    # continuous activations: p99 < max strictly on at least most sites
    strict = sum(float(p) < float(m) for p, m in pairs)
    assert strict >= len(pairs) * 0.8, (strict, len(pairs))

    got = np.asarray(quant_model.apply(
        {**folded_vars, "quant": scales_pct}, img, word, train=False))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel


def test_quant_int8_head_sites(monkeypatch):
    """int8 coverage of the FPN/projector "head" conv family (ConvBNReLU/
    CoordConv fold_bn sites + projector vis_out; round-5 int8-mode audit
    follow-up): calibration sows their scales, the static path engages
    within the PTQ band, and CRIS_INT8_HEAD=0 excludes the family."""
    from cris_tpu.checkpoint import calibrate_act_scales, fold_batchnorm

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")

    model = tiny_cris(dropout=0.0, dtype=None)
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    word = jnp.asarray(rng.randint(1, 49000, (2, 17)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, word, train=False)

    folded_model = dataclasses.replace(model, fold_bn=True, fuse_pool=True)
    folded_vars = fold_batchnorm(jax.tree_util.tree_map(np.asarray, variables))
    ref = np.asarray(folded_model.apply(folded_vars, img, word, train=False))

    quant_model = dataclasses.replace(folded_model, quant_int8=True)
    scales = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    flat = {
        "/".join(map(str, k)).replace("['", "").replace("']", "")
        for k, _ in jax.tree_util.tree_flatten_with_path(scales)[0]
    }
    for site in (
        "neck/f2_v_proj/conv/act_scale",
        "neck/f4_proj4/conv/act_scale",
        "neck/coordconv_0/conv1/conv/act_scale",
        "neck/coordconv_1/conv/act_scale",
        "proj/vis_out/act_scale",
    ):
        assert site in flat, (site, sorted(flat)[:20])

    got = np.asarray(quant_model.apply(
        {**folded_vars, "quant": scales}, img, word, train=False))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert 0 < rel < 0.1, rel
    thr = np.log(0.35 / 0.65)
    assert np.mean((got > thr) == (ref > thr)) > 0.97

    # CRIS_INT8_HEAD=0 excludes the family: no head scales sown
    monkeypatch.setenv("CRIS_INT8_HEAD", "0")
    scales_off = calibrate_act_scales(quant_model, folded_vars, [(img, word)])
    flat_off = {
        "/".join(map(str, k)).replace("['", "").replace("']", "")
        for k, _ in jax.tree_util.tree_flatten_with_path(scales_off)[0]
    }
    assert "neck/f2_v_proj/conv/act_scale" not in flat_off
    assert "proj/vis_out/act_scale" not in flat_off
