"""Native C++ data plane vs pure-Python preprocessing parity."""

import numpy as np
import pytest

from cris_tpu.data import RefDataset
from cris_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native data plane not built"
)


def _dataset(mode):
    return RefDataset(
        "synthetic://6?seed=21", None, "synthetic", "val", mode, 416, 17
    )


@pytest.mark.parametrize("mode", ["train", "val"])
def test_native_matches_python(mode):
    ds = _dataset(mode)
    idxs = list(range(6))
    rngs = [np.random.RandomState(100 + i) for i in idxs]
    rngs2 = [np.random.RandomState(100 + i) for i in idxs]

    native_samples = ds.get_batch(idxs, rngs)

    import cris_tpu.data.native as native_mod

    # force the python path by monkeypatching availability
    orig = native_mod.available
    native_mod.available = lambda: False
    try:
        python_samples = ds.get_batch(idxs, rngs2)
    finally:
        native_mod.available = orig

    for ns, ps in zip(native_samples, python_samples):
        assert set(ns) == set(ps)
        # The python cv2 wheel (5.x) and the system libopencv (4.x) differ
        # by a few LSBs in INTER_CUBIC fixed-point rounding on <1% of
        # pixels; require pixel-level agreement within 4/255.
        img_diff = np.abs(ns["image"] - ps["image"])
        assert (img_diff < 1e-4).mean() > 0.98
        assert img_diff.max() < 4.5 / (255 * 0.26)
        np.testing.assert_array_equal(ns["word"], ps["word"])
        if mode == "train":
            mask_diff = np.abs(ns["mask"] - ps["mask"])
            assert (mask_diff < 1e-5).mean() > 0.98
            assert mask_diff.max() < 0.05
        else:
            np.testing.assert_allclose(ns["inverse"], ps["inverse"], atol=1e-9)
            np.testing.assert_array_equal(ns["ori_size"], ps["ori_size"])
            assert ns["mask_path"] == ps["mask_path"]


def test_native_errors_on_bad_bytes():
    with pytest.raises(RuntimeError):
        native.batch_preprocess([b"not a jpeg"], None, 64)


def test_native_matches_python_at_benched_shapes():
    """Pin native-vs-Python parity at exactly the shapes host_bench times
    (640x480 JPEG -> 416^2), so the published throughput number is tied to
    a correctness check on the same inputs (VERDICT r2 task 4)."""
    from cris_tpu.data.host_bench import make_test_jpegs, python_preprocess

    img_bytes, mask_bytes = make_test_jpegs(4, (640, 480), seed=3)
    images, masks, invs, oris = native.batch_preprocess(
        img_bytes, mask_bytes, 416
    )
    ref_images = python_preprocess(img_bytes, mask_bytes, 416)

    # same cv2-5.x vs libopencv-4.x INTER_CUBIC rounding divergence as
    # above, amplified by the benched images' JPEG noise: measured mean
    # 0.04 gray levels, 0.9% of pixels >1 level, 0.008% >2 levels
    diff = np.abs(images - ref_images)
    assert (diff < 1e-4).mean() > 0.95
    assert np.quantile(diff, 0.999) < 2.5 / (255 * 0.26)
    assert diff.max() < 8.0 / (255 * 0.26)
    assert masks.shape == (4, 416, 416)
    np.testing.assert_array_equal(oris, [[480, 640]] * 4)
