"""Data pipeline tests: transforms parity, record format, dataset modes,
loader batching/sharding."""

import os

import numpy as np
import pytest

from cris_tpu.data import (
    RefDataLoader,
    RefDataset,
    RefPackReader,
    SyntheticBackend,
    get_transform_mats,
    make_record,
    normalize_image,
    warp_image,
    write_refpack,
)

from conftest import add_reference_to_path, has_reference


def test_transform_mats_match_cv2_solution():
    """Analytic scale+translate must equal cv2.getAffineTransform on the
    reference's triangle correspondence (utils/dataset.py:193-208)."""
    import cv2

    for ori in ((480, 640), (640, 480), (417, 231), (416, 416)):
        ori_h, ori_w = ori
        inp_h = inp_w = 416
        scale = min(inp_h / ori_h, inp_w / ori_w)
        new_h, new_w = ori_h * scale, ori_w * scale
        bias_x, bias_y = (inp_w - new_w) / 2.0, (inp_h - new_h) / 2.0
        src = np.array([[0, 0], [ori_w, 0], [0, ori_h]], np.float32)
        dst = np.array(
            [[bias_x, bias_y], [new_w + bias_x, bias_y], [bias_x, new_h + bias_y]],
            np.float32,
        )
        ref_mat = cv2.getAffineTransform(src, dst)
        ref_inv = cv2.getAffineTransform(dst, src)
        mat, inv = get_transform_mats(ori, (416, 416))
        np.testing.assert_allclose(mat, ref_mat, atol=1e-6)
        np.testing.assert_allclose(inv, ref_inv, atol=1e-6)


def test_normalize_matches_reference_convert():
    """(img/255 - mean)/std in NHWC vs the reference's CHW math
    (utils/dataset.py:210-215)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
    mean = np.array([0.48145466, 0.4578275, 0.40821073]).reshape(3, 1, 1)
    std = np.array([0.26862954, 0.26130258, 0.27577711]).reshape(3, 1, 1)
    ref = (img.transpose(2, 0, 1).astype(np.float64) / 255.0 - mean) / std
    got = normalize_image(img)
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref, rtol=1e-5, atol=1e-6)


def test_refpack_roundtrip(tmp_path):
    records = [make_record(i, seed=7) for i in range(5)]
    path = str(tmp_path / "test.refpack")
    assert write_refpack(path, records) == 5
    reader = RefPackReader(path)
    assert len(reader) == 5
    for i in range(5):
        got = reader[i]
        assert got == records[i]
    with pytest.raises(IndexError):
        reader[5]
    reader.close()


def test_synthetic_schema():
    rec = make_record(3, seed=1)
    assert set(rec) == {"img", "mask", "cat", "seg_id", "img_name",
                        "num_sents", "sents"}
    assert rec["num_sents"] == len(rec["sents"]) >= 1
    # deterministic
    assert make_record(3, seed=1)["img"] == rec["img"]
    assert make_record(3, seed=2)["img"] != rec["img"]


@pytest.mark.parametrize("mode", ["train", "val", "test"])
def test_dataset_modes(mode):
    ds = RefDataset(
        "synthetic://8?seed=3", None, "synthetic", "val", mode, 416, 17
    )
    assert len(ds) == 8
    sample = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert sample["image"].shape == (416, 416, 3)
    assert sample["image"].dtype == np.float32
    if mode == "train":
        assert sample["word"].shape == (17,)
        assert sample["mask"].shape == (416, 416, 1)
        assert 0.0 <= sample["mask"].min() and sample["mask"].max() <= 1.0
    elif mode == "val":
        assert sample["word"].shape == (17,)
        assert sample["inverse"].shape == (2, 3)
        assert os.path.exists(sample["mask_path"])
    else:
        assert sample["inverse"].shape == (2, 3)
        assert len(sample["sents"]) >= 1
        assert sample["ori_img"].ndim == 3


def test_loader_batching_and_padding():
    ds = RefDataset("synthetic://10?seed=4", None, "synthetic", "val", "val", 416, 17)
    loader = RefDataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 416, 416, 3)
    assert batches[0]["valid"].all()
    # final batch: 2 real + 2 padded
    assert batches[2]["valid"].tolist() == [True, True, False, False]


def test_loader_epoch_shuffle_deterministic():
    ds = RefDataset("synthetic://16?seed=5", None, "synthetic", "train", "train", 64, 17)
    loader = RefDataLoader(ds, batch_size=4, shuffle=True, seed=1,
                           drop_last=True, num_workers=1)
    loader.set_epoch(1)
    a = [b["word"].copy() for b in loader]
    loader.set_epoch(1)
    b = [bb["word"].copy() for bb in loader]
    loader.set_epoch(2)
    c = [bb["word"].copy() for bb in loader]
    assert all((x == y).all() for x, y in zip(a, b))
    assert any((x != y).any() for x, y in zip(a, c))


def test_loader_process_sharding():
    ds = RefDataset("synthetic://10?seed=6", None, "synthetic", "val", "val", 64, 17)
    seen = []
    for rank in range(4):
        loader = RefDataLoader(
            ds, batch_size=3, shuffle=False, num_workers=1,
            process_index=rank, process_count=4,
        )
        for batch in loader:
            seen.extend(np.asarray(batch["seg_id"])[batch["valid"]].tolist())
    # DistributedSampler-style wrap-around padding: every sample appears,
    # some twice, total = ceil(10/4)*4
    assert len(seen) == 12
    assert set(seen) == set(range(10))


def test_prewarp_pack_matches_live_pipeline(tmp_path):
    """tools/prewarp.py output must yield identical samples to the
    on-the-fly path (same ops, applied offline)."""
    import subprocess
    import sys

    src = "synthetic://6?seed=40"
    out = str(tmp_path / "train.refpack")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "prewarp.py"),
         "-i", src, "-o", out, "--input-size", "416", "--keep-ori"],
        capture_output=True, text=True,
        env=dict(os.environ, CRIS_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr

    for mode in ("train", "val", "test"):
        live = RefDataset(src, None, "synthetic", "val", mode, 416, 17)
        fast = RefDataset(out, live.mask_root, "synthetic", "val", mode, 416, 17)
        for i in range(3):
            a = live.__getitem__(i, rng=np.random.RandomState(i))
            b = fast.__getitem__(i, rng=np.random.RandomState(i))
            np.testing.assert_array_equal(a["image"], b["image"])
            if mode == "train":
                np.testing.assert_array_equal(a["word"], b["word"])
                np.testing.assert_array_equal(a["mask"], b["mask"])
            else:
                np.testing.assert_allclose(a["inverse"], b["inverse"], atol=1e-12)
                np.testing.assert_array_equal(a["ori_size"], b["ori_size"])
            if mode == "test":
                assert a["sents"] == b["sents"]
                np.testing.assert_array_equal(a["ori_img"], b["ori_img"])


def test_loader_abandoned_iteration_does_not_leak():
    """Breaking out of a loader mid-epoch must stop the producer thread."""
    import threading
    import time

    ds = RefDataset("synthetic://24?seed=50", None, "synthetic", "train",
                    "train", 64, 17)
    loader = RefDataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                           prefetch=1)
    before = threading.active_count()
    for i, batch in enumerate(loader):
        if i == 1:
            break  # abandon mid-epoch
    # producer observes the stop event and winds down
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.2)
    assert threading.active_count() <= before + 1, threading.active_count()
