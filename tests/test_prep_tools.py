"""Offline prep pipeline test: synthetic refs pickle + instances.json ->
REFER -> data_process outputs -> folder2pack -> RefDataset round trip."""

import json
import os
import pickle
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fake_coco(root):
    """Tiny refcoco-style data_root with 3 images / 4 refs."""
    img_dir = os.path.join(root, "images", "mscoco", "images", "train2014")
    os.makedirs(img_dir)
    ds_dir = os.path.join(root, "refcoco")
    os.makedirs(ds_dir)

    rng = np.random.RandomState(0)
    images, annotations, refs = [], [], []
    for i in range(3):
        h, w = int(rng.randint(100, 200)), int(rng.randint(100, 200))
        name = f"COCO_train2014_{i:012d}.jpg"
        cv2.imwrite(
            os.path.join(img_dir, name),
            rng.randint(0, 255, (h, w, 3), np.uint8),
        )
        images.append({"id": i, "file_name": name, "height": h, "width": w})

    # ann 0/1: polygons; ann 2: uncompressed RLE; ann 3: polygon
    for a in range(4):
        img = images[a % 3]
        h, w = img["height"], img["width"]
        if a == 2:
            # column-major RLE: 30 zeros, 50 ones, rest zeros
            counts = [30, 50, h * w - 80]
            seg = {"counts": counts, "size": [h, w]}
        else:
            seg = [[10.0, 10.0, 60.0, 10.0, 60.0, 60.0, 10.0, 60.0]]
        annotations.append(
            {
                "id": 100 + a,
                "image_id": img["id"],
                "category_id": 1 + a,
                "bbox": [10, 10, 50, 50],
                "segmentation": seg,
            }
        )
        refs.append(
            {
                "ref_id": a,
                "ann_id": 100 + a,
                "image_id": img["id"],
                "category_id": 1 + a,
                "split": "train" if a < 3 else "val",
                "sentences": [
                    {"sent_id": a * 10, "sent": f"object number {a}",
                     "tokens": ["object", "number", str(a)]},
                    {"sent_id": a * 10 + 1, "sent": f"the {a}th thing",
                     "tokens": ["the", f"{a}th", "thing"]},
                ],
            }
        )

    with open(os.path.join(ds_dir, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    with open(os.path.join(ds_dir, "instances.json"), "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [{"id": c, "name": f"cat{c}"} for c in range(1, 6)],
            },
            f,
        )
    return root


def test_refer_api_and_masks(tmp_path):
    from cris_tpu.data.refer import REFER

    root = _make_fake_coco(str(tmp_path))
    refer = REFER(root, "refcoco", "unc")
    assert len(refer.getRefIds()) == 4
    assert len(refer.getRefIds(split="train")) == 3
    assert len(refer.getRefIds(split="val")) == 1
    assert refer.getRefBox(0) == [10, 10, 50, 50]
    assert len(refer.getImgIds()) == 3
    assert refer.loadCats(1) == ["cat1"]

    # polygon mask: the 50x50 square
    m = refer.getMask(refer.Refs[0])
    assert m["mask"].shape == (
        refer.Imgs[refer.Refs[0]["image_id"]]["height"],
        refer.Imgs[refer.Refs[0]["image_id"]]["width"],
    )
    assert m["area"] > 2000  # ~51x51 square

    # RLE mask: 50 ones in column-major order
    m2 = refer.getMask(refer.Refs[2])
    assert m2["area"] == 50
    # column-major: first 30 entries of column 0 are 0, next 50 are 1
    h = m2["mask"].shape[0]
    flat_cm = m2["mask"].T.reshape(-1)
    assert flat_cm[:30].sum() == 0
    assert flat_cm[30:80].sum() == 50


def test_full_prep_pipeline(tmp_path):
    """data_process CLI -> anns json + mask pngs -> folder2pack CLI ->
    RefPack readable by RefDataset."""
    root = _make_fake_coco(str(tmp_path / "data_root"))
    out = str(tmp_path / "out")

    env = dict(os.environ, CRIS_PLATFORM="cpu")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "data_process.py"),
            "--data_root", root, "--output_dir", out,
            "--dataset", "refcoco", "--split", "unc", "--generate_mask",
        ],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    ann_file = os.path.join(out, "anns", "refcoco", "train.json")
    assert os.path.isfile(ann_file)
    anns = json.load(open(ann_file))
    assert len(anns) == 3
    assert {a["segment_id"] for a in anns} == {0, 1, 2}
    for a in anns:
        assert os.path.isfile(
            os.path.join(out, "masks", "refcoco", f"{a['segment_id']}.png")
        )
        assert a["sentences_num"] == 2

    pack_dir = str(tmp_path / "pack")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "folder2pack.py"),
            "-j", ann_file,
            "-i", os.path.join(root, "images", "mscoco", "images", "train2014"),
            "-m", os.path.join(out, "masks", "refcoco"),
            "-o", pack_dir,
        ],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    pack_path = os.path.join(pack_dir, "train.refpack")
    assert os.path.isfile(pack_path)

    from cris_tpu.data import RefDataset

    ds = RefDataset(
        pack_path, os.path.join(out, "masks", "refcoco"),
        "refcoco", "train", "train", 416, 17,
    )
    assert len(ds) == 3
    sample = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert sample["image"].shape == (416, 416, 3)
    assert sample["mask"].shape == (416, 416, 1)
    assert sample["word"].shape == (17,)


def test_compressed_rle_decode():
    """decode_compressed_counts must invert the pycocotools rleToString
    encoding (refer.py handles compressed 'counts' strings without the
    pycocotools C extension the reference needs, tools/refer.py:295-314)."""
    from cris_tpu.data.refer import (
        decode_compressed_counts,
        decode_uncompressed_rle,
    )

    def encode(cnts):
        # independent port of pycocotools rleToString (maskApi.c):
        # delta-code runs vs cnts[i-2], emit 5-bit base-48 varint chunks
        out = bytearray()
        for i, x in enumerate(cnts):
            if i > 2:
                x -= cnts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                out.append(c + 48)
        return bytes(out)

    # hand case: a single run of 4 encodes to '4'
    assert decode_compressed_counts(b"4") == [4]
    assert decode_compressed_counts("4") == [4]

    rng = np.random.RandomState(7)
    for trial in range(20):
        h, w = int(rng.randint(3, 40)), int(rng.randint(3, 40))
        mask = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        # column-major run lengths, starting with zeros
        flat = mask.T.reshape(-1)
        change = np.flatnonzero(np.diff(flat))
        counts = np.diff(np.concatenate([[0], change + 1, [flat.size]])).tolist()
        if flat[0] == 1:
            counts = [0] + counts
        assert decode_compressed_counts(encode(counts)) == counts
        np.testing.assert_array_equal(
            decode_uncompressed_rle(counts, h, w), mask
        )


def test_refer_getmask_compressed_rle(tmp_path):
    """getMask decodes compressed-string RLE anns (previously raised)."""
    from cris_tpu.data.refer import REFER, decode_uncompressed_rle

    root = _make_fake_coco(str(tmp_path))
    # rewrite ann 2's RLE as a compressed string using the same varint
    with open(os.path.join(root, "refcoco", "instances.json")) as f:
        inst = json.load(f)
    ann = inst["annotations"][2]
    counts = ann["segmentation"]["counts"]

    def encode(cnts):
        out = bytearray()
        for i, x in enumerate(cnts):
            if i > 2:
                x -= cnts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                out.append(c + 48)
        return out.decode("ascii")

    ann["segmentation"] = {
        "counts": encode(counts), "size": ann["segmentation"]["size"]
    }
    with open(os.path.join(root, "refcoco", "instances.json"), "w") as f:
        json.dump(inst, f)

    refer = REFER(root, "refcoco", "unc")
    ref = refer.loadRefs(2)[0]
    got = refer.getMask(ref)["mask"]
    h, w = refer.Imgs[ref["image_id"]]["height"], refer.Imgs[ref["image_id"]]["width"]
    np.testing.assert_array_equal(got, decode_uncompressed_rle(counts, h, w))


def test_refer_show_helpers(tmp_path):
    """showRef/showMask render without error on polygon, RLE, and box modes
    (reference tools/refer.py:240-320 surface)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cris_tpu.data.refer import REFER

    root = _make_fake_coco(str(tmp_path))
    refer = REFER(root, "refcoco", "unc")

    fig, ax = plt.subplots()
    refer.showRef(refer.Refs[0], seg_box="seg", ax=ax)  # polygon outlines
    assert len(ax.collections) == 2  # thick yellow + thin red
    plt.close(fig)

    fig, ax = plt.subplots()
    refer.showRef(refer.Refs[2], seg_box="seg", ax=ax)  # RLE tint overlay
    assert len(ax.images) == 2  # photo + tint
    plt.close(fig)

    fig, ax = plt.subplots()
    refer.showRef(refer.Refs[0], seg_box="box", ax=ax)
    assert len(ax.patches) == 1
    plt.close(fig)

    fig, ax = plt.subplots()
    refer.showMask(refer.Refs[2], ax=ax)
    assert len(ax.images) == 1
    plt.close(fig)

    with pytest.raises(ValueError):
        refer.showRef(refer.Refs[0], seg_box="nope")
