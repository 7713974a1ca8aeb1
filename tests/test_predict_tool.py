"""End-to-end test of tools/predict.py (single-image serving path)."""

import os
import subprocess
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_predict_writes_masks_and_overlays(tmp_path):
    from cris_tpu.data.synthetic import make_record

    rec = make_record(0, seed=3)
    img_path = str(tmp_path / "in.jpg")
    with open(img_path, "wb") as f:
        f.write(rec["img"])

    out = str(tmp_path / "mask.png")
    overlay = str(tmp_path / "overlay.jpg")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "predict.py"),
            "--config", os.path.join(REPO, "config", "synthetic", "cris_tiny.yaml"),
            "--image", img_path,
            "--sent", rec["sents"][0],
            "--sent", "the other thing",
            "--out", out,
            "--overlay", overlay,
            "--checkpoint", str(tmp_path / "nonexistent"),  # random weights
        ],
        capture_output=True, text=True,
        env=dict(os.environ, CRIS_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr
    for i in range(2):
        mask = cv2.imread(str(tmp_path / f"mask_{i}.png"), cv2.IMREAD_GRAYSCALE)
        assert mask is not None
        ori = cv2.imread(img_path)
        assert mask.shape == ori.shape[:2]
        assert set(np.unique(mask)).issubset({0, 255})
        ov = cv2.imread(str(tmp_path / f"overlay_{i}.jpg"))
        assert ov is not None and ov.shape == ori.shape
