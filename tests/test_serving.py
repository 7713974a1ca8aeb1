"""Serving subsystem: warm PredictService + HTTP front end.

In-process server on an ephemeral port (no subprocess: the service shares
the test session's CPU-mesh JAX runtime), exercised over real HTTP."""

import base64
import json
import threading
import urllib.request

import cv2
import numpy as np
import pytest

from cris_tpu.data.refer import decode_uncompressed_rle
from cris_tpu.serving import PredictService, encode_rle, make_server


@pytest.fixture(scope="module")
def service():
    import os

    from cris_tpu.utils import config as config_lib

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = config_lib.load_cfg_from_cfg_file(
        os.path.join(repo, "config", "synthetic", "cris_tiny.yaml")
    )
    # no checkpoint dir -> random weights; max_batch 4 -> buckets [1, 2, 4]
    return PredictService(cfg, model_dir="/nonexistent", max_batch=4)


def test_encode_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(13, 7) > 0.6
    rle = encode_rle(mask)
    back = decode_uncompressed_rle(rle["counts"], *rle["size"])
    np.testing.assert_array_equal(back.astype(bool), mask)
    # all-zero and all-one corners
    for m in (np.zeros((4, 5), bool), np.ones((4, 5), bool)):
        rle = encode_rle(m)
        np.testing.assert_array_equal(
            decode_uncompressed_rle(rle["counts"], *rle["size"]).astype(bool), m
        )


def test_predict_service_masks(service):
    from cris_tpu.data import decode_image
    from cris_tpu.data.synthetic import make_record

    rec = make_record(0, seed=3)
    img = decode_image(rec["img"])  # BGR
    sents = [rec["sents"][0], "the other thing", "a third expression"]
    results = service.predict(img, sents)
    assert len(results) == 3
    for r, s in zip(results, sents):
        assert r["sentence"] == s
        assert r["mask"].shape == img.shape[:2]
        assert r["mask"].dtype == bool
        assert r["foreground_px"] == int(r["mask"].sum())
    # batch-size invariance across buckets: same sentence alone (bucket 1)
    # and inside a 3-batch (bucket 4) must produce the same mask
    solo = service.predict(img, [sents[0]])[0]
    np.testing.assert_array_equal(solo["mask"], results[0]["mask"])


def test_http_endpoints(service):
    from cris_tpu.data.synthetic import make_record

    server = make_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        rec = make_record(1, seed=3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(
                {
                    "image_b64": base64.b64encode(rec["img"]).decode(),
                    "sentences": [rec["sents"][0], "something else"],
                    "format": "rle",
                }
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 2
        m = decode_uncompressed_rle(
            out["results"][0]["rle"]["counts"], *out["results"][0]["rle"]["size"]
        )
        assert m.shape == (out["height"], out["width"])
        assert int(m.sum()) == out["results"][0]["foreground_px"]

        # png format
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(
                {
                    "image_b64": base64.b64encode(rec["img"]).decode(),
                    "sentence": rec["sents"][0],
                }
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        png = base64.b64decode(out["results"][0]["mask_png_b64"])
        mask = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (out["height"], out["width"])
        assert set(np.unique(mask)).issubset({0, 255})

        # bad request -> 400, not a dead server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"{}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_predict_service_int8_mode(monkeypatch):
    """precision: int8 through the serving stack: builds, folds, engages
    QuantConv (tiny channels forced via CRIS_INT8_MIN_CH), and returns
    well-formed masks for a real request."""
    import os

    from cris_tpu.data import decode_image
    from cris_tpu.data.synthetic import make_record
    from cris_tpu.utils import config as config_lib

    monkeypatch.setenv("CRIS_INT8_MIN_CH", "1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = config_lib.load_cfg_from_cfg_file(
        os.path.join(repo, "config", "synthetic", "cris_tiny.yaml")
    )
    cfg.precision = "int8"
    svc = PredictService(cfg, model_dir="/nonexistent", max_batch=2)

    rec = make_record(0, seed=7)
    img = decode_image(rec["img"])
    out = svc.predict(img, ["the synthetic blob", "another sentence"])
    assert len(out) == 2
    for r in out:
        assert r["mask"].shape == img.shape[:2]
        assert r["mask"].dtype == bool
        assert r["foreground_px"] == int(r["mask"].sum())
