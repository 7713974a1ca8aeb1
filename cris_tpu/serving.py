"""Persistent serving: checkpoint + tokenizer stay warm across requests.

The reference has no serving story (its test.py reloads everything per
run); this module keeps a compiled model resident and answers
(image, sentences) queries at interactive latency:

- ``PredictService``: loads config + checkpoint once, pre-compiles the
  eval program for a fixed set of batch buckets (static XLA shapes -- a
  new sentence count must never trigger a fresh compile in the serving
  path), and exposes ``predict()``;
- ``serve()``: a dependency-free stdlib ThreadingHTTPServer front
  (POST /predict with JSON, GET /healthz) -- see tools/serve.py.

Request flow per (image, N sentences): one letterbox warp (cv2), one
tokenize, one device batch at the next bucket >= N, one inverse warp per
sentence -- the same operator chain as test-time eval
(/root/reference/engine/engine.py:146-215), minus the metric tail.
"""

from __future__ import annotations

import base64
import json
import os.path as osp
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .data.transforms import (
    get_transform_mats,
    inverse_warp_prediction,
    normalize_image,
    warp_image,
)
from .engine import EVAL_THRESHOLD, Evaluator
from .utils.logging import logger
from .utils.tokenizer import tokenize


def _buckets(max_batch: int) -> List[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    return out + [max_batch]


def encode_rle(mask: np.ndarray) -> Dict[str, Any]:
    """Binary (h, w) mask -> COCO uncompressed RLE (column-major runs
    starting with zeros) -- decodable by cris_tpu.data.refer and
    pycocotools alike."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # column-major
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate(([0], change, [flat.size]))
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0]:  # runs must start with a zero-run
        counts = [0] + counts
    return {"counts": counts, "size": [int(h), int(w)]}


class PredictService:
    """Warm single-model predictor with bucketed static batch shapes.

    ``max_batch`` default = 16, the measured serving optimum
    (tools/bench_batch_sweep.py, R50 416 v5e round 5): int8-static
    throughput PEAKS at b16 (1016.1 img/s vs 999.5 at b32, 957.9 at
    b64, 894.7 at b128) and bf16 at b16 (858.3) is within 2.2% of its
    b32 optimum (877.5) -- while b16 halves the per-batch latency
    (15.75 ms vs 32.0). Larger batches only pay if a deployment is
    bf16-only and saturated; b64+ loses in BOTH modes (HBM working-set
    pressure), b128 bf16 does not fit the 15.75G budget at 416^2."""

    def __init__(
        self,
        cfg,
        model_dir: Optional[str] = None,
        max_batch: int = 16,
        fold_bn: bool = True,
        warm: bool = True,
    ):
        from . import cli
        from .checkpoint import BEST_NAME, restore_model

        self.cfg = cfg
        self.input_size = int(cfg.input_size)
        self.word_len = int(cfg.word_len)
        self.max_batch = int(max_batch)
        self._lock = threading.Lock()  # one device batch at a time

        model, variables = cli.build_model_and_variables(cfg, load_clip=False)
        model_dir = model_dir or osp.join(cfg.output_folder, cfg.exp_name)
        orbax_path = osp.join(model_dir, BEST_NAME)
        torch_path = osp.join(model_dir, "best_model.pth")
        if osp.isdir(orbax_path):
            variables = restore_model(
                orbax_path,
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
            )
        elif osp.isfile(torch_path):
            from .checkpoint import load_cris_checkpoint

            variables, _ = load_cris_checkpoint(torch_path, cfg.num_layers)
        else:
            logger.warning(
                f"no checkpoint under '{model_dir}' -- serving random weights"
            )
        if fold_bn:
            import dataclasses

            from .checkpoint import fold_batchnorm

            model = dataclasses.replace(
                model, fold_bn=True, scan_unroll=0,
                pos_grid=self.input_size // 32,
            )
            variables = fold_batchnorm(
                jax.tree_util.tree_map(np.asarray, variables),
                input_resolution=self.input_size,
            )
        # static int8 (precision: int8): attach calibrated activation
        # scales when tools/quantize.py has written them
        quant_path = osp.join(model_dir, "quant_scales.npz")
        if (str(cfg.get("precision", "bf16")).lower() == "int8"
                and fold_bn and osp.isfile(quant_path)):
            from .checkpoint import load_act_scales

            variables = {**variables, "quant": load_act_scales(quant_path)}
        self.model = model
        self.variables = jax.device_put(variables)
        self.evaluator = Evaluator(model, self.input_size, batch_size=max_batch)
        if warm:
            self.warmup()

    def warmup(self):
        """Compile every batch bucket before the first request lands."""
        size = self.input_size
        for b in _buckets(self.max_batch):
            img = np.zeros((b, size, size, 3), np.float32)
            word = np.zeros((b, self.word_len), np.int32)
            self.evaluator.predict_probs(self.variables, img, word)
        logger.info(
            f"serving warm: buckets {_buckets(self.max_batch)} compiled"
        )

    def predict(
        self, image_bgr: np.ndarray, sentences: Sequence[str],
        threshold: float = EVAL_THRESHOLD,
    ) -> List[Dict[str, Any]]:
        """BGR image + N referring expressions -> N binary masks at the
        original resolution (plus foreground pixel counts)."""
        if not sentences:
            return []
        rgb = image_bgr[:, :, ::-1]
        hw = (self.input_size, self.input_size)
        mat, inv = get_transform_mats(rgb.shape[:2], hw)
        net_in = normalize_image(warp_image(rgb, mat, hw))
        words = tokenize(list(sentences), self.word_len, True)

        results: List[Dict[str, Any]] = []
        for start in range(0, len(sentences), self.max_batch):
            chunk = words[start : start + self.max_batch]
            n = chunk.shape[0]
            b = next(x for x in _buckets(self.max_batch) if x >= n)
            images = np.repeat(net_in[None], b, axis=0)
            word_batch = np.zeros((b, self.word_len), chunk.dtype)
            word_batch[:n] = chunk
            with self._lock:
                probs = self.evaluator.predict_probs(
                    self.variables, images, word_batch
                )
            for i in range(n):
                warped = inverse_warp_prediction(probs[i], inv, rgb.shape[:2])
                mask = warped > threshold
                results.append(
                    {
                        "sentence": sentences[start + i],
                        "mask": mask,
                        "foreground_px": int(mask.sum()),
                    }
                )
        return results


class _Handler(BaseHTTPRequestHandler):
    service: PredictService = None  # class attr, set by serve()

    def log_message(self, fmt, *args):  # route to our logger, not stderr
        logger.info("serve: " + fmt % args)

    def _reply(self, code: int, payload: Dict[str, Any]):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/healthz", "/health"):
            self._reply(200, {"status": "ok",
                              "input_size": self.service.input_size})
        else:
            self._reply(404, {"error": f"no route {self.path}"})

    def do_POST(self):
        if self.path != "/predict":
            self._reply(404, {"error": f"no route {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            image = self._load_image(req)
            sents = req.get("sentences") or (
                [req["sentence"]] if req.get("sentence") else []
            )
            if image is None or not sents:
                self._reply(400, {"error": "need image_b64|image_path and "
                                           "sentence|sentences"})
                return
            fmt = req.get("format", "png_b64")
            out = []
            for r in self.service.predict(image, sents):
                entry = {
                    "sentence": r["sentence"],
                    "foreground_px": r["foreground_px"],
                }
                if fmt == "rle":
                    entry["rle"] = encode_rle(r["mask"])
                else:
                    import cv2

                    ok, png = cv2.imencode(
                        ".png", r["mask"].astype(np.uint8) * 255
                    )
                    entry["mask_png_b64"] = base64.b64encode(
                        png.tobytes()
                    ).decode()
                out.append(entry)
            self._reply(200, {"height": int(image.shape[0]),
                              "width": int(image.shape[1]),
                              "results": out})
        except Exception as e:  # noqa: BLE001 -- serving must not die
            logger.warning(f"serve: request failed: {e!r}")
            self._reply(500, {"error": repr(e)})

    @staticmethod
    def _load_image(req):
        import cv2

        if req.get("image_b64"):
            buf = np.frombuffer(base64.b64decode(req["image_b64"]), np.uint8)
            return cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if req.get("image_path"):
            return cv2.imread(req["image_path"], cv2.IMREAD_COLOR)
        return None


def make_server(service: PredictService, host: str = "127.0.0.1",
                port: int = 8080) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; caller owns serve_forever.
    Split from serve() so tests can run it on a thread with port 0."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve(service: PredictService, host: str = "127.0.0.1", port: int = 8080):
    server = make_server(service, host, port)
    logger.info(f"serving on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
