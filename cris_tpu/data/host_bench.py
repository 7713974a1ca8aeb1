"""Host input-pipeline throughput measurement (VERDICT r2 task 4).

The ≥5x-A100 eval target implies the HOST must feed ~780 img/s/chip x
n chips; this module measures what the data plane actually delivers on
realistic COCO-sized JPEGs (640x480, the reference corpus median shape,
/root/reference/utils/dataset.py:127-221 is the work being replicated):
decode JPEG + decode PNG mask + affine warp to 416^2 (cubic, CLIP-mean
border) + mask warp (linear) + normalize.

Two paths are timed on identical inputs:
- native: C++ thread-pool batch plane (native/batch_preprocess.cc);
- python: the per-sample cv2/NumPy fallback (data/transforms.py), which
  is also what the reference's torch DataLoader worker does per sample.

Used by bench.py (4th metric) and tools/bench_input.py.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np


def make_test_jpegs(
    n: int, wh: Tuple[int, int] = (640, 480), seed: int = 0,
    quality: int = 90,
) -> Tuple[List[bytes], List[bytes]]:
    """n realistic (image-jpeg, mask-png) byte pairs at a fixed size.

    Smooth gradients + shapes + mild noise: random noise alone is
    adversarial for JPEG (decode cost scales with retained coefficients),
    while natural photos are mostly smooth with local detail.
    """
    import cv2

    w, h = wh
    rng = np.random.RandomState(seed)
    imgs, masks = [], []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        base = (
            120 + 60 * np.sin(xx / (20 + 10 * rng.rand()) + rng.rand() * 6)
            + 40 * np.cos(yy / (25 + 10 * rng.rand()))
        )
        img = np.stack([base + rng.randint(-20, 20) for _ in range(3)], -1)
        img = np.clip(img + rng.randn(h, w, 3) * 6, 0, 255).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(2, 5)):
            c = (int(rng.randint(60, w - 60)), int(rng.randint(60, h - 60)))
            r = int(rng.randint(30, 90))
            cv2.circle(img, c, r, tuple(int(v) for v in rng.randint(0, 255, 3)), -1)
            cv2.circle(mask, c, r, 255, -1)
        ok, jb = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
        assert ok
        ok, pb = cv2.imencode(".png", mask)
        assert ok
        imgs.append(jb.tobytes())
        masks.append(pb.tobytes())
    return imgs, masks


def python_preprocess(img_bytes: List[bytes], mask_bytes: List[bytes],
                      input_size: int) -> np.ndarray:
    """The per-sample Python path: exactly what one reference DataLoader
    worker does per sample (transforms.py is cv2-parity-tested)."""
    from .transforms import (
        decode_image, decode_mask, get_transform_mats, normalize_image,
        warp_image, warp_mask,
    )

    import cv2

    out = np.empty((len(img_bytes), input_size, input_size, 3), np.float32)
    for i, (jb, pb) in enumerate(zip(img_bytes, mask_bytes)):
        img = cv2.cvtColor(decode_image(jb), cv2.COLOR_BGR2RGB)
        mat, _ = get_transform_mats(img.shape[:2], (input_size, input_size))
        warped = warp_image(img, mat, (input_size, input_size))
        mask = decode_mask(pb)
        warp_mask(mask, mat, (input_size, input_size))
        out[i] = normalize_image(warped)
    return out


def measure_host_pipeline(
    n_images: int = 64,
    wh: Tuple[int, int] = (640, 480),
    input_size: int = 416,
    repeats: int = 3,
    nthreads: Optional[int] = None,
    python_images: int = 24,
    chip_img_s: float = 791.5,
) -> Dict:
    """Times both paths; returns rates and the v5e-8 feed extrapolation.

    chip_img_s: assumed per-chip eval consumption rate for the
    cores-to-feed arithmetic (default: the last recorded BENCH eval
    headline). bench.py passes its own recorded rate and states the
    assumption in the emitted note (ADVICE r3: the old hard-coded 780
    silently understated the figure).

    Never benchmark identical repeated inputs through caches -- inputs are
    distinct images; each repeat re-runs the same batch (host decode has
    no value cache).
    """
    import os

    from . import native

    img_bytes, mask_bytes = make_test_jpegs(n_images, wh)
    result: Dict = {
        "n_images": n_images, "shape": f"{wh[0]}x{wh[1]}",
        "input_size": input_size, "host_cores": os.cpu_count() or 1,
    }

    # python path (the reference-equivalent per-sample worker), fewer
    # images -- it is ~1 order slower and only sets the baseline
    pi, pm = img_bytes[:python_images], mask_bytes[:python_images]
    python_preprocess(pi[:2], pm[:2], input_size)  # warm cv2
    t = min(
        _timed(lambda: python_preprocess(pi, pm, input_size))
        for _ in range(max(1, repeats - 1))
    )
    result["python_img_s"] = round(python_images / t, 1)

    if native.available():
        for label, nt in (("native_1thread_img_s", 1),
                          ("native_img_s", nthreads)):
            native.batch_preprocess(img_bytes[:2], mask_bytes[:2],
                                    input_size, nthreads=nt)
            t = min(
                _timed(lambda: native.batch_preprocess(
                    img_bytes, mask_bytes, input_size, nthreads=nt))
                for _ in range(repeats)
            )
            result[label] = round(n_images / t, 1)
        result["native_speedup_vs_python"] = round(
            result["native_img_s"] / result["python_img_s"], 2
        )
        # feed a v5e-8 at the assumed per-chip eval rate: how many host
        # cores of native preprocessing would a pod slice need
        per_core = result["native_1thread_img_s"]
        result["assumed_chip_img_s"] = chip_img_s
        result["cores_to_feed_v5e8"] = round(chip_img_s * 8 / per_core, 1)

    # prewarped fast path (tools/prewarp.py records): per-sample host work
    # collapses to a normalize -- the production answer when per-core
    # decode+warp cannot feed the chips
    from .transforms import normalize_image

    rng = np.random.RandomState(1)
    warped = [rng.randint(0, 255, (input_size, input_size, 3), dtype=np.uint8)
              for _ in range(n_images)]
    t = min(
        _timed(lambda: [normalize_image(w) for w in warped])
        for _ in range(repeats)
    )
    result["prewarped_img_s"] = round(n_images / t, 1)
    result["cores_to_feed_v5e8_prewarped"] = round(
        chip_img_s * 8 / result["prewarped_img_s"], 1
    )
    return result


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
