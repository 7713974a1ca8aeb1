"""Deterministic synthetic referring-segmentation data.

Generates images containing colored geometric shapes, a ground-truth mask
for one referred shape, and template referring expressions -- encoded as
real JPEG/PNG bytes so the full decode + warp + tokenize path is exercised
(SURVEY.md §4 calls for a fake dataset following the LMDB schema at
tools/folder2lmdb.py:50-52). Used by tests, dry runs, and benchmarks.
"""

from __future__ import annotations

import os
from typing import Dict

import cv2
import numpy as np

_COLORS = {
    "red": (220, 40, 40),
    "green": (40, 190, 60),
    "blue": (40, 80, 220),
    "yellow": (230, 210, 40),
}
_SHAPES = ("circle", "square", "triangle")
_POSITIONS = ("left", "right", "top", "bottom")


def _draw_shape(img, mask, shape, color, center, size):
    if shape == "circle":
        cv2.circle(img, center, size, color, -1)
        if mask is not None:
            cv2.circle(mask, center, size, 255, -1)
    elif shape == "square":
        p0 = (center[0] - size, center[1] - size)
        p1 = (center[0] + size, center[1] + size)
        cv2.rectangle(img, p0, p1, color, -1)
        if mask is not None:
            cv2.rectangle(mask, p0, p1, 255, -1)
    else:  # triangle
        pts = np.array(
            [
                (center[0], center[1] - size),
                (center[0] - size, center[1] + size),
                (center[0] + size, center[1] + size),
            ],
            np.int32,
        )
        cv2.fillPoly(img, [pts], color)
        if mask is not None:
            cv2.fillPoly(mask, [pts], 255)


def make_record(index: int, seed: int = 0) -> Dict:
    """One synthetic record in the reference LMDB schema."""
    rng = np.random.RandomState(seed * 1_000_003 + index)
    h = int(rng.randint(240, 640))
    w = int(rng.randint(240, 640))
    img = np.full((h, w, 3), rng.randint(100, 180, 3), np.uint8)
    mask = np.zeros((h, w), np.uint8)

    n_shapes = int(rng.randint(2, 5))
    target = int(rng.randint(n_shapes))
    sents = []
    for s in range(n_shapes):
        shape = _SHAPES[rng.randint(len(_SHAPES))]
        color_name = list(_COLORS)[rng.randint(len(_COLORS))]
        size = int(rng.randint(min(h, w) // 10, min(h, w) // 5))
        cx = int(rng.randint(size, w - size))
        cy = int(rng.randint(size, h - size))
        is_target = s == target
        _draw_shape(img, mask if is_target else None, shape,
                    _COLORS[color_name], (cx, cy), size)
        if is_target:
            pos = _POSITIONS[rng.randint(len(_POSITIONS))]
            sents = [
                f"the {color_name} {shape}",
                f"{color_name} {shape} on the {pos}",
                f"a {shape} that is {color_name}",
            ][: int(rng.randint(1, 4))]

    ok_img, jpeg = cv2.imencode(".jpg", img[:, :, ::-1])  # store BGR like COCO
    ok_mask, png = cv2.imencode(".png", mask)
    assert ok_img and ok_mask
    return {
        "img": jpeg.tobytes(),
        "mask": png.tobytes(),
        "cat": 0,
        "seg_id": index,
        "img_name": f"synthetic_{index}.jpg",
        "num_sents": len(sents),
        "sents": sents,
    }


class SyntheticBackend:
    """Record backend generating data on the fly (no files needed)."""

    def __init__(self, count: int, seed: int = 0):
        self.count = count
        self.seed = seed

    def __len__(self):
        return self.count

    def __getitem__(self, index: int) -> Dict:
        return make_record(index, self.seed)

    def materialize_masks(self, mask_root: str):
        """Write {seg_id}.png GT masks so the eval path can read them from
        disk exactly as the reference does (engine/engine.py:118)."""
        os.makedirs(mask_root, exist_ok=True)
        for i in range(self.count):
            rec = self[i]
            path = os.path.join(mask_root, f"{rec['seg_id']}.png")
            if not os.path.exists(path):
                # atomic rename: concurrent processes (multi-host tests)
                # must never observe a partially written PNG
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(rec["mask"])
                os.replace(tmp, path)
        return mask_root
