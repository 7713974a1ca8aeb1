"""Host-side image preprocessing, numerically identical to the reference.

Replicates /root/reference/utils/dataset.py:147-221: aspect-preserving
affine warp to the square input size with CLIP-mean border fill (cubic for
images, linear for masks), CLIP mean/std normalization, and the inverse
transform used to map predictions back to original resolution at eval time
(/root/reference/engine/engine.py:114-116).

The affine matrix is computed analytically (it is a pure scale +
translation, which is exactly what cv2.getAffineTransform solves for the
reference's triangle correspondence).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)  # dataloader workers must not spawn their own pools

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def get_transform_mats(
    ori_hw: Tuple[int, int], input_hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Forward and inverse 2x3 affine matrices: original -> letterboxed."""
    ori_h, ori_w = ori_hw
    inp_h, inp_w = input_hw
    scale = min(inp_h / ori_h, inp_w / ori_w)
    new_h, new_w = ori_h * scale, ori_w * scale
    bias_x, bias_y = (inp_w - new_w) / 2.0, (inp_h - new_h) / 2.0

    mat = np.array([[scale, 0.0, bias_x], [0.0, scale, bias_y]], np.float64)
    inv = np.array(
        [[1.0 / scale, 0.0, -bias_x / scale], [0.0, 1.0 / scale, -bias_y / scale]],
        np.float64,
    )
    return mat, inv


def decode_image(jpeg_bytes: bytes) -> np.ndarray:
    """JPEG bytes -> BGR uint8 (the reference keeps BGR for ori_img and
    converts to RGB for the network input, dataset.py:136-138)."""
    return cv2.imdecode(np.frombuffer(jpeg_bytes, np.uint8), cv2.IMREAD_COLOR)


def decode_mask(png_bytes: bytes) -> np.ndarray:
    return cv2.imdecode(np.frombuffer(png_bytes, np.uint8), cv2.IMREAD_GRAYSCALE)


def warp_image(img_rgb: np.ndarray, mat: np.ndarray, input_hw: Tuple[int, int]):
    """Cubic warp with CLIP-mean border (dataset.py:148-153)."""
    return cv2.warpAffine(
        img_rgb,
        mat,
        (input_hw[1], input_hw[0]),
        flags=cv2.INTER_CUBIC,
        borderValue=tuple(float(m * 255) for m in CLIP_MEAN),
    )


def warp_mask(mask: np.ndarray, mat: np.ndarray, input_hw: Tuple[int, int]):
    """Linear warp, zero border, scaled to [0,1] (dataset.py:156-163)."""
    warped = cv2.warpAffine(
        mask.astype(np.float32),
        mat,
        (input_hw[1], input_hw[0]),
        flags=cv2.INTER_LINEAR,
        borderValue=0.0,
    )
    return warped / 255.0


def normalize_image(img_rgb: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> normalized float32 HWC (dataset.py:210-215).
    NHWC is kept -- the TPU-native layout -- where the reference transposes
    to CHW for torch."""
    img = img_rgb.astype(np.float32) / 255.0
    return (img - CLIP_MEAN) / CLIP_STD


def inverse_warp_prediction(
    pred: np.ndarray, inv_mat: np.ndarray, ori_hw: Tuple[int, int]
) -> np.ndarray:
    """Map a (H, W) float prediction back to original resolution
    (engine/engine.py:114-116: cubic, zero border)."""
    return cv2.warpAffine(
        pred,
        inv_mat,
        (int(ori_hw[1]), int(ori_hw[0])),
        flags=cv2.INTER_CUBIC,
        borderValue=0.0,
    )
