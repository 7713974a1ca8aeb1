"""ctypes bindings for the C++ batch preprocessing engine.

Loads native/libcris_data.so (building it on demand when a toolchain is
available) and exposes ``batch_preprocess``: one call decodes + warps +
normalizes a whole batch on a C++ thread pool -- a single GIL release per
batch instead of per-sample Python dispatch. Falls back cleanly: callers
check ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libcris_data.so")
_BUILD_SCRIPT = os.path.join(_REPO_ROOT, "native", "build.sh")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_BUILD_SCRIPT):
            try:
                subprocess.run(
                    ["sh", _BUILD_SCRIPT], capture_output=True, check=True,
                    timeout=300,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cris_batch_preprocess.restype = ctypes.c_int
            lib.cris_data_abi_version.restype = ctypes.c_int
            if lib.cris_data_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            return None
        return _lib


def available() -> bool:
    if os.environ.get("CRIS_NATIVE", "1") in ("0", "false", "False"):
        return False
    return _load() is not None


def batch_preprocess(
    img_bytes: Sequence[bytes],
    mask_bytes: Optional[Sequence[bytes]],
    input_size: int,
    nthreads: Optional[int] = None,
    want_inverse: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, np.ndarray]:
    """Decode+warp+normalize a batch.

    Returns (images (N,S,S,3) f32, masks (N,S,S) f32 or None,
    inverse mats (N,2,3) f64, ori_sizes (N,2) i32).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native data plane unavailable")
    n = len(img_bytes)
    if nthreads is None:
        nthreads = min(os.cpu_count() or 1, n)

    img_arrs = [np.frombuffer(b, np.uint8) for b in img_bytes]
    img_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for arr in img_arrs]
    )
    img_lens = (ctypes.c_size_t * n)(*[arr.size for arr in img_arrs])

    mask_ptrs = None
    mask_lens = None
    masks_out = None
    mask_arrs: List[np.ndarray] = []
    if mask_bytes is not None:
        mask_arrs = [np.frombuffer(b, np.uint8) for b in mask_bytes]
        mask_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
            *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in mask_arrs]
        )
        mask_lens = (ctypes.c_size_t * n)(*[a.size for a in mask_arrs])
        masks_out = np.empty((n, input_size, input_size), np.float32)

    images_out = np.empty((n, input_size, input_size, 3), np.float32)
    inv_out = np.empty((n, 2, 3), np.float64) if want_inverse else None
    ori_out = np.empty((n, 2), np.int32)

    as_ptr = lambda a, t: (
        a.ctypes.data_as(ctypes.POINTER(t)) if a is not None else None
    )
    rc = lib.cris_batch_preprocess(
        img_ptrs,
        img_lens,
        mask_ptrs,
        mask_lens,
        ctypes.c_int(n),
        ctypes.c_int(input_size),
        ctypes.c_int(nthreads),
        as_ptr(images_out, ctypes.c_float),
        as_ptr(masks_out, ctypes.c_float),
        as_ptr(inv_out, ctypes.c_double),
        as_ptr(ori_out, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError(f"native batch_preprocess failed with status {rc}")
    return images_out, masks_out, inv_out, ori_out
