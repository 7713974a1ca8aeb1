"""Pallas TPU kernels with XLA fallbacks.

Kernels engage automatically on TPU-like backends for shapes they support;
set CRIS_PALLAS=0 to force the XLA paths everywhere.
"""

from __future__ import annotations

import os
from functools import lru_cache

from .attention import fused_attention

__all__ = ["fused_attention", "pallas_enabled"]


@lru_cache(maxsize=1)
def pallas_enabled() -> bool:
    if os.environ.get("CRIS_PALLAS", "1") in ("0", "false", "False"):
        return False
    import jax

    platform = jax.default_backend()
    return platform not in ("cpu", "gpu")
