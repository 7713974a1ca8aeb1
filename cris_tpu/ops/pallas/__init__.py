"""Pallas TPU kernels with XLA fallbacks.

Kernels engage automatically on TPU-like backends for shapes they support;
set CRIS_PALLAS=0 to force the XLA paths everywhere.
"""

from __future__ import annotations

import os
from functools import lru_cache

from .attention import fused_attention, fused_attention_bse
from .fused_matmul import conv1x1_fused, fused_matmul
from .layernorm import layer_norm
from .stem import fused_stem_pool

__all__ = ["fused_attention", "fused_attention_bse",
           "conv1x1_fused", "fused_matmul", "fused_stem_pool", "layer_norm",
           "pallas_enabled", "pallas_interpret", "pallas_mode"]


@lru_cache(maxsize=1)
def pallas_mode() -> str:
    """'on' (TPU kernels), 'off', or 'interpret' (CPU-emulated, for tests).
    Controlled by CRIS_PALLAS=1/0/interpret."""
    env = os.environ.get("CRIS_PALLAS", "1")
    if env in ("0", "false", "False"):
        return "off"
    if env == "interpret":
        return "interpret"
    import jax

    return "off" if jax.default_backend() in ("cpu", "gpu") else "on"


def pallas_enabled() -> bool:
    return pallas_mode() != "off"


def pallas_interpret() -> bool:
    return pallas_mode() == "interpret"
