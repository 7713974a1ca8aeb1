"""Activation-scale calibration for the int8 serving mode.

Post-training static quantization (the TPU-right formulation: with a
calibrated per-site activation scale the quantize pass has no reduce
dependency and fuses into the producer's epilogue -- see
ops/quant.py:int8_conv2d_static). Flow:

    scales = calibrate_act_scales(model, folded_vars, batches)
    serving_vars = {**folded_vars, "quant": scales}
    model.apply(serving_vars, img, word, train=False)   # static int8

``batches`` is an iterable of (img, word) device arrays; a handful of
representative batches suffices (the statistic is a running maxabs).
The reference has no quantized path; this is a beyond-reference serving
capability.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp


def _maxabs_to_scale(tree: Any) -> Any:
    """quant_stats {.../act_maxabs: v} -> quant {.../act_scale: v/127}."""
    if isinstance(tree, dict):
        return {
            ("act_scale" if k == "act_maxabs" else k): _maxabs_to_scale(v)
            for k, v in tree.items()
        }
    return jnp.asarray(tree, jnp.float32) / 127.0 + 1e-12


def calibrate_act_scales(
    model,
    variables: Dict[str, Any],
    batches: Iterable[Tuple[jnp.ndarray, jnp.ndarray]],
) -> Dict[str, Any]:
    """Run calibration forwards and return the "quant" collection.

    The model must be the fold_bn eval model with the int8 gate ON
    (quant_int8=True or CRIS_INT8=1): QuantConv sows each quantized
    site's input maxabs under CRIS_INT8_CALIB=1 while running the plain
    (unquantized) convs.
    """
    stats = None
    prev = os.environ.get("CRIS_INT8_CALIB")
    os.environ["CRIS_INT8_CALIB"] = "1"

    # ONE compiled program (env gate + mutable list are trace-time
    # constants): un-jitted apply would dispatch every primitive
    # separately through the relay backend (minutes per batch)
    @jax.jit
    def _calib_apply(variables, img, word):
        return model.apply(
            variables, img, word, train=False, mutable=["quant_stats"]
        )

    try:
        for img, word in batches:
            _, mutated = _calib_apply(variables, img, word)
            batch_stats_tree = mutated.get("quant_stats", {})
            if not batch_stats_tree:
                raise ValueError(
                    "calibrate_act_scales: no QuantConv site engaged -- is "
                    "the int8 gate on (quant_int8=True / CRIS_INT8=1) and "
                    "are any convs >= CRIS_INT8_MIN_CH channels?"
                )
            if stats is None:
                stats = batch_stats_tree
            else:
                stats = jax.tree_util.tree_map(
                    jnp.maximum, stats, batch_stats_tree
                )
    finally:
        if prev is None:
            os.environ.pop("CRIS_INT8_CALIB", None)
        else:
            os.environ["CRIS_INT8_CALIB"] = prev
    if stats is None:
        raise ValueError("calibrate_act_scales: no batches provided")
    return _maxabs_to_scale(stats)


def save_act_scales(path: str, scales: Dict[str, Any],
                    min_ch: Optional[int] = None,
                    pooled_min_ch: Optional[int] = None,
                    upfold_min_ch: Optional[int] = None) -> None:
    """Persist the "quant" collection as a flat .npz (path -> array).

    ``min_ch`` records the CRIS_INT8_MIN_CH the calibration ran with: the
    quantized-site set must MATCH between calibration and serving (a
    QuantConv site with no stored scale silently falls back to dynamic
    quantization, which at min_ch=64 is slower than bf16 --
    tools/ab_int8.py). ``pooled_min_ch`` likewise records
    CRIS_INT8_POOLED_MIN_CH for the pooled/s2d sites and
    ``upfold_min_ch`` CRIS_INT8_UPFOLD_MIN_CH for the upsample-fold
    sites (those fall back to PLAIN bf16 without a stored scale, so a
    mismatch only loses the win).
    """
    import numpy as np

    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(tree)

    walk(scales, ())
    if min_ch is not None:
        flat["__min_ch__"] = np.asarray(int(min_ch))
    if pooled_min_ch is not None:
        flat["__pooled_min_ch__"] = np.asarray(int(pooled_min_ch))
    if upfold_min_ch is not None:
        flat["__upfold_min_ch__"] = np.asarray(int(upfold_min_ch))
    np.savez(path, **flat)


def load_act_scales(path: str) -> Dict[str, Any]:
    """Inverse of save_act_scales.

    If the file records the calibration-time ``min_ch``, it is applied to
    CRIS_INT8_MIN_CH (unless the env var is already set explicitly) so
    the serving-side quantized-site set matches the stored scales. When
    the env var IS already set to a different value (another scale file
    loaded earlier in this process, or an explicit override), a warning
    is logged: a site-set mismatch makes scale-less QuantConv sites fall
    back to dynamic int8, which at min_ch=64 measures slower than bf16
    (ADVICE r4).
    """
    import os

    import numpy as np

    _env = {"__min_ch__": "CRIS_INT8_MIN_CH",
            "__pooled_min_ch__": "CRIS_INT8_POOLED_MIN_CH",
            "__upfold_min_ch__": "CRIS_INT8_UPFOLD_MIN_CH"}
    out: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            if key in _env:
                stored = str(int(z[key]))
                current = os.environ.get(_env[key])
                if current is not None and current != stored:
                    from ..utils.logging import logger

                    logger.warning(
                        f"load_act_scales({path}): file was calibrated with "
                        f"{_env[key]}={stored} but the process has "
                        f"{_env[key]}={current}; the quantized-site set will "
                        f"not match the stored scales"
                    )
                os.environ.setdefault(_env[key], stored)
                continue
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return out
