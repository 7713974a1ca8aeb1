"""Eval-time BatchNorm folding.

Folds every conv+BN / linear+BN pair's affine into the preceding weight
tensor, producing parameters for the ``fold_bn=True`` model variant:

  kernel' = kernel * inv          (inv = scale / sqrt(var + eps), per out-ch)
  bias'   = bn_bias - mean * inv

This removes a full elementwise pass over every conv output at inference
(the device profile shows these BN/ReLU epilogue fusions costing ~25-45%
of eval compute, since XLA cannot fuse elementwise work into TPU conv
fusions). The FPN's ``norm_layer`` BN normalizes a *product* of features
(layers.py:287-290 in the reference), has no preceding linear op, and is
kept as-is.

Numerics: folding is an exact algebraic rewrite in fp32; outputs differ
only by float re-association (~1e-6 relative in fp32, within bf16 noise in
bf16).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-5

# (weight_child, bn_child) sibling pairs, by name, found anywhere in the tree
_NAMED_PAIRS = (
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("downsample_conv", "downsample_bn"),
    ("connect_conv", "connect_bn"),
    ("conv", "bn"),       # ConvBNReLU
    ("linear", "bn"),     # LinearBNReLU
)

# The FPN's 'norm_layer' BN (which normalizes a feature *product*, nothing
# to fold into) survives folding simply because its name matches no
# _NAMED_PAIRS entry -- pairing is strictly by (weight, bn) sibling names.


def _fold_pair(weight_leaf: Dict[str, Any], bn_params, bn_stats):
    inv = np.asarray(bn_params["scale"], np.float64) / np.sqrt(
        np.asarray(bn_stats["var"], np.float64) + BN_EPS
    )
    shift = np.asarray(bn_params["bias"], np.float64) - np.asarray(
        bn_stats["mean"], np.float64
    ) * inv
    kernel = np.asarray(weight_leaf["kernel"], np.float64)
    # nn.scan-stacked blocks carry a leading layer axis: inv/shift are
    # (L, C) against kernels (L, kh, kw, in, C) -- align leading L and
    # trailing C, broadcasting across the middle
    inv_k = inv if inv.ndim == 1 else inv.reshape(
        inv.shape[0], *([1] * (kernel.ndim - 2)), inv.shape[-1]
    )
    folded = {"kernel": (kernel * inv_k).astype(np.float32)}
    bias = shift
    if "bias" in weight_leaf:  # conv already had a bias (not the case here)
        bias = np.asarray(weight_leaf["bias"], np.float64) * inv + shift
    folded["bias"] = bias.astype(np.float32)
    return folded


def _fold_pos_embed(pe: np.ndarray, grid: int) -> np.ndarray:
    """Pre-resize the attnpool positional embedding to the inference grid.

    At apply time AttentionPool2d bicubic-resizes the trained
    (spacial_dim^2+1, C) embedding to the actual (h, w) grid every forward
    (reference: /root/reference/model/clip.py:110-144); for a fixed
    inference resolution the resize is a constant, so folding it into the
    checkpoint removes those per-step resize ops (profiled ~0.8 ms/fwd of
    tiny badly-tiled f32 matmuls on v5e). The CLS slot (row 0) is kept
    so the parameter keeps its (n^2+1, C) convention.
    """
    n = pe.shape[0] - 1
    sd = int(round(n**0.5))
    if sd == grid:
        return pe
    from ..ops.resize import resize_weight_matrix

    w = resize_weight_matrix(sd, grid, "bicubic", False).astype(np.float64)
    g = pe[1:].reshape(sd, sd, -1).astype(np.float64)
    g = np.einsum("oh,hwc->owc", w, g)
    g = np.einsum("pw,owc->opc", w, g)
    return np.concatenate(
        [np.asarray(pe[:1], np.float32),
         g.reshape(grid * grid, -1).astype(np.float32)], axis=0
    )


def fold_batchnorm(
    variables: Dict[str, Any], input_resolution: int | None = None
) -> Dict[str, Any]:
    """variables {'params', 'batch_stats'} -> folded variables for the
    fold_bn=True model (BN entries removed except KEEP_BN).

    input_resolution: when given, additionally pre-resizes the attnpool
    positional embedding to the (input_resolution // 32)^2 grid so the
    eval forward skips the per-step bicubic resize (see _fold_pos_embed).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Dict[str, Any], s: Dict[str, Any]) -> Tuple[Dict, Dict]:
        new_p: Dict[str, Any] = {}
        new_s: Dict[str, Any] = {}
        consumed = set()
        for wname, bname in _NAMED_PAIRS:
            if (
                wname in p
                and bname in p
                and isinstance(p[wname], dict)
                and "kernel" in p[wname]
                and isinstance(p.get(bname), dict)
                and "scale" in p[bname]
                and isinstance(s.get(bname), dict)
            ):
                new_p[wname] = _fold_pair(p[wname], p[bname], s[bname])
                consumed.add(wname)
                consumed.add(bname)
        for k, v in p.items():
            if k in consumed:
                continue
            if isinstance(v, dict):
                sub_p, sub_s = walk(v, s.get(k, {}) if isinstance(s, dict) else {})
                new_p[k] = sub_p
                if sub_s:
                    new_s[k] = sub_s
            else:
                new_p[k] = v
        # leaf stats (mean/var) belonging to a surviving BN module at this
        # node (e.g. inside norm_layer)
        if isinstance(s, dict):
            for k, v in s.items():
                if k in consumed or k in new_s:
                    continue
                if not isinstance(v, dict):
                    new_s[k] = v
        return new_p, new_s

    new_params, new_stats = walk(params, stats)

    if input_resolution is not None:
        grid = input_resolution // 32

        def fold_pos(node: Dict[str, Any]):
            for k, v in node.items():
                if not isinstance(v, dict):
                    continue
                if k == "attnpool" and "positional_embedding" in v:
                    v["positional_embedding"] = _fold_pos_embed(
                        np.asarray(v["positional_embedding"]), grid
                    )
                else:
                    fold_pos(v)

        fold_pos(new_params)

    return {"params": new_params, "batch_stats": new_stats}
