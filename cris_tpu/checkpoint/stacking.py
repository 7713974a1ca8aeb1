"""Stack per-layer converted weights into nn.scan layout (and back).

The torch checkpoints store homogeneous stacks as per-layer entries
(``transformer.resblocks.<i>``, ``decoder.layers.<i>``,
``visual.layer<s>.<j>`` -- /root/reference/model/clip.py:258-283,
layers.py:139-146). Our modules execute those stacks as a single
``nn.scan`` whose parameters carry a leading layer axis, so conversion
finishes with this pass:

- ``resblocks_{0..L-1}``  -> one ``resblocks`` subtree, leaves (L, ...);
- ``layers_{0..L-1}``     -> one ``layers`` subtree (VL decoder);
- ``layer<s>_{1..n-1}``   -> one ``layer<s>_tail`` subtree; ``layer<s>_0``
  (the stride/downsample block, structurally different) stays standalone.

Only these known bases are touched, and only under their known parent
modules (``transformer`` for resblocks, ``decoder`` for layers,
``visual`` for resnet stage tails) -- name-pattern matching alone would
misfire on e.g. the neck's ``coordconv_0`` / ``coordconv_1``, which are
genuinely different modules, or on a future subtree reusing the names.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

_RESNET_STAGE = re.compile(r"^layer\d+$")


def _split(key: str):
    m = re.match(r"^(.*)_(\d+)$", key)
    return (m.group(1), int(m.group(2))) if m else (None, None)


def _stack_trees(trees):
    """np.stack corresponding leaves of structurally identical dicts."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    return np.stack([np.asarray(t) for t in trees], axis=0)


def _unstack_tree(tree, n):
    if isinstance(tree, dict):
        parts = [{} for _ in range(n)]
        for k, v in tree.items():
            for i, sub in enumerate(_unstack_tree(v, n)):
                parts[i][k] = sub
        return parts
    return [np.asarray(tree)[i] for i in range(n)]


# which stacked families may appear under which parent module name;
# anchoring to the parent keeps an unrelated future 'layers_0' sibling
# family (e.g. in a new head) from being silently stacked
_SCAN_PARENTS = {"resblocks": "transformer", "layers": "decoder"}
_STAGE_PARENT = "visual"


def stack_scanned(tree: Dict[str, Any], _parent: str = "") -> Dict[str, Any]:
    """Recursively convert per-layer families to stacked scan layout.

    The root call (empty ``_parent``) is a wildcard -- callers may pass a
    bare decoder/transformer subtree directly; nested families only stack
    under their known parent module."""
    if not isinstance(tree, dict):
        return tree
    out = {k: stack_scanned(v, _parent=k) for k, v in tree.items()}

    families: Dict[str, Dict[int, str]] = {}
    for k in list(out):
        base, idx = _split(k)
        if base is not None:
            families.setdefault(base, {})[idx] = k

    for base, members in families.items():
        idxs = sorted(members)
        if (base in _SCAN_PARENTS
                and _parent in ("", _SCAN_PARENTS[base])
                and idxs == list(range(len(idxs)))):
            stacked = _stack_trees([out.pop(members[i]) for i in idxs])
            out[base] = stacked
        elif (_RESNET_STAGE.match(base) and _parent in ("", _STAGE_PARENT)
              and len(idxs) > 1):
            tail = idxs[1:]
            if tail == list(range(1, len(idxs))):
                stacked = _stack_trees([out.pop(members[i]) for i in tail])
                out[f"{base}_tail"] = stacked
    return out


def unstack_scanned(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of stack_scanned (stacked scan layout -> per-layer entries);
    used for exporting/debugging against torch layouts."""
    if not isinstance(tree, dict):
        return tree
    out = {k: unstack_scanned(v) for k, v in tree.items()}
    for key in list(out):
        sub = out[key]
        if key in ("resblocks", "layers") and isinstance(sub, dict):
            n = _leading_dim(sub)
            if n is not None:
                for i, part in enumerate(_unstack_tree(out.pop(key), n)):
                    out[f"{key}_{i}"] = part
        elif key.endswith("_tail") and isinstance(sub, dict):
            base = key[: -len("_tail")]
            if _RESNET_STAGE.match(base):
                n = _leading_dim(sub)
                if n is not None:
                    for i, part in enumerate(_unstack_tree(out.pop(key), n)):
                        out[f"{base}_{i + 1}"] = part
    return out


def _leading_dim(tree):
    dims = set()

    def walk(t):
        if isinstance(t, dict):
            for v in t.values():
                walk(v)
        else:
            arr = np.asarray(t)
            dims.add(arr.shape[0] if arr.ndim else None)

    walk(tree)
    return dims.pop() if len(dims) == 1 and None not in dims else None
