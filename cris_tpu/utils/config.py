"""Flat YAML config system with ``--opts KEY VALUE`` CLI overrides.

Behavior-compatible with the reference config layer
(/root/reference/utils/config.py:11-157): two-level YAML files are
flattened into a single attribute-accessible dict (section names like
``DATA:`` / ``TRAIN:`` are cosmetic), and CLI overrides are decoded with
``ast.literal_eval`` then type-checked against the existing value.
"""

from __future__ import annotations

import copy
import os
from ast import literal_eval

import yaml


class CfgNode(dict):
    """A dict whose keys are also attributes.

    Nested dicts are converted recursively, though the loader below always
    produces a flat namespace.
    """

    def __init__(self, init_dict=None):
        init_dict = {} if init_dict is None else dict(init_dict)
        for k, v in init_dict.items():
            if isinstance(v, dict):
                init_dict[k] = CfgNode(v)
        super().__init__(init_dict)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __str__(self):
        lines = []
        for k, v in sorted(self.items()):
            lines.append(f"{k}: {v}")
        return "\n".join(lines)

    def __repr__(self):
        return f"{self.__class__.__name__}({super().__repr__()})"

    def clone(self):
        return copy.deepcopy(self)


def load_cfg_from_cfg_file(file: str) -> CfgNode:
    """Load a two-level YAML file and flatten its sections into one CfgNode.

    Matches /root/reference/utils/config.py:61-74 -- every top-level section
    is unpacked into a single flat key space (later sections win on key
    collision, as in the reference).
    """
    if not (os.path.isfile(file) and file.endswith(".yaml")):
        raise AssertionError(f"{file} is not a yaml file")

    with open(file, "r") as f:
        raw = yaml.safe_load(f)

    flat = {}
    for section in raw:
        for k, v in raw[section].items():
            flat[k] = v
    return CfgNode(flat)


def merge_cfg_from_list(cfg: CfgNode, cfg_list) -> CfgNode:
    """Apply ``--opts full.key value`` pairs on top of ``cfg``.

    Only the last dotted component selects the key (the namespace is flat);
    unknown keys are an error; values are literal-eval decoded and coerced
    to the existing value's type (list<->tuple allowed), matching
    /root/reference/utils/config.py:77-88.
    """
    new_cfg = copy.deepcopy(cfg)
    if len(cfg_list) % 2 != 0:
        raise AssertionError("--opts must come in KEY VALUE pairs")
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        subkey = full_key.split(".")[-1]
        if subkey not in cfg:
            raise AssertionError(f"Non-existent key: {full_key}")
        value = _decode_cfg_value(v)
        value = _coerce_value_type(value, cfg[subkey], full_key)
        setattr(new_cfg, subkey, value)
    return new_cfg


def _decode_cfg_value(v):
    """Decode a raw string into a Python literal when possible."""
    if not isinstance(v, str):
        return v
    try:
        v = literal_eval(v)
    except (ValueError, SyntaxError):
        # A bare string like `foo` or a path like `a/b` stays a string.
        pass
    return v


def _coerce_value_type(replacement, original, full_key):
    """Require type match, allowing list<->tuple casts (and anything when the
    original is None, since YAML empty values load as None)."""
    original_type = type(original)
    replacement_type = type(replacement)
    if replacement_type == original_type or original is None:
        return replacement
    if replacement_type is tuple and original_type is list:
        return list(replacement)
    if replacement_type is list and original_type is tuple:
        return tuple(replacement)
    # int -> float promotion is safe and common on CLIs.
    if replacement_type is int and original_type is float:
        return float(replacement)
    raise ValueError(
        f"Type mismatch ({original_type} vs. {replacement_type}) with values "
        f"({original} vs. {replacement}) for config key: {full_key}"
    )
