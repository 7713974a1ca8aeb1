"""Test fixtures: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4: multi-device tests
on CPU via --xla_force_host_platform_device_count).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon
# (the tunneled TPU). Tests must run on the virtual CPU mesh, and backend
# selection happens lazily, so a config update here still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"

# Compile-heavy modules (multi-device pjit programs, HTTP serving warmup,
# full-model parametrization sweeps). One XLA:CPU process accumulates
# compile state across these until it segfaults (~90% of the mega-run,
# >40 min on this 1-CPU host); tests/run_all.py gives each its own
# process. `pytest tests/ -q` still collects everything -- use
# `-m "not heavy"` for the single-process tier.
HEAVY_MODULES = {
    "test_parallel",
    "test_multihost",
    "test_serving",
    "test_s2d",
    "test_convergence",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)


def tiny_cris(dropout=0.1, dtype=None, vocab_size=49408):
    """A small but structurally complete CRIS for engine/parallel tests:
    64px input, 2-layer tiny CLIP, 2-layer decoder."""
    from cris_tpu.models import CLIPConfig, CRIS

    ccfg = CLIPConfig(
        embed_dim=64,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        vision_patch_size=None,
        context_length=77,
        vocab_size=vocab_size,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
    )
    model = CRIS(
        clip_config=ccfg,
        fpn_in=(128, 256, 64),
        fpn_out=(32, 64, 128),
        vis_dim=64,
        num_layers=2,
        num_head=4,
        dim_ffn=128,
        dropout=dropout,
        dtype=dtype,
    )
    return model


def param_digest(params):
    """(paths, digest[N,3]) over sorted leaves: per-leaf (mean, mean|.|,
    rms). Mean alone cancels under symmetric regressions (sign flip,
    within-leaf permutation+negation); mean|.| catches sign structure and
    rms catches scale (VERDICT r3 Weak #7)."""
    import numpy as np

    import jax

    leaves = [
        (jax.tree_util.keystr(path), np.asarray(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    ]
    leaves.sort(key=lambda kv: kv[0])
    paths = np.array([k for k, _ in leaves])
    digest = np.array(
        [
            (
                v.astype(np.float64).mean(),
                np.abs(v.astype(np.float64)).mean(),
                np.sqrt((v.astype(np.float64) ** 2).mean()),
            )
            for _, v in leaves
        ],
        np.float64,
    )
    return paths, digest


def tiny_train_cfg(**overrides):
    from cris_tpu.utils import CfgNode

    cfg = CfgNode(
        dict(
            base_lr=1e-3,
            lr_multi=0.1,
            lr_decay=0.1,
            milestones=[2],
            weight_decay=0.0,
            max_norm=0.0,
            epochs=3,
        )
    )
    cfg.update(overrides)
    return cfg


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Make the (read-only, torch-based) reference repo importable for
    numerical parity tests. Stubs optional deps the reference imports at
    module scope but that are absent in this environment."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import types

    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            import unicodedata

            stub = types.ModuleType("ftfy")
            # real ftfy NFC-normalizes by default (its other fixes only
            # trigger on mojibake); NFC is the faithful stand-in and is a
            # no-op on the ASCII RefCOCO corpora
            stub.fix_text = lambda s: unicodedata.normalize("NFC", s)
            sys.modules["ftfy"] = stub
    for name in ("lmdb", "loguru", "wandb"):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            if name == "loguru":
                import logging

                mod.logger = logging.getLogger("reference")
                mod.logger.catch = lambda f: f
            sys.modules[name] = mod
