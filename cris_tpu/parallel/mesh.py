"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL process-group setup
(/root/reference/train.py:60-102): a single-controller 2-D
Mesh(('data', 'model')) with GSPMD shardings. Data parallelism shards the
batch axis; optional tensor parallelism shards the decoder/projector wide
matmuls over 'model'. Gradients, SyncBN statistics and eval gathers all
become XLA collectives over ICI inserted by the partitioner -- no explicit
all_reduce calls anywhere.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp_size: int = -1, tp_size: int = 1, devices=None
) -> Mesh:
    """Build Mesh(('data', 'model')). dp_size=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp_size = max(1, tp_size)
    if n % tp_size != 0:
        raise ValueError(f"tp_size {tp_size} does not divide {n} devices")
    if dp_size in (-1, 0, None):
        dp_size = n // tp_size
    if dp_size * tp_size != n:
        raise ValueError(
            f"dp={dp_size} x tp={tp_size} != {n} devices"
        )
    grid = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def put_global(tree, shardings):
    """Place host data onto (possibly multi-host) shardings.

    Single-process: plain jax.device_put. Multi-process: every sharding
    spans non-addressable devices, so each host contributes its local
    piece via jax.make_array_from_process_local_data -- per-host batch
    shards concatenate into the global batch along sharded axes, and
    replicated leaves (params) are expected identical on every host.
    `shardings` is a matching pytree of NamedShardings or one sharding
    applied to every leaf.
    """
    single = jax.process_count() == 1
    if isinstance(shardings, jax.sharding.Sharding):
        if single:
            return jax.device_put(tree, shardings)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                shardings, np.asarray(x)
            ),
            tree,
        )
    if single:
        return jax.device_put(tree, shardings)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        tree,
        shardings,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel parameter rules, matched against 'path/like/this/kernel'.
# Wide decoder/projector matmuls shard their large dimension over 'model';
# everything else is replicated. Rules are (regex, PartitionSpec) -- first
# match wins.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # decoder FFN: fc1 kernel (d_model, dim_ffn) shards cols; fc2 rows
    (r"decoder/.*ffn_fc1/kernel$", P(None, MODEL_AXIS)),
    (r"decoder/.*ffn_fc1/bias$", P(MODEL_AXIS)),
    (r"decoder/.*ffn_norm/(scale|bias)$", P(MODEL_AXIS)),
    (r"decoder/.*ffn_fc2/kernel$", P(MODEL_AXIS, None)),
    # decoder attention: head-sharded q/k/v (cols) and out (rows)
    (r"decoder/.*(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r"decoder/.*(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r"decoder/.*out_proj/kernel$", P(MODEL_AXIS, None)),
    # CLIP text transformer MLP
    (r"backbone/text/.*mlp_c_fc/kernel$", P(None, MODEL_AXIS)),
    (r"backbone/text/.*mlp_c_fc/bias$", P(MODEL_AXIS)),
    (r"backbone/text/.*mlp_c_proj/kernel$", P(MODEL_AXIS, None)),
    # projector kernel generator: (word_dim, C*k*k+1) shards cols
    (r"proj/txt/kernel$", P(None, MODEL_AXIS)),
    (r"proj/txt/bias$", P(MODEL_AXIS)),
    # token embedding: shard the vocab axis (pure lookup, all-gather-free
    # via GSPMD gather partitioning)
    (r"backbone/text/token_embedding$", P(MODEL_AXIS, None)),
)


def param_spec(path: Tuple[Any, ...], value, tp_enabled: bool) -> P:
    if not tp_enabled:
        return P()
    flat = "/".join(getattr(p, "key", str(p)) for p in path)
    for pattern, spec in _TP_RULES:
        if re.search(pattern, flat):
            # Rules are written for the per-layer shapes. nn.scan-stacked
            # params (decoder 'layers', text 'resblocks') carry one extra
            # leading layer axis: left-pad the spec with None so the same
            # rule shards the same logical dimension.
            ndim = getattr(value, "ndim", len(spec))
            if ndim > len(spec):
                spec = P(*([None] * (ndim - len(spec)) + list(spec)))
            # only shard when the dimension divides evenly; GSPMD would pad,
            # but uneven shards on tiny dryrun models are not worth it
            return spec
    return P()


def make_param_shardings(mesh: Mesh, variables) -> Any:
    """Pytree of NamedShardings for a variables pytree (params+batch_stats)."""
    tp_enabled = mesh.shape[MODEL_AXIS] > 1

    def to_sharding(path, value):
        spec = param_spec(path, value, tp_enabled)
        # verify divisibility; fall back to replication otherwise
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= value.ndim or value.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, variables)
