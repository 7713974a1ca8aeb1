from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    make_param_shardings,
    param_spec,
    put_global,
    replicated,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_param_shardings",
    "param_spec",
    "put_global",
    "replicated",
]
