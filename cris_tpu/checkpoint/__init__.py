from .calibrate import calibrate_act_scales, load_act_scales, save_act_scales
from .fold import fold_batchnorm
from .stacking import stack_scanned, unstack_scanned
from .orbax_io import (
    BEST_NAME,
    LAST_NAME,
    checkpoint_exists,
    promote_best,
    restore_model,
    restore_train,
    save_checkpoint,
)
from .torch_convert import (
    convert_clip,
    convert_cris_state_dict,
    infer_clip_config,
    load_clip_torchscript,
    load_cris_checkpoint,
)

__all__ = [
    "fold_batchnorm",
    "stack_scanned",
    "unstack_scanned",
    "BEST_NAME",
    "LAST_NAME",
    "checkpoint_exists",
    "promote_best",
    "restore_model",
    "restore_train",
    "save_checkpoint",
    "convert_clip",
    "convert_cris_state_dict",
    "infer_clip_config",
    "load_clip_torchscript",
    "load_cris_checkpoint",
]
