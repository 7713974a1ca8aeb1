from .torch_convert import (
    convert_clip,
    convert_cris_state_dict,
    infer_clip_config,
    load_clip_torchscript,
    load_cris_checkpoint,
)

__all__ = [
    "convert_clip",
    "convert_cris_state_dict",
    "infer_clip_config",
    "load_clip_torchscript",
    "load_cris_checkpoint",
]
