from .dataset import SPLIT_SIZES, RefDataset, open_backend
from .loader import RefDataLoader
from .records import RefPackReader, RefPackWriter, write_refpack
from .synthetic import SyntheticBackend, make_record
from .transforms import (
    CLIP_MEAN,
    CLIP_STD,
    decode_image,
    decode_mask,
    get_transform_mats,
    inverse_warp_prediction,
    normalize_image,
    warp_image,
    warp_mask,
)

__all__ = [
    "SPLIT_SIZES",
    "RefDataset",
    "open_backend",
    "RefDataLoader",
    "RefPackReader",
    "RefPackWriter",
    "write_refpack",
    "SyntheticBackend",
    "make_record",
    "CLIP_MEAN",
    "CLIP_STD",
    "decode_image",
    "decode_mask",
    "get_transform_mats",
    "inverse_warp_prediction",
    "normalize_image",
    "warp_image",
    "warp_mask",
]
