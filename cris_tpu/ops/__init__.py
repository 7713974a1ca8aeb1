from .attention import causal_mask, dot_product_attention
from .dynamic_conv import dynamic_conv2d
from .posenc import sincos_1d, sincos_2d
from .resize import avg_pool2d, resize2d, resize_weight_matrix, upsample2x

__all__ = [
    "causal_mask",
    "dot_product_attention",
    "dynamic_conv2d",
    "sincos_1d",
    "sincos_2d",
    "avg_pool2d",
    "resize2d",
    "resize_weight_matrix",
    "upsample2x",
]
