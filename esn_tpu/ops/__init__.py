from .convolution import conv2d, conv2d_transpose, depthwise_conv2d, conv_output_size
from .pooling import (max_pool2d, avg_pool2d, max_pool2d_with_indices_2x2,
                      max_unpool2d_2x2, global_avg_pool, adaptive_avg_pool2d)
from .classify import argmax_lastdim
from .resize import resize_bilinear, resize_nearest, upsample2x_bilinear

__all__ = [
    "conv2d", "conv2d_transpose", "depthwise_conv2d", "conv_output_size",
    "max_pool2d", "avg_pool2d", "max_pool2d_with_indices_2x2",
    "max_unpool2d_2x2", "global_avg_pool", "adaptive_avg_pool2d",
    "resize_bilinear", "resize_nearest", "upsample2x_bilinear",
    "argmax_lastdim",
]
