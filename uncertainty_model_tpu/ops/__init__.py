"""Numerics kernel layer.

These are the hard-parity primitives identified in SURVEY.md §2.2: every op
here is golden-tested against the corresponding torch op used by the
reference (``F.grid_sample``, ``F.interpolate(align_corners=True)``,
``AvgPool2d``, reflect/replicate padding, ``PixelShuffle``).

All ops take NHWC arrays (TPU-native layout).
"""

from .resize import resize_bilinear, scale_pyramid
from .warp import (
    warp_by_disparity,
    reconstruct_left_image,
    reconstruct_right_image,
    reconstruct_pyramid,
    reconstruct_pyramid_with_lr,
    reconstruct_stereo_with_lr,
)
from .pool import avg_pool2d, global_avg_pool
from .pad import pad2d
from .conv import conv2d, reflect_conv2d
from .shuffle import pixel_shuffle
from .s2d import depth_to_space, s2d_bias, s2d_conv_kernel, space_to_depth

__all__ = [
    "resize_bilinear",
    "scale_pyramid",
    "warp_by_disparity",
    "reconstruct_left_image",
    "reconstruct_right_image",
    "reconstruct_pyramid",
    "reconstruct_pyramid_with_lr",
    "reconstruct_stereo_with_lr",
    "avg_pool2d",
    "global_avg_pool",
    "pad2d",
    "conv2d",
    "reflect_conv2d",
    "pixel_shuffle",
    "space_to_depth",
    "depth_to_space",
    "s2d_conv_kernel",
    "s2d_bias",
]
