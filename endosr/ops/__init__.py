from endosr.ops.resize import (
    imresize,
    imresize_np,
    interpolate_bilinear,
    interpolate_nearest,
    resize_matrix,
)
from endosr.ops.color import bgr2ycbcr, channel_convert, modcrop, rgb2ycbcr, ycbcr2rgb
from endosr.ops.masks import depth_masks, depth_masks_np

__all__ = [
    "imresize",
    "imresize_np",
    "interpolate_bilinear",
    "interpolate_nearest",
    "resize_matrix",
    "rgb2ycbcr",
    "bgr2ycbcr",
    "ycbcr2rgb",
    "channel_convert",
    "modcrop",
    "depth_masks",
    "depth_masks_np",
]
