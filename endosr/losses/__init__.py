from endosr.losses.basic import (
    charbonnier_loss,
    gan_loss,
    gradient_penalty,
    l1_loss,
    l2_loss,
    smooth_l1_loss,
    pixel_loss,
)
from endosr.losses.mask import dynamic_weight_mask_loss, mask_loss
from endosr.losses.ssim import ssim_loss

__all__ = [
    "l1_loss",
    "l2_loss",
    "charbonnier_loss",
    "smooth_l1_loss",
    "pixel_loss",
    "gan_loss",
    "gradient_penalty",
    "mask_loss",
    "dynamic_weight_mask_loss",
    "ssim_loss",
]
