from endosr.metrics.psnr_ssim import (
    calculate_psnr,
    calculate_ssim,
    psnr_jax,
    ssim_jax,
)
from endosr.metrics.depth import compute_depth_errors

__all__ = [
    "calculate_psnr",
    "calculate_ssim",
    "psnr_jax",
    "ssim_jax",
    "compute_depth_errors",
]
