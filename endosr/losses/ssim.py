"""SSIM loss (1 − SSIM form used as a training objective).

Twin of ``codes/models/modules/ssim_loss.py`` / ``codes/pytorch_ssim``:
11×11 Gaussian window, per-channel grouped conv, SAME padding, [0,1] range.
"""

from __future__ import annotations

import jax.numpy as jnp

from endosr.metrics.psnr_ssim import ssim_jax

__all__ = ["ssim_loss", "ssim_value"]


def ssim_value(sr, hr, window_size: int = 11):
    """Mean SSIM over the batch (the reference's SSIM module with size_average)."""
    return jnp.mean(ssim_jax(sr, hr, window_size=window_size))


def ssim_loss(sr, hr, weight: float = 1.0, window_size: int = 11,
              one_minus: bool = False):
    """SSIM loss term.

    The reference adds ``w·SSIM`` straight into the total
    (``F_model_depthCond.py:178-180``) — note this *rewards* dissimilarity;
    it is gated off in every shipped config. We reproduce that wiring by
    default for parity and offer ``one_minus=True`` for the conventional
    ``w·(1 − SSIM)`` objective.
    """
    s = ssim_value(sr, hr, window_size)
    return weight * (1.0 - s) if one_minus else weight * s
