"""PSNR / SSIM, MATLAB-conformant.

``calculate_psnr`` / ``calculate_ssim`` are numpy twins of the reference's
offline scorers (``codes/utils/util.py:646-697``, ``metrics/
calculate_PSNR_SSIM.py``): inputs in [0, 255], Gaussian 11×11 σ=1.5 window,
valid-region crop.

``psnr_jax`` / ``ssim_jax`` are batched, jittable versions for on-device
validation-during-training — the analog of the reference's ``pytorch_ssim``
package (``codes/pytorch_ssim/__init__.py``): [0, 1] range, SAME padding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["calculate_psnr", "calculate_ssim", "psnr_jax", "ssim_jax"]


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR of two [0, 255] images (any shape)."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # cv2.getGaussianKernel-equivalent 1-D kernel, outer-producted to 2-D.
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = k / k.sum()
    return np.outer(k, k)


def _filter2d_valid(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Per-channel 2-D correlation, valid region (crop (k//2) border after)."""
    kh, kw = window.shape
    h, w = img.shape[:2]
    out_h, out_w = h - kh + 1, w - kw + 1
    # im2col via stride tricks — fast enough for offline scoring.
    from numpy.lib.stride_tricks import sliding_window_view

    if img.ndim == 2:
        patches = sliding_window_view(img, (kh, kw))
        return np.einsum("hwkl,kl->hw", patches, window)
    patches = sliding_window_view(img, (kh, kw), axis=(0, 1))
    return np.einsum("hwckl,kl->hwc", patches, window)


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM of two [0, 255] images, MATLAB protocol (valid region)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = _gaussian_window(11, 1.5)

    mu1 = _filter2d_valid(img1, window)
    mu2 = _filter2d_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _filter2d_valid(img1 ** 2, window) - mu1_sq
    sigma2_sq = _filter2d_valid(img2 ** 2, window) - mu2_sq
    sigma12 = _filter2d_valid(img1 * img2, window) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-conformant SSIM of [0, 255] images (HW, HW1, or HWC)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            # The reference averages the 3-channel map directly.
            return _ssim_single(img1, img2)
        if img1.shape[2] == 1:
            return _ssim_single(img1[..., 0], img2[..., 0])
    raise ValueError("Wrong input image dimensions.")


# ---------------------------------------------------------------------------
# Jittable on-device versions (pytorch_ssim protocol) for validation loops
# ---------------------------------------------------------------------------


def psnr_jax(img1: jax.Array, img2: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Batched PSNR over all non-batch axes; inputs in [0, max_val]."""
    axes = tuple(range(1, img1.ndim))
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2, axis=axes)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim_jax(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """pytorch_ssim-equivalent SSIM, NHWC [0, 1] inputs, per-batch scalars.

    SAME (zero) padding and per-channel Gaussian filtering, matching the
    reference's train-time SSIM (``codes/pytorch_ssim/__init__.py``).
    """
    window = jnp.asarray(_gaussian_window(window_size, 1.5), dtype=jnp.float32)
    c = img1.shape[-1]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, grouped

    def blur(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = blur(img1 ** 2) - mu1_sq
    sigma2_sq = blur(img2 ** 2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))
