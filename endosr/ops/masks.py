"""Depth-range mask binning.

Converts a disparity/depth map into K binary masks, one per equal-width depth
bin — the reference computes these per-sample on the CPU dataloader side
(``LQGTker_Depth_dataset.py:204-226``). We provide a vectorized numpy version
for the host pipeline and a jittable JAX version so masks can also be built
on-device (one fused VPU pass instead of K full-image comparisons).

Semantics: bin i covers [min + i*Δ, min + (i+1)*Δ) with Δ=(max-min)/K.
Per the reference CODE (not its YAML comment, which is backwards):
``fixed_range=True`` → the fixed [0, 1] range; ``False`` → the image's own
min/max. Values ≥ max fall in no bin (the top bin is half-open) — preserved
exactly, including the image-min/max mode where the max pixel is unassigned.
Bin edges are computed in float32 arithmetic to match torch bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["depth_masks_np", "depth_masks", "pool_mask_np"]


def _lerp_resize_axis(m: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    """One axis of torch-bilinear (align_corners) resize as an explicit
    two-term fp32 lerp — arithmetic-identical to the matrix einsum the
    device path uses (a two-nonzero row dot is order-independent)."""
    in_len = m.shape[axis]
    if in_len == out_len:
        return m
    if out_len == 1:
        return np.take(m, [0], axis=axis)
    src = np.arange(out_len, dtype=np.float64) * (in_len - 1) / (out_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    f = (src - lo).astype(np.float32)
    shape = [1] * m.ndim
    shape[axis] = out_len
    f = f.reshape(shape)
    a = np.take(m, lo, axis=axis)
    b = np.take(m, hi, axis=axis)
    return (np.float32(1.0) - f) * a + f * b


def pool_mask_np(masks: np.ndarray, out_hw: tuple[int, int],
                 pad_hw: tuple[int, int] | None = None) -> np.ndarray:
    """Host twin of the RegionWiseAvgPooling mask resize (exact bucketed eval).

    ``masks``: [B, h, w, K] binary depth masks at the (unpadded) input
    resolution. Resized to ``out_hw`` — the encoder latent's VALID spatial
    size — with the same torch-bilinear align_corners interpolation +
    ≥0.5 binarization the device performs (``depthnet.region_wise_avg_pooling``,
    reference ``sftmd_arch.py:714-718``), then zero-padded to ``pad_hw``
    (the padded latent shape) so the padded pooling einsum excludes every
    garbage latent pixel and its denominator matches the unpadded run.
    """
    m = masks.astype(np.float32)
    if (m.shape[1], m.shape[2]) != tuple(out_hw):
        m = _lerp_resize_axis(m, out_hw[0], 1)
        m = _lerp_resize_axis(m, out_hw[1], 2)
        m = (m >= 0.5).astype(np.float32)
    if pad_hw is not None:
        ph, pw = pad_hw[0] - m.shape[1], pad_hw[1] - m.shape[2]
        if ph or pw:
            m = np.pad(m, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return m


def depth_masks_np(depth: np.ndarray, fixed_range: bool = True,
                   num_masks: int = 10) -> np.ndarray:
    """HW depth map → (H, W, K) float32 binary masks (NHWC-style, K last)."""
    depth = np.squeeze(depth).astype(np.float32)
    i = np.arange(num_masks)
    if fixed_range:
        # reference: python-float edges 0 + 0.1*i, cast to f32 at comparison
        interval = 1.0 / num_masks
        edges_lo = (interval * i).astype(np.float32)
        edges_hi = (interval * (i + 1)).astype(np.float32)
    else:
        min_val = depth.min()
        max_val = depth.max()
        interval = ((max_val - min_val) / np.float32(num_masks)).astype(np.float32)
        edges_lo = min_val + interval * i.astype(np.float32)
        edges_hi = min_val + interval * (i + 1).astype(np.float32)
    d = depth[..., None]
    masks = (d >= edges_lo) & (d < edges_hi)
    return masks.astype(np.float32)


def depth_masks(depth: jnp.ndarray, fixed_range: bool = True,
                num_masks: int = 10) -> jnp.ndarray:
    """JAX twin of :func:`depth_masks_np`; depth is (..., H, W) → (..., H, W, K)."""
    depth = depth.astype(jnp.float32)
    i = jnp.arange(num_masks, dtype=jnp.float32)
    if fixed_range:
        interval = np.float64(1.0) / num_masks
        lo = jnp.asarray((interval * np.arange(num_masks)).astype(np.float32))
        hi = jnp.asarray((interval * np.arange(1, num_masks + 1)).astype(np.float32))
        lo = jnp.broadcast_to(lo, depth.shape[:-2] + (1, 1, num_masks))
        hi = jnp.broadcast_to(hi, depth.shape[:-2] + (1, 1, num_masks))
    else:
        min_val = jnp.min(depth, axis=(-2, -1), keepdims=True)
        max_val = jnp.max(depth, axis=(-2, -1), keepdims=True)
        interval = (max_val - min_val) / jnp.float32(num_masks)
        lo = min_val[..., None] + interval[..., None] * i
        hi = min_val[..., None] + interval[..., None] * (i + 1.0)
    d = depth[..., None]
    return ((d >= lo) & (d < hi)).astype(jnp.float32)
