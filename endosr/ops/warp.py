"""Optical-flow warping and the DUF Gaussian downsampler.

Twins of ``codes/models/modules/module_util.py:55-79`` (``flow_warp``: build
the identity grid, add flow, normalize, bilinear grid-sample) and
``codes/utils/util.py:608-639`` (``DUF_downsample``: 13×13 Gaussian blur +
strided sampling of video frames).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from endosr.depth.layers import grid_sample

__all__ = ["flow_warp", "duf_downsample"]


def flow_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp NHWC ``x`` by per-pixel flow [B,H,W,2] (x-then-y displacement)."""
    b, h, w, _ = x.shape
    xx, yy = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    grid = jnp.asarray(np.stack([xx, yy], -1), jnp.float32)  # [H,W,2]
    vgrid = grid[None] + flow
    # normalize with the reference's 2·v/max(dim−1,1) − 1 convention
    gx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    # torch grid_sample default align_corners changed across versions; the
    # reference (torch 1.6) uses align_corners=False semantics
    return grid_sample(x, jnp.stack([gx, gy], axis=-1))


def _gkern(kernlen: int = 13, nsig: float = 1.6) -> np.ndarray:
    """Gaussian-filtered delta, like scipy.ndimage.gaussian_filter on a dirac."""
    from scipy import ndimage  # available through jax's scipy dep chain

    inp = np.zeros((kernlen, kernlen))
    inp[kernlen // 2, kernlen // 2] = 1
    return ndimage.gaussian_filter(inp, nsig)


def duf_downsample(x: jax.Array, scale: int = 4) -> jax.Array:
    """[B,T,H,W,C] frames → Gaussian-blurred, ×scale-strided downsample."""
    assert scale in (2, 3, 4), f"Scale [{scale}] is not supported"
    b, t, h, w, c = x.shape
    xf = x.reshape(b * t, h, w, c)
    pad = 6 + scale * 2
    r_h = (3 - h % 3) % 3 if scale == 3 else 0
    r_w = (3 - w % 3) % 3 if scale == 3 else 0
    xf = jnp.pad(xf, ((0, 0), (pad, pad + r_h), (pad, pad + r_w), (0, 0)),
                 mode="reflect")
    k = jnp.asarray(_gkern(13, 0.4 * scale), jnp.float32)
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        xf, kern, (scale, scale), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    y = y[:, 2:-2, 2:-2, :]
    return y.reshape(b, t, y.shape[1], y.shape[2], c)
