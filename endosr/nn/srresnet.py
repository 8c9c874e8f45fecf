"""MSRResNet — BasicSR's modified SRResNet (``SRResNet_arch.py:7-54``).

Residual trunk of no-BN blocks + PixelShuffle upsampling + a bilinear
upsampled global skip from the input.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, leaky_relu, pixel_shuffle
from endosr.ops.resize import interpolate_bilinear

__all__ = ["MSRResNet", "ResidualBlockNoBN"]


def scaled_conv_init(fan_in: int, scale: float = 0.1):
    """kaiming_normal(fan_in) × scale — ``module_util.initialize_weights``."""
    std = (2.0 / fan_in) ** 0.5 * scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv + residual, 0.1-scaled kaiming init
    (``module_util.py:34-52``)."""

    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = self.nf * 9
        h = Conv(self.nf, 3, 1, 1, name="conv1", dtype=self.dtype)(x)
        h = Conv(self.nf, 3, 1, 1, name="conv2", dtype=self.dtype)(nn.relu(h))
        return x + h


class MSRResNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype)
        fea = leaky_relu(Conv(self.nf, 3, 1, 1, name="conv_first", **kw)(x), 0.1)
        out = fea
        for i in range(self.nb):
            out = ResidualBlockNoBN(nf=self.nf, name=f"recon_trunk_{i}",
                                    dtype=self.dtype)(out)

        if self.upscale == 4:
            out = leaky_relu(pixel_shuffle(
                Conv(self.nf * 4, 3, 1, 1, name="upconv1", **kw)(out), 2), 0.1)
            out = leaky_relu(pixel_shuffle(
                Conv(self.nf * 4, 3, 1, 1, name="upconv2", **kw)(out), 2), 0.1)
        elif self.upscale in (2, 3):
            r = self.upscale
            out = leaky_relu(pixel_shuffle(
                Conv(self.nf * r * r, 3, 1, 1, name="upconv1", **kw)(out), r), 0.1)

        out = leaky_relu(Conv(self.nf, 3, 1, 1, name="HRconv", **kw)(out), 0.1)
        out = Conv(self.out_nc, 3, 1, 1, name="conv_last", **kw)(out)
        base = interpolate_bilinear(
            x, (x.shape[1] * self.upscale, x.shape[2] * self.upscale),
            align_corners=False,
        )
        return (out + base.astype(out.dtype)).astype(jnp.float32)
