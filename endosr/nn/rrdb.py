"""RRDBNet — ESRGAN generator (``RRDBNet_arch.py:8-72``).

Residual-in-residual dense blocks with ×0.2 residual scaling, nearest-
neighbor ×2×2 upsampling.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, leaky_relu
from endosr.ops.resize import interpolate_nearest

__all__ = ["RRDBNet", "RRDB", "ResidualDenseBlock5C"]


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype)
        x1 = leaky_relu(Conv(self.gc, 3, 1, 1, name="conv1", **kw)(x), 0.2)
        x2 = leaky_relu(Conv(self.gc, 3, 1, 1, name="conv2", **kw)(
            jnp.concatenate([x, x1], -1)), 0.2)
        x3 = leaky_relu(Conv(self.gc, 3, 1, 1, name="conv3", **kw)(
            jnp.concatenate([x, x1, x2], -1)), 0.2)
        x4 = leaky_relu(Conv(self.gc, 3, 1, 1, name="conv4", **kw)(
            jnp.concatenate([x, x1, x2, x3], -1)), 0.2)
        x5 = Conv(self.nf, 3, 1, 1, name="conv5", **kw)(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype)
        fea = Conv(self.nf, 3, 1, 1, name="conv_first", **kw)(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, self.dtype, name=f"RRDB_trunk_{i}")(trunk)
        trunk = Conv(self.nf, 3, 1, 1, name="trunk_conv", **kw)(trunk)
        fea = fea + trunk

        for name in ("upconv1", "upconv2"):
            fea = interpolate_nearest(fea, (fea.shape[1] * 2, fea.shape[2] * 2))
            fea = leaky_relu(Conv(self.nf, 3, 1, 1, name=name, **kw)(fea), 0.2)
        out = leaky_relu(Conv(self.nf, 3, 1, 1, name="HRconv", **kw)(fea), 0.2)
        return Conv(self.out_nc, 3, 1, 1, name="conv_last", **kw)(out).astype(jnp.float32)
