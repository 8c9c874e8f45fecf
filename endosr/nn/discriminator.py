"""SRGAN discriminator — Discriminator_VGG_128 (``discriminator_vgg_arch.py:6-59``).

VGG-style 128px discriminator: 3×3 conv + 4×2 strided conv pairs with
BatchNorm, two dense heads. BatchNorm uses batch statistics during training
(flax mutable 'batch_stats' collection carries the running averages, the
analog of torch's running_mean/var).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, Dense, leaky_relu

__all__ = ["DiscriminatorVGG128"]


class DiscriminatorVGG128(nn.Module):
    in_nc: int = 3
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(dtype=self.dtype)

        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name,
            )(h)

        nf = self.nf
        fea = leaky_relu(Conv(nf, 3, 1, 1, name="conv0_0", **kw)(x), 0.2)
        fea = leaky_relu(bn(Conv(nf, 4, 2, 1, use_bias=False,
                                 name="conv0_1", **kw)(fea), "bn0_1"), 0.2)
        for i, mult in enumerate((2, 4, 8, 8), start=1):
            fea = leaky_relu(bn(Conv(nf * mult, 3, 1, 1, use_bias=False,
                                     name=f"conv{i}_0", **kw)(fea), f"bn{i}_0"), 0.2)
            fea = leaky_relu(bn(Conv(nf * mult, 4, 2, 1, use_bias=False,
                                     name=f"conv{i}_1", **kw)(fea), f"bn{i}_1"), 0.2)

        # torch flattens NCHW (C,H,W); transpose so ported Linear weights line up
        b = fea.shape[0]
        fea = fea.transpose(0, 3, 1, 2).reshape(b, -1)
        fea = leaky_relu(Dense(100, name="linear1", **kw)(fea), 0.2)
        return Dense(1, name="linear2", **kw)(fea).astype(jnp.float32)
