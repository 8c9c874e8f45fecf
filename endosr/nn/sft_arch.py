"""SFT-GAN architectures (``codes/models/modules/sft_arch.py``).

Segmentation-conditioned SFT generator (:8-71) and the auxiliary-classifier
discriminator ACD_VGG_BN_96 (:75-117), plus the torch-version variants
(:125-190) which differ in slope/ordering/upsampling.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, Dense, leaky_relu, pixel_shuffle
from endosr.ops.resize import interpolate_nearest

__all__ = ["SFTNet", "SFTNetTorch", "ACDVGGBN96"]


class _SFTGanLayer(nn.Module):
    slope: float = 0.1
    plus_one: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea, cond):
        kw = dict(dtype=self.dtype)
        scale = Conv(32, 1, 1, 0, name="SFT_scale_conv0", **kw)(cond)
        scale = Conv(64, 1, 1, 0, name="SFT_scale_conv1", **kw)(
            leaky_relu(scale, self.slope))
        shift = Conv(32, 1, 1, 0, name="SFT_shift_conv0", **kw)(cond)
        shift = Conv(64, 1, 1, 0, name="SFT_shift_conv1", **kw)(
            leaky_relu(shift, self.slope))
        if self.plus_one:
            return fea * (scale + 1) + shift
        return fea * scale + shift


class _ResBlockSFT(nn.Module):
    torch_variant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea, cond):
        kw = dict(dtype=self.dtype)
        slope = 0.01 if self.torch_variant else 0.1
        plus_one = not self.torch_variant
        h = _SFTGanLayer(slope, plus_one, name="sft0", dtype=self.dtype)(fea, cond)
        if self.torch_variant:
            h = Conv(64, 3, 1, 1, name="conv0", **kw)(nn.relu(h))
            h = _SFTGanLayer(slope, plus_one, name="sft1",
                             dtype=self.dtype)(h, cond)
            h = Conv(64, 3, 1, 1, name="conv1", **kw)(nn.relu(h))
        else:
            h = nn.relu(Conv(64, 3, 1, 1, name="conv0", **kw)(h))
            h = _SFTGanLayer(slope, plus_one, name="sft1",
                             dtype=self.dtype)(h, cond)
            h = Conv(64, 3, 1, 1, name="conv1", **kw)(h)
        return fea + h


class _CondNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seg):
        kw = dict(dtype=self.dtype)
        h = leaky_relu(Conv(128, 4, 4, 0, name="CondNet_0", **kw)(seg), 0.1)
        for i in (2, 4, 6):
            h = leaky_relu(Conv(128, 1, 1, 0, name=f"CondNet_{i}", **kw)(h), 0.1)
        return Conv(32, 1, 1, 0, name="CondNet_8", **kw)(h)


class SFTNet(nn.Module):
    """SFT-GAN generator: 16 SFT res-blocks conditioned on a 8-ch seg map."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, seg):
        kw = dict(dtype=self.dtype)
        cond = _CondNet(name="CondNet", dtype=self.dtype)(seg)
        fea = Conv(64, 3, 1, 1, name="conv0", **kw)(img)
        h = fea
        for i in range(16):
            h = _ResBlockSFT(name=f"sft_branch_{i}", dtype=self.dtype)(h, cond)
        h = _SFTGanLayer(0.1, True, name="sft_branch_16",
                         dtype=self.dtype)(h, cond)
        res = Conv(64, 3, 1, 1, name="sft_branch_17", **kw)(h)
        fea = fea + res
        h = nn.relu(pixel_shuffle(Conv(256, 3, 1, 1, name="HR_branch_0",
                                       **kw)(fea), 2))
        h = nn.relu(pixel_shuffle(Conv(256, 3, 1, 1, name="HR_branch_3",
                                       **kw)(h), 2))
        h = nn.relu(Conv(64, 3, 1, 1, name="HR_branch_6", **kw)(h))
        return Conv(3, 3, 1, 1, name="HR_branch_8", **kw)(h).astype(jnp.float32)


class SFTNetTorch(nn.Module):
    """Torch-version SFT-GAN: nearest-upsample HR branch, no (scale+1)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, seg):
        kw = dict(dtype=self.dtype)
        cond = _CondNet(name="CondNet", dtype=self.dtype)(seg)
        fea = Conv(64, 3, 1, 1, name="conv0", **kw)(img)
        h = fea
        for i in range(16):
            h = _ResBlockSFT(torch_variant=True, name=f"sft_branch_{i}",
                             dtype=self.dtype)(h, cond)
        h = _SFTGanLayer(0.01, False, name="sft_branch_16",
                         dtype=self.dtype)(h, cond)
        res = Conv(64, 3, 1, 1, name="sft_branch_17", **kw)(h)
        fea = fea + res
        h = interpolate_nearest(fea, (fea.shape[1] * 2, fea.shape[2] * 2))
        h = nn.relu(Conv(64, 3, 1, 1, name="HR_branch_1", **kw)(h))
        h = interpolate_nearest(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.relu(Conv(64, 3, 1, 1, name="HR_branch_4", **kw)(h))
        h = nn.relu(Conv(64, 3, 1, 1, name="HR_branch_6", **kw)(h))
        return Conv(3, 3, 1, 1, name="HR_branch_8", **kw)(h).astype(jnp.float32)


class ACDVGGBN96(nn.Module):
    """Aux-classifier discriminator: (gan logit, 8-way class logits)."""

    num_classes: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(dtype=self.dtype)

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32, name=name)(h)

        h = leaky_relu(Conv(64, 3, 1, 1, name="feature_0", **kw)(x), 0.1)
        h = leaky_relu(bn(Conv(64, 4, 2, 1, name="feature_2", **kw)(h),
                          "feature_3"), 0.1)
        specs = [(128, 3, 1, 5), (128, 4, 2, 8), (256, 3, 1, 11),
                 (256, 4, 2, 14), (512, 3, 1, 17), (512, 4, 2, 20)]
        for f, k, s, idx in specs:
            h = leaky_relu(bn(Conv(f, k, s, 1, name=f"feature_{idx}", **kw)(h),
                              f"feature_{idx + 1}"), 0.1)
        b = h.shape[0]
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)
        gan = Dense(100, name="gan_0", **kw)(h)
        gan = Dense(1, name="gan_2", **kw)(leaky_relu(gan, 0.1))
        cls = Dense(100, name="cls_0", **kw)(h)
        cls = Dense(self.num_classes, name="cls_2", **kw)(leaky_relu(cls, 0.1))
        return gan.astype(jnp.float32), cls.astype(jnp.float32)
