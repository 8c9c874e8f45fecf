"""FCN segmentation nets (FCN8s/16s/32s/FCNs) on a VGG backbone.

Twins of ``codes/models/modules/fcn.py:12-217``: VGG16 pool-tap backbone,
five 3×3 stride-2 ConvTranspose decoders (output_padding=1 ⇒ exact ×2) with
BatchNorm, 1×1 classifier head. Used by the depth+seg co-training model
(``F_model_depthSeg``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, torch_conv_init
from endosr.nn.vgg import VGG_CFGS

__all__ = ["VGGBackbone", "FCN8s", "FCN16s", "FCN32s", "FCNs"]


class _Deconv2x(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1): H → 2H exactly."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = self.features * 9
        w = self.param("kernel", torch_conv_init(fan_in),
                       (3, 3, in_ch, self.features), jnp.float32)
        b = self.param("bias", torch_conv_init(fan_in), (self.features,), jnp.float32)
        w = jnp.flip(w, axis=(0, 1))
        # lhs-dilated conv; output_padding=1 adds one extra row/col at the end
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=[(1, 2), (1, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class VGGBackbone(nn.Module):
    """VGG16 features emitting the five max-pool outputs x1..x5
    (``fcn.py:158-186``)."""

    cfg: str = "vgg16"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outputs = []
        idx = 0
        for v in VGG_CFGS[self.cfg]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                outputs.append(x)
                idx += 1
            else:
                x = nn.relu(
                    Conv(v, 3, 1, 1, name=f"features_{idx}", dtype=self.dtype)(x)
                )
                idx += 2
        return outputs  # [x1..x5]


class _FCNBase(nn.Module):
    n_class: int = 2
    dtype: Any = jnp.float32

    def _decoder(self, name):
        return _Deconv2x({"deconv1": 512, "deconv2": 256, "deconv3": 128,
                          "deconv4": 64, "deconv5": 32}[name],
                         dtype=self.dtype, name=name)

    def _bn(self, name, train):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32, name=name)


class FCN8s(_FCNBase):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x1, x2, x3, x4, x5 = VGGBackbone(dtype=self.dtype, name="pretrained_net")(x)
        score = nn.relu(self._decoder("deconv1")(x5))
        score = self._bn("bn1", train)(score + x4)
        score = nn.relu(self._decoder("deconv2")(score))
        score = self._bn("bn2", train)(score + x3)
        score = self._bn("bn3", train)(nn.relu(self._decoder("deconv3")(score)))
        score = self._bn("bn4", train)(nn.relu(self._decoder("deconv4")(score)))
        score = self._bn("bn5", train)(nn.relu(self._decoder("deconv5")(score)))
        return Conv(self.n_class, 1, 1, 0, name="classifier",
                    dtype=self.dtype)(score).astype(jnp.float32)


class FCN16s(_FCNBase):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x1, x2, x3, x4, x5 = VGGBackbone(dtype=self.dtype, name="pretrained_net")(x)
        score = nn.relu(self._decoder("deconv1")(x5))
        score = self._bn("bn1", train)(score + x4)
        score = self._bn("bn2", train)(nn.relu(self._decoder("deconv2")(score)))
        score = self._bn("bn3", train)(nn.relu(self._decoder("deconv3")(score)))
        score = self._bn("bn4", train)(nn.relu(self._decoder("deconv4")(score)))
        score = self._bn("bn5", train)(nn.relu(self._decoder("deconv5")(score)))
        return Conv(self.n_class, 1, 1, 0, name="classifier",
                    dtype=self.dtype)(score).astype(jnp.float32)


class FCN32s(_FCNBase):
    @nn.compact
    def __call__(self, x, train: bool = True):
        *_, x5 = VGGBackbone(dtype=self.dtype, name="pretrained_net")(x)
        score = x5
        for i, name in enumerate(
            ("deconv1", "deconv2", "deconv3", "deconv4", "deconv5"), start=1
        ):
            score = self._bn(f"bn{i}", train)(nn.relu(self._decoder(name)(score)))
        return Conv(self.n_class, 1, 1, 0, name="classifier",
                    dtype=self.dtype)(score).astype(jnp.float32)


class FCNs(_FCNBase):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x1, x2, x3, x4, x5 = VGGBackbone(dtype=self.dtype, name="pretrained_net")(x)
        skips = (x4, x3, x2, x1, None)
        score = x5
        for i, (name, skip) in enumerate(
            zip(("deconv1", "deconv2", "deconv3", "deconv4", "deconv5"), skips),
            start=1,
        ):
            score = self._bn(f"bn{i}", train)(nn.relu(self._decoder(name)(score)))
            if skip is not None:
                score = score + skip
        return Conv(self.n_class, 1, 1, 0, name="classifier",
                    dtype=self.dtype)(score).astype(jnp.float32)
