"""VGG feature stacks for perceptual losses and the FCN backbone.

* :class:`VGGFeatures` — torchvision-layout VGG features (conv names are the
  torch Sequential indices, so pretrained ``vgg19-*.pth`` state dicts port
  directly); returns activations at requested tap indices.
* :class:`VGGFeatureExtractor` — the SRGAN perceptual extractor (frozen
  VGG19 up to layer 34 with ImageNet input normalization,
  ``discriminator_vgg_arch.py:62-88``).

Pretrained weights are an external artifact (no egress in this image); load
them via ``endosr.utils.port_torch.load_torch_state_dict`` from a local
``.pth`` and pass through ``load_vgg_params``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv

__all__ = ["VGGFeatures", "VGGFeatureExtractor", "VGG_CFGS", "load_vgg_params"]

VGG_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGGFeatures(nn.Module):
    """VGG `features` trunk with torch-index naming and arbitrary taps.

    ``taps``: torch Sequential indices at which to emit activations (the
    activation *after* executing that layer index). If empty, returns the
    final feature map only.
    """

    cfg: str = "vgg19"
    taps: Sequence[int] = ()
    max_layer: int | None = None
    use_input_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std

        outputs = []
        idx = 0
        taps = set(self.taps)
        last = self.max_layer
        for v in VGG_CFGS[self.cfg]:
            if last is not None and idx > last:
                break
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if idx in taps:
                    outputs.append(x)
                idx += 1
            else:
                x = Conv(v, 3, 1, 1, name=f"features_{idx}", dtype=self.dtype)(x)
                if idx in taps:
                    outputs.append(x)
                idx += 1
                if last is not None and idx > last:
                    break
                x = nn.relu(x)
                if idx in taps:
                    outputs.append(x)
                idx += 1
        if taps:
            return outputs
        return x


class VGGFeatureExtractor(nn.Module):
    """Frozen VGG19-layer-34 extractor with ImageNet normalization."""

    feature_layer: int = 34
    use_input_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return VGGFeatures(
            cfg="vgg19", max_layer=self.feature_layer,
            use_input_norm=self.use_input_norm, dtype=self.dtype,
            name="vgg",
        )(x)


def load_vgg_params(pth_path: str, params_template, prefix: str = ""):
    """Port a torchvision VGG state dict into a VGGFeatures param tree."""
    from endosr.utils.port_torch import load_torch_state_dict, port_state_dict

    sd = load_torch_state_dict(pth_path)

    def key_fn(path):
        *mods, leaf = path
        segs = [s.replace("features_", "features.") for s in mods if s != "vgg"]
        leaf_t = {"kernel": "weight", "bias": "bias"}[leaf]
        return prefix + ".".join(segs + [leaf_t])

    return port_state_dict(sd, params_template, key_fn=key_fn)
