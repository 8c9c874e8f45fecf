"""VGG perceptual losses.

* :class:`VGGDepthLoss` — twin of ``codes/models/vgg_extractor/
  vgg_depth_loss.py:4-37`` + ``vggnet.py:35-59``: multi-tap frozen VGG
  features (ImageNet normalization), per-layer weighted L1/L2/CB on the
  flattened activations.
* :class:`PerceptualLoss` — the SRGAN-style single-tap feature loss using
  ``VGGFeatureExtractor`` (``networks.py:75-86`` + ``SRGAN_model.py``).

Pretrained VGG weights are external (no egress); pass ``vgg_weights_path``
(a torchvision ``.pth``) or construction fails with a clear error.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from endosr.losses.basic import charbonnier_loss, l1_loss, l2_loss
from endosr.nn.vgg import VGGFeatures, load_vgg_params

__all__ = ["VGGDepthLoss", "PerceptualLoss"]

_CRITERIA = {"l1": l1_loss, "l2": l2_loss, "cb": charbonnier_loss}


def _build_vgg(cfg: str, taps, max_layer, weights_path: str | None):
    model = VGGFeatures(cfg=cfg, taps=tuple(taps), max_layer=max_layer,
                        use_input_norm=True)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    if weights_path:
        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"VGG weights not found at {weights_path} (torchvision vgg "
                "checkpoints are external downloads in this image)"
            )
        params = load_vgg_params(weights_path, variables["params"])
        variables = {"params": params}
    return model, variables


class VGGDepthLoss:
    def __init__(self, opt):
        self.layers = [int(x) for x in opt["vgg_layers"]]
        self.weights = [float(w) for w in opt["vgg_weight"]]
        self.cri = _CRITERIA[opt["vgg_criterion"]]
        self.model, self.variables = _build_vgg(
            opt.get("vgg_type", "vgg19"), self.layers, max(self.layers),
            opt.get("vgg_weights_path"),
        )

    def __call__(self, preds, targs):
        pf = self.model.apply(self.variables, preds)
        tf = [jax.lax.stop_gradient(t)
              for t in self.model.apply(self.variables, jax.lax.stop_gradient(targs))]
        losses = [
            self.weights[i] * self.cri(pf[i].reshape(pf[i].shape[0], -1),
                                       tf[i].reshape(tf[i].shape[0], -1))
            for i in range(len(pf))
        ]
        return sum(losses), losses


class PerceptualLoss:
    """Single-tap VGG19-layer-34 feature loss (SRGAN's ``l_fea``)."""

    def __init__(self, criterion: str = "l1", weight: float = 1.0,
                 vgg_weights_path: str | None = None, feature_layer: int = 34):
        self.cri = _CRITERIA[criterion]
        self.weight = weight
        self.model, self.variables = _build_vgg(
            "vgg19", (feature_layer,), feature_layer, vgg_weights_path
        )

    def __call__(self, fake, real):
        f = self.model.apply(self.variables, fake)[0]
        r = jax.lax.stop_gradient(
            self.model.apply(self.variables, jax.lax.stop_gradient(real))[0]
        )
        return self.weight * self.cri(f, r)
