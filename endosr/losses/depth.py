"""Frozen-monodepth2 depth-consistency loss.

Twin of ``codes/models/depth_estimator/depth_loss.py:9-76``: run SR and HR
images through a frozen ResNet-18 encoder + DepthDecoder (ported from the
reference's ``codes/pretrained_model/{encoder,depth}.pth``), bilinear-resize
both to the checkpoint's feed size, and compare the 4 disparity scales with
per-scale weighted L1/L2/CB.

The checkpoints are external artifacts (``.MISSING_LARGE_BLOBS``); this
module loads them from ``pretrained_model_path`` at construction. Inference
runs with the frozen running BatchNorm statistics, all inside the jitted
train step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from endosr.losses.basic import charbonnier_loss, l1_loss, l2_loss
from endosr.nn.monodepth import (
    DepthDecoder,
    ResnetEncoder,
    port_depth_decoder,
    port_resnet_encoder,
)
from endosr.ops.resize import interpolate_bilinear

__all__ = ["DepthEstimatorLoss"]

_CRITERIA = {"l1": l1_loss, "l2": l2_loss, "cb": charbonnier_loss}


class DepthEstimatorLoss:
    def __init__(self, opt):
        self.cri = _CRITERIA[opt["depth_criterion"]]
        self.weights = [float(w) for w in opt["depth_weight"]]

        model_path = opt["pretrained_model_path"]
        encoder_path = os.path.join(model_path, "encoder.pth")
        decoder_path = os.path.join(model_path, "depth.pth")
        if not (os.path.exists(encoder_path) and os.path.exists(decoder_path)):
            raise FileNotFoundError(
                "depth loss enabled but monodepth2 checkpoints not found at "
                f"{model_path} (encoder.pth/depth.pth are external downloads, "
                "see reference .MISSING_LARGE_BLOBS)"
            )

        from endosr.utils.port_torch import load_torch_state_dict
        import torch

        enc_sd_raw = torch.load(encoder_path, map_location="cpu", weights_only=False)
        self.feed_height = int(enc_sd_raw["height"])
        self.feed_width = int(enc_sd_raw["width"])
        enc_sd = {k: v.detach().numpy() for k, v in enc_sd_raw.items()
                  if hasattr(v, "detach")}
        dec_sd = load_torch_state_dict(decoder_path)

        self.encoder = ResnetEncoder(num_layers=18)
        self.decoder = DepthDecoder(num_ch_enc=tuple(self.encoder.num_ch_enc))

        dummy = jnp.zeros((1, self.feed_height, self.feed_width, 3), jnp.float32)
        enc_vars = self.encoder.init(jax.random.PRNGKey(0), dummy, train=False)
        self.enc_vars = port_resnet_encoder(enc_sd, enc_vars)
        feats = self.encoder.apply(self.enc_vars, dummy, train=False)
        dec_vars = self.decoder.init(jax.random.PRNGKey(0), feats)
        self.dec_vars = port_depth_decoder(dec_sd, dec_vars)

    def get_depth_feature(self, image):
        resized = interpolate_bilinear(
            image, (self.feed_height, self.feed_width), align_corners=False
        )
        feats = self.encoder.apply(self.enc_vars, resized, train=False)
        outputs = self.decoder.apply(self.dec_vars, feats)
        return [outputs[("disp", i)] for i in range(4)]

    def __call__(self, sr_img, hr_img):
        sr_disp = self.get_depth_feature(sr_img)
        hr_disp = [jax.lax.stop_gradient(d)
                   for d in self.get_depth_feature(jax.lax.stop_gradient(hr_img))]
        losses = [
            self.weights[i] * self.cri(sr_disp[i], hr_disp[i]) for i in range(4)
        ]
        return sum(losses), losses, sr_disp, hr_disp
