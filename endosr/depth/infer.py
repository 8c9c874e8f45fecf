"""Depth-map producer — twin of ``codes/depth_estimation/test_simple.py``.

Loads a pretrained monodepth2 encoder/decoder pair (torch ``.pth`` ported to
flax), runs every image in a folder through the jitted pipeline, and writes
the ``<name>_disp.npy`` files the SR datasets consume
(``test_simple.py:222-223``; shape [1,1,H,W]) plus optional colormapped
previews, and the 7-metric evaluation against GT depth when present.
"""

from __future__ import annotations

import os
import glob as globlib

import numpy as np

from endosr.metrics.depth import compute_depth_errors

__all__ = ["DepthPredictor", "run_folder"]


class DepthPredictor:
    def __init__(self, model_path: str, num_layers: int = 18):
        import jax
        import jax.numpy as jnp
        import torch

        from endosr.nn.monodepth import (
            DepthDecoder,
            ResnetEncoder,
            port_depth_decoder,
            port_resnet_encoder,
        )

        encoder_path = os.path.join(model_path, "encoder.pth")
        decoder_path = os.path.join(model_path, "depth.pth")
        enc_raw = torch.load(encoder_path, map_location="cpu", weights_only=False)
        self.feed_height = int(enc_raw["height"])
        self.feed_width = int(enc_raw["width"])
        enc_sd = {k: v.detach().numpy() for k, v in enc_raw.items()
                  if hasattr(v, "detach")}
        dec_raw = torch.load(decoder_path, map_location="cpu", weights_only=False)
        dec_sd = {k: v.detach().numpy() for k, v in dec_raw.items()}

        self.encoder = ResnetEncoder(num_layers=num_layers)
        self.decoder = DepthDecoder(num_ch_enc=tuple(self.encoder.num_ch_enc))
        dummy = jnp.zeros((1, self.feed_height, self.feed_width, 3), jnp.float32)
        enc_vars = self.encoder.init(jax.random.PRNGKey(0), dummy, train=False)
        self.enc_vars = port_resnet_encoder(enc_sd, enc_vars)
        feats = self.encoder.apply(self.enc_vars, dummy, train=False)
        dec_vars = self.decoder.init(jax.random.PRNGKey(0), feats)
        self.dec_vars = port_depth_decoder(dec_sd, dec_vars)

        @jax.jit
        def _forward(enc_vars, dec_vars, img):
            feats = self.encoder.apply(enc_vars, img, train=False)
            return self.decoder.apply(dec_vars, feats)[("disp", 0)]

        self._forward = _forward

    def predict_disp(self, image_rgb01: np.ndarray) -> np.ndarray:
        """HWC RGB [0,1] float → disparity [H,W] at feed resolution."""
        import cv2

        resized = cv2.resize(
            image_rgb01, (self.feed_width, self.feed_height),
            interpolation=cv2.INTER_LINEAR,
        )
        disp = self._forward(self.enc_vars, self.dec_vars,
                             resized[None].astype(np.float32))
        return np.asarray(disp)[0, :, :, 0]


def run_folder(image_path: str, model_path: str, output_dir: str | None = None,
               ext: str = "jpg", save_colormap: bool = True,
               min_depth: float = 0.1, max_depth: float = 100.0) -> list[str]:
    """Produce ``<stem>_disp.npy`` for every image (``test_simple.py:138-244``)."""
    import cv2

    from endosr.depth.layers import disp_to_depth

    pred = DepthPredictor(model_path)
    if os.path.isfile(image_path):
        paths = [image_path]
        out_dir = output_dir or os.path.dirname(image_path)
    else:
        paths = sorted(globlib.glob(os.path.join(image_path, f"*.{ext}")))
        if not paths:
            paths = sorted(
                p for p in globlib.glob(os.path.join(image_path, "*"))
                if p.lower().endswith((".jpg", ".jpeg", ".png"))
            )
        out_dir = output_dir or image_path
    os.makedirs(out_dir, exist_ok=True)

    written = []
    for p in paths:
        bgr = cv2.imread(p, cv2.IMREAD_COLOR)
        rgb = bgr[:, :, ::-1].astype(np.float32) / 255.0
        disp = pred.predict_disp(rgb)
        scaled_disp, _ = disp_to_depth(disp, min_depth, max_depth)
        stem = os.path.splitext(os.path.basename(p))[0]
        npy_path = os.path.join(out_dir, f"{stem}_disp.npy")
        np.save(npy_path, np.asarray(scaled_disp)[None, None])
        written.append(npy_path)
        if save_colormap:
            d = np.asarray(disp)
            vmax = np.percentile(d, 95)
            norm = np.clip(d / max(vmax, 1e-8), 0, 1)
            cm = cv2.applyColorMap((norm * 255).astype(np.uint8),
                                   cv2.COLORMAP_MAGMA)
            cv2.imwrite(os.path.join(out_dir, f"{stem}_disp.jpeg"), cm)
    return written


def evaluate_against_gt(pred_depths: list[np.ndarray],
                        gt_depths: list[np.ndarray],
                        median_scaling: bool = True) -> dict[str, float]:
    """Aggregate 7-metric depth eval with optional median scaling
    (``evaluate_depth.py`` protocol)."""
    accum = []
    for pred, gt in zip(pred_depths, gt_depths):
        mask = gt > 0
        p, g = pred[mask], gt[mask]
        if median_scaling:
            p = p * np.median(g) / np.median(p)
        accum.append(compute_depth_errors(g, p))
    return {k: float(np.mean([a[k] for a in accum])) for k in accum[0]}
