"""Network factory — twin of ``codes/models/networks.py``.

``define_G`` dispatches on ``which_model_G``; returns an (un-initialized)
flax module. The DepthNet branch reads ``depthMaskNum`` from the train/test
dataset block like the reference (``networks.py:42-47``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["define_G", "define_D", "define_F", "define_SegNet"]


def _dataset_block(opt):
    ds = opt.get("datasets") or {}
    if opt.get("is_train") and "train" in ds:
        return ds["train"]
    for k in ("test_1", "test", "val"):
        if k in ds:
            return ds[k]
    return next(iter(ds.values())) if ds else {}


def define_G(opt, dtype=jnp.float32, modulation_dtype=None,
             centered_convs=0):
    opt_net = opt["network_G"]
    which_model = opt_net["which_model_G"]
    scale = opt.get("scale") or opt_net.get("scale") or opt_net.get("upscale", 4)

    if which_model == "DepthNet":
        from endosr.nn.depthnet import DEPTHNET_PRESETS, DepthNet

        ds = _dataset_block(opt)
        # ``network_G.preset``: a named, measured knob combination
        # (depthnet.DEPTHNET_PRESETS) instead of hand-picked serving flags
        preset = opt_net.get("preset")
        kwargs = dict(
            which_resblk_depth=tuple(opt_net.get("which_ResBlk_depth") or ()),
            in_nc=opt_net.get("in_nc", 3),
            out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64),
            nb=opt_net.get("nb", 16),
            scale=int(scale),
            depth_latent_ch=opt_net.get("depth_latent_ch") or 256,
            depth_range_num=ds.get("depthMaskNum") or 10,
            use_trainable_params=bool(
                opt_net.get("use_trainable_params", True)
            ),
            norm_gamma=float(opt_net.get("norm_gamma") or 0.0),
            norm_beta=float(opt_net.get("norm_beta") or 0.0),
            ablate_depth_matrix=bool(opt_net.get("ablate_depth_matrix", False)),
            ablate_depth_block=bool(opt_net.get("ablate_depth_block", False)),
            remat_blocks=bool(opt_net.get("remat_blocks", False)),
            modulation_dtype=modulation_dtype,
            centered_convs=int(centered_convs),
            dtype=dtype,
        )
        if preset:
            if preset not in DEPTHNET_PRESETS:
                raise ValueError(
                    f"Unknown DepthNet preset [{preset}]; available: "
                    f"{sorted(DEPTHNET_PRESETS)}")
            kwargs.update(DEPTHNET_PRESETS[preset])
        # ``network_G.net_kw``: raw DepthNet field overrides (execution
        # knobs like obranch_body / tail_defer_act / packed_tail), applied
        # LAST so a YAML can pin any lowering choice over a preset.
        kwargs.update(opt_net.get("net_kw") or {})
        return DepthNet(**kwargs)
    if which_model == "SFTMD":
        # the reference maps 'SFTMD' to the kernel-free variant
        # (``networks.py:29-31``); the kernel-conditioned SFTMD is available
        # as which_model_G: SFTMD_kernel
        from endosr.nn.sftmd_variants import SFTMDNoKernel

        return SFTMDNoKernel(
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16),
            scale=int(scale), dtype=dtype,
        )
    if which_model == "SFTMD_kernel":
        from endosr.nn.sftmd import SFTMD

        return SFTMD(
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16),
            scale=int(scale), input_para=opt_net.get("code_length", 10),
            dtype=dtype,
        )
    if which_model == "SFTMD_DEMO":
        from endosr.nn.sftmd import SFTMDDemo

        return SFTMDDemo(
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16),
            scale=int(scale), input_para=opt_net.get("code_length", 10),
            dtype=dtype,
        )
    if which_model == "SFTMD_upsacle_after_ResBlk":
        from endosr.nn.sftmd_variants import SFTMDUpscaleAfterResBlk

        return SFTMDUpscaleAfterResBlk(
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16), dtype=dtype,
        )
    if which_model == "SFTMD_upsacle_after_ResBlk_depth":
        from endosr.nn.sftmd_variants import SFTMDUpscaleAfterResBlkDepth

        return SFTMDUpscaleAfterResBlkDepth(
            pred_depth=bool(opt_net.get("predict_depth_map", False)),
            n_depth_resblk=opt_net.get("n_depthResBlk", 3),
            use_attention=bool(opt_net.get("use_attention", False)),
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16), dtype=dtype,
        )
    if which_model == "SFTMD_upsacle_after_ResBlk_depth_condition":
        from endosr.nn.sftmd_variants import (
            SFTMDUpscaleAfterResBlkDepthCondition,
        )

        return SFTMDUpscaleAfterResBlkDepthCondition(
            which_resblk_depth=tuple(opt_net.get("which_ResBlk_depth") or ()),
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16), dtype=dtype,
        )
    if which_model == "Predictor":
        from endosr.nn.sftmd import Predictor

        return Predictor(code_len=opt_net.get("code_length", 10), dtype=dtype)
    if which_model == "Corrector":
        from endosr.nn.sftmd import Corrector

        return Corrector(code_len=opt_net.get("code_length", 10), dtype=dtype)
    if which_model in ("MSRResNet", "SRResNet"):
        from endosr.nn.srresnet import MSRResNet

        return MSRResNet(
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 16),
            upscale=int(scale), dtype=dtype,
        )
    if which_model == "RRDBNet":
        from endosr.nn.rrdb import RRDBNet

        return RRDBNet(
            in_nc=opt_net.get("in_nc", 3), out_nc=opt_net.get("out_nc", 3),
            nf=opt_net.get("nf", 64), nb=opt_net.get("nb", 23), dtype=dtype,
        )
    raise NotImplementedError(f"Generator model [{which_model}] not recognized")


def define_D(opt, dtype=jnp.float32):
    opt_net = opt["network_D"]
    which_model = opt_net["which_model_D"]
    if which_model == "discriminator_vgg_128":
        from endosr.nn.discriminator import DiscriminatorVGG128

        return DiscriminatorVGG128(
            nf=opt_net.get("nf", 64), dtype=dtype,
        )
    raise NotImplementedError(f"Discriminator model [{which_model}] not recognized")


def define_F(opt, use_bn: bool = False, dtype=jnp.float32):
    """Frozen VGG feature extractor for perceptual loss (``networks.py:75-86``)."""
    from endosr.nn.vgg import VGGFeatureExtractor

    return VGGFeatureExtractor(feature_layer=34, use_input_norm=True, dtype=dtype)


def define_SegNet(opt, dtype=jnp.float32):
    from endosr.nn.fcn import FCN8s

    opt_net = opt.get("network_SegNet") or {}
    return FCN8s(n_class=opt_net.get("num_classes", 2), dtype=dtype)
