"""Shape/smoke tests for every generator family + D + FCN + factory dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNG = np.random.default_rng(3)
KEY = jax.random.PRNGKey(0)


def _img(b=1, h=16, w=16, c=3):
    return jnp.asarray(RNG.random((b, h, w, c), dtype=np.float32))


def test_predictor_corrector_shapes():
    from endosr.nn.sftmd import Corrector, Predictor

    p = Predictor(code_len=10)
    x = _img()
    params = p.init(KEY, x)["params"]
    code = p.apply({"params": params}, x)
    assert code.shape == (1, 10)

    c = Corrector(code_len=10)
    params = c.init(KEY, x, code)["params"]
    out = c.apply({"params": params}, x, code)
    assert out.shape == (1, 10)
    res = c.apply({"params": params}, x, code, res=True)
    assert res.shape == (1, 10)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_sftmd_kernel_shapes(scale):
    from endosr.nn.sftmd import SFTMD

    net = SFTMD(nb=2, scale=scale)
    x = _img(h=8, w=8)
    code = jnp.zeros((1, 10))
    params = net.init(KEY, x, code)["params"]
    out = net.apply({"params": params}, x, code)
    assert out.shape == (1, 8 * scale, 8 * scale, 3)


def test_sftmd_demo_shape():
    from endosr.nn.sftmd import SFTMDDemo

    net = SFTMDDemo(nb=2, scale=2)
    x = _img(h=8, w=8)
    code = jnp.zeros((1, 10))
    params = net.init(KEY, x, code)["params"]
    out = net.apply({"params": params}, x, code, clip=True)
    assert out.shape == (1, 16, 16, 3)


@pytest.mark.parametrize("upscale", [2, 3, 4])
def test_msrresnet_shapes(upscale):
    from endosr.nn.srresnet import MSRResNet

    net = MSRResNet(nb=2, upscale=upscale)
    x = _img(h=8, w=8)
    params = net.init(KEY, x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 8 * upscale, 8 * upscale, 3)


def test_rrdbnet_shape():
    from endosr.nn.rrdb import RRDBNet

    net = RRDBNet(nb=1)
    x = _img(h=8, w=8)
    params = net.init(KEY, x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 32, 32, 3)  # fixed x4 (nearest x2 x2)


def test_discriminator_shape():
    from endosr.nn.discriminator import DiscriminatorVGG128

    net = DiscriminatorVGG128()
    x = _img(b=2, h=128, w=128)
    variables = net.init(KEY, x, train=True)
    out, _ = net.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 1)


def test_fcn_variants_shapes():
    from endosr.nn.fcn import FCN8s, FCN16s, FCN32s, FCNs

    x = _img(h=32, w=32)
    for cls in (FCN8s, FCN16s, FCN32s, FCNs):
        net = cls(n_class=2)
        variables = net.init(KEY, x, train=True)
        out, _ = net.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (1, 32, 32, 2), cls.__name__


def test_sftmd_variants_shapes():
    from endosr.nn.sftmd_variants import (
        SFTMDNoKernel,
        SFTMDUpscaleAfterResBlk,
        SFTMDUpscaleAfterResBlkDepth,
        SFTMDUpscaleAfterResBlkDepthCondition,
    )

    x = _img(h=8, w=8)
    depth = jnp.asarray(RNG.random((1, 8, 8, 1), dtype=np.float32))

    net = SFTMDUpscaleAfterResBlk(nb=6)
    params = net.init(KEY, x)["params"]
    assert net.apply({"params": params}, x).shape == (1, 64, 64, 3)

    net = SFTMDUpscaleAfterResBlkDepthCondition(which_resblk_depth=(0, 4, 5), nb=6)
    params = net.init(KEY, x, depth)["params"]
    assert net.apply({"params": params}, x, depth).shape == (1, 64, 64, 3)

    net = SFTMDUpscaleAfterResBlkDepth(nb=6, n_depth_resblk=3, pred_depth=True)
    params = net.init(KEY, x, depth)["params"]
    out, d4, d2 = net.apply({"params": params}, x, depth)
    assert out.shape == (1, 64, 64, 3)
    assert d4.shape == (1, 16, 16, 1)
    assert d2.shape == (1, 32, 32, 1)

    for scale in (2, 4, 8):
        net = SFTMDNoKernel(nb=2, scale=scale)
        params = net.init(KEY, x)["params"]
        assert net.apply({"params": params}, x).shape == (1, 8 * scale, 8 * scale, 3)


def test_position_attention_shapes():
    from endosr.nn.sftmd_variants import PositionAttention, PositionAttentionEfficient

    x = _img(h=8, w=8, c=16)
    depth = jnp.asarray(RNG.random((1, 8, 8, 1), dtype=np.float32))
    for cls in (PositionAttention, PositionAttentionEfficient):
        net = cls(16)
        params = net.init(KEY, x, depth)["params"]
        out = net.apply({"params": params}, x, depth)
        assert out.shape == (1, 8, 8, 16), cls.__name__


def test_define_g_dispatch():
    from endosr.nn.networks import define_G

    base = {
        "is_train": True, "scale": 4,
        "datasets": {"train": {"depthMaskNum": 10}},
    }
    for name in ("DepthNet", "SFTMD", "SFTMD_kernel", "SFTMD_DEMO",
                 "SFTMD_upsacle_after_ResBlk", "SFTMD_upsacle_after_ResBlk_depth",
                 "SFTMD_upsacle_after_ResBlk_depth_condition",
                 "Predictor", "Corrector", "MSRResNet", "RRDBNet"):
        opt = dict(base)
        opt["network_G"] = {"which_model_G": name, "nb": 2,
                            "which_ResBlk_depth": [0], "depth_latent_ch": 16}
        net = define_G(opt)
        assert net is not None, name
