"""DepthNet ↔ reference parity.

Instantiates the reference torch DepthNet (random init), ports its state
dict through ``endosr.utils.port_torch``, and checks the full forward pass
matches at every supported scale. This simultaneously validates weight-norm
semantics, the ConvTranspose layout, SEAN's broadcast matmul, region-wise
pooling (bilinear+binarize), pixel-shuffle channel order, and the
scale-conditional wiring.
"""

import numpy as np
import pytest
import torch

from endosr.nn.depthnet import DepthNet
from endosr.ops.masks import depth_masks_np
from endosr.utils.port_torch import port_state_dict

from tests.conftest import requires_reference

RNG = np.random.default_rng(42)


def _make_inputs(b=1, h=16, w=16, k=10):
    lq = RNG.random((b, h, w, 3), dtype=np.float32)
    depth = RNG.random((b, h, w), dtype=np.float32)
    masks = np.stack([depth_masks_np(depth[i], True, k) for i in range(b)])
    return lq, depth[..., None].astype(np.float32), masks.astype(np.float32)


@requires_reference
@pytest.mark.parametrize("scale", [2, 3, 4, 8])
def test_depthnet_forward_matches_reference(reference_path, scale):
    from models.modules.sftmd_arch import DepthNet as TorchDepthNet

    which = list(range(14))
    torch.manual_seed(0)
    tnet = TorchDepthNet(
        which_ResBlk_depth=which, in_nc=3, out_nc=3, nf=64, nb=16, scale=scale,
        depth_latent_ch=64, depthRangeNum=10, norm_type="weight_norm",
        use_trainable_params=True,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    jnet = DepthNet(
        which_resblk_depth=tuple(which), scale=scale, depth_latent_ch=64,
        depth_range_num=10,
    )
    lq, depth, masks = _make_inputs()
    import jax

    params = jnet.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]
    params = port_state_dict(sd, params)

    got = np.asarray(jnet.apply({"params": params}, lq, depth, masks))

    with torch.no_grad():
        want = tnet(
            torch.from_numpy(lq).permute(0, 3, 1, 2),
            torch.from_numpy(depth).permute(0, 3, 1, 2),
            torch.from_numpy(masks).permute(0, 3, 1, 2),
        )
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (1, 16 * scale, 16 * scale, 3)
    assert np.max(np.abs(got - want)) < 2e-4


@requires_reference
def test_depthnet_post_upsample_depth_blocks(reference_path):
    # which_ResBlk_depth covering nb-2/nb-1 puts SEAN blocks AFTER the
    # upscales: masks get nearest-resized and the 32-ch path is exercised
    from models.modules.sftmd_arch import DepthNet as TorchDepthNet

    which = [0, 1, 13, 14, 15]
    torch.manual_seed(7)
    tnet = TorchDepthNet(
        which_ResBlk_depth=which, scale=8, depth_latent_ch=32,
        depthRangeNum=10, norm_type="weight_norm",
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    jnet = DepthNet(which_resblk_depth=tuple(which), scale=8,
                    depth_latent_ch=32)
    lq, depth, masks = _make_inputs(h=8, w=8)
    import jax

    params = jnet.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]
    params = port_state_dict(sd, params)
    got = np.asarray(jnet.apply({"params": params}, lq, depth, masks))
    with torch.no_grad():
        want = tnet(
            torch.from_numpy(lq).permute(0, 3, 1, 2),
            torch.from_numpy(depth).permute(0, 3, 1, 2),
            torch.from_numpy(masks).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (1, 64, 64, 3)
    assert np.max(np.abs(got - want)) < 3e-4


@requires_reference
def test_depthnet_baseline_and_trainable_off(reference_path):
    # baseline (no depth blocks) + fixed alpha path
    from models.modules.sftmd_arch import DepthNet as TorchDepthNet

    torch.manual_seed(1)
    tnet = TorchDepthNet(
        which_ResBlk_depth=[], scale=4, depth_latent_ch=32,
        norm_type="weight_norm", use_trainable_params=False,
        norm_gamma=0.3, norm_beta=0.7,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    jnet = DepthNet(which_resblk_depth=(), scale=4, depth_latent_ch=32,
                    use_trainable_params=False, norm_gamma=0.3, norm_beta=0.7)
    lq, depth, masks = _make_inputs()
    import jax

    params = jnet.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]
    params = port_state_dict(sd, params)
    got = np.asarray(jnet.apply({"params": params}, lq, depth, masks))
    with torch.no_grad():
        want = tnet(
            torch.from_numpy(lq).permute(0, 3, 1, 2),
            torch.from_numpy(depth).permute(0, 3, 1, 2),
            torch.from_numpy(masks).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 1).numpy()
    assert np.max(np.abs(got - want)) < 2e-4


@pytest.mark.parametrize("scale,expect", [(2, 32), (3, 48), (4, 64), (8, 128)])
def test_depthnet_shapes_all_scales(scale, expect):
    import jax

    jnet = DepthNet(scale=scale, depth_latent_ch=32)
    lq, depth, masks = _make_inputs()
    params = jnet.init(jax.random.PRNGKey(0), lq, depth, masks)["params"]
    out = jnet.apply({"params": params}, lq, depth, masks)
    assert out.shape == (1, expect, expect, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
