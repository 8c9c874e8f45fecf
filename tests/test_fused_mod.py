"""Fused blended-modulation kernel vs its jnp twin and the unfused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosr.kernels.fused_mod import (
    fused_modulation,
    fused_modulation_reference,
    fused_modulation_supported,
)

RNG = np.random.default_rng(13)


def _operands(b=2, h=16, w=16, k=10, n=3, c2=32, dtype=jnp.float32):
    f = lambda *s: jnp.asarray(RNG.random(s, dtype=np.float32) - 0.5, dtype)
    d = jnp.asarray(RNG.random((b, h, w, 1), dtype=np.float32), dtype)
    mask = jnp.asarray(
        (RNG.random((b, h, w, k)) > 0.7).astype(np.float32), dtype)
    return (d, mask, f(n, 9, c2), f(n, c2), f(n, 9 * c2, c2),
            f(b, n, 9 * k, c2), f(n, c2))


def test_kernel_matches_reference():
    args = _operands()
    got = np.asarray(fused_modulation(*args))
    want = np.asarray(fused_modulation_reference(*args))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_matches_reference_tall():
    args = _operands(b=1, h=32, w=24, n=2, c2=16, k=4)
    got = np.asarray(fused_modulation(*args))
    want = np.asarray(fused_modulation_reference(*args))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_supported_gate():
    assert fused_modulation_supported(128, 128)
    assert not fused_modulation_supported(12, 128)   # rows not /8
    assert not fused_modulation_supported(128, 13)   # cols not /8
    assert not fused_modulation_supported(8, 128)    # too short for halo


@pytest.mark.slow
def test_gradients_flow_through_custom_vjp():
    args = _operands(b=1, h=16, w=16, n=2, c2=16, k=4)

    def loss(wm, w2, v):
        out = fused_modulation(args[0], args[1], wm, args[3], w2, v, args[6])
        return jnp.sum(out ** 2)

    g_wm, g_w2, g_v = jax.grad(loss, argnums=(0, 1, 2))(args[2], args[4], args[5])

    def loss_ref(wm, w2, v):
        out = fused_modulation_reference(
            args[0], args[1], wm, args[3], w2, v, args[6])
        return jnp.sum(out ** 2)

    r_wm, r_w2, r_v = jax.grad(loss_ref, argnums=(0, 1, 2))(
        args[2], args[4], args[5])
    np.testing.assert_allclose(np.asarray(g_wm), np.asarray(r_wm),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w2), np.asarray(r_w2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_v), np.asarray(r_v),
                               rtol=1e-4, atol=1e-4)


def test_fused_path_matches_unfused_in_depthnet():
    """End-to-end: DepthNet with the fused kernel vs the two-branch hoists."""
    from endosr.nn.depthnet import DepthNet
    from endosr.ops.masks import depth_masks_np

    lq = RNG.random((1, 16, 16, 3), dtype=np.float32)
    depth = RNG.random((1, 16, 16), dtype=np.float32)
    masks = depth_masks_np(depth[0], True, 10)[None].astype(np.float32)
    depth = depth[..., None].astype(np.float32)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=4, depth_latent_ch=32)
    net_f = DepthNet(fused_modulation=True, **kw)
    net_u = DepthNet(fused_modulation=False, **kw)
    params = net_f.init(jax.random.PRNGKey(2), lq, depth, masks)["params"]
    out_f = np.asarray(net_f.apply({"params": params}, lq, depth, masks))
    out_u = np.asarray(net_u.apply({"params": params}, lq, depth, masks))
    assert np.max(np.abs(out_f - out_u)) < 3e-5
