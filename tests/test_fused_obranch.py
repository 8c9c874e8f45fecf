"""Fused o-branch kernel vs its jnp twin and the unfused hoisted path."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from endosr.kernels.fused_obranch import (
    TH,
    fused_o_branch,
    fused_o_branch_reference,
    fused_o_branch_supported,
)
from endosr.nn.sean import hoisted_o_branch, pallas_o_branch

RNG = np.random.default_rng(7)


def _operands(b=2, h=TH, w=128, n=3, c2=16):
    f = lambda *s: jnp.asarray(
        (RNG.random(s, dtype=np.float32) - 0.5), jnp.bfloat16)
    d = jnp.asarray(RNG.random((b, h, w, 1), dtype=np.float32), jnp.bfloat16)
    return d, f(n, 9, c2), f(n, c2), f(n, 9, c2, c2), f(n, c2)


def test_kernel_matches_reference():
    args = _operands()
    got = np.asarray(fused_o_branch(*args), np.float32)
    want = np.asarray(fused_o_branch_reference(*args), np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=8e-2, atol=8e-2)


def test_kernel_matches_reference_multitile():
    args = _operands(b=1, h=2 * TH, n=2, c2=8)
    got = np.asarray(fused_o_branch(*args), np.float32)
    want = np.asarray(fused_o_branch_reference(*args), np.float32)
    np.testing.assert_allclose(got, want, rtol=8e-2, atol=8e-2)


def test_wrapper_matches_hoisted_o_branch():
    d, wm, bm, w2, b2 = _operands(n=2, c2=16)
    weights = [
        ({"kernel": wm[i].reshape(3, 3, 1, 16), "bias": bm[i]},
         w2[i].reshape(3, 3, 16, 16), b2[i])
        for i in range(2)
    ]
    got = pallas_o_branch(weights, d, jnp.bfloat16)
    want = hoisted_o_branch(weights, d, jnp.bfloat16)
    assert len(got) == len(want) == 2
    for (gg, gb), (wg, wb) in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(gg, np.float32), np.asarray(wg, np.float32),
            rtol=8e-2, atol=8e-2)
        np.testing.assert_allclose(
            np.asarray(gb, np.float32), np.asarray(wb, np.float32),
            rtol=8e-2, atol=8e-2)


def test_supported_gate():
    assert fused_o_branch_supported(128, 128, jnp.bfloat16)
    assert not fused_o_branch_supported(128, 128, jnp.float32)
    assert not fused_o_branch_supported(100, 128, jnp.bfloat16)  # rows % TH
    assert not fused_o_branch_supported(128, 100, jnp.bfloat16)  # cols % 16
    assert not fused_o_branch_supported(128, 96, jnp.bfloat16)   # cols < 128


@pytest.mark.slow
def test_gradients_match_reference_vjp():
    d, wm, bm, w2, b2 = _operands(b=1, n=2, c2=8)

    def loss(fn, wm, w2):
        out = fn(d, wm, bm, w2, b2, jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_wm, g_w2 = jax.grad(
        lambda *a: loss(fused_o_branch, *a), argnums=(0, 1))(wm, w2)
    r_wm, r_w2 = jax.grad(
        lambda *a: loss(fused_o_branch_reference, *a), argnums=(0, 1))(wm, w2)
    # both sides accumulate in bf16 with different reduction orders; single
    # elements can land ~0.16 rel apart (observed on the CPU interpret
    # path), so the bound is loose — this guards structure, not precision
    np.testing.assert_allclose(
        np.asarray(g_wm, np.float32), np.asarray(r_wm, np.float32),
        rtol=2.5e-1, atol=2e-1)
    np.testing.assert_allclose(
        np.asarray(g_w2, np.float32), np.asarray(r_w2, np.float32),
        rtol=2.5e-1, atol=2e-1)


@pytest.mark.slow
def test_depthnet_flag_runs_fused_path():
    """DepthNet(pallas_obranch=True) matches the default XLA-hoisted path."""
    from endosr.nn.depthnet import DepthNet

    rng = np.random.default_rng(3)
    b, lr = 1, 32
    lq = jnp.asarray(rng.random((b, lr, 128, 3), dtype=np.float32))
    dep = jnp.asarray(rng.random((b, lr, 128, 1), dtype=np.float32))
    mk = jnp.asarray(
        (rng.random((b, lr, 128, 10)) > 0.8).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=2,
              depth_latent_ch=32, depth_range_num=10, dtype=jnp.bfloat16)
    net_a = DepthNet(pallas_obranch=True, **kw)
    net_b = DepthNet(pallas_obranch=False, **kw)
    params = net_a.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    out_a = np.asarray(net_a.apply({"params": params}, lq, dep, mk))
    out_b = np.asarray(net_b.apply({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(out_a, out_b, rtol=8e-2, atol=8e-2)
