"""Fused ×8 tail kernel (endosr/kernels/fused_tail.py) correctness.

Covers the kernel body in interpret mode against the jnp twin, the
fold_head_operands lane reorder, the DepthNet wiring (pallas_tail auto vs
off — same params, same output), and the custom-VJP gradient path.
Reference ops being replaced: the folded 9×9 head conv + PixelShuffle +
clamp chain (`codes/models/modules/sftmd_arch.py:898-908,946-950`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosr.kernels import fused_tail as ft

RNG = np.random.default_rng(17)


def _operands(b=1, n=32, c4=512, pad=True):
    hp = n + 1
    padw = (-hp) % 8 if pad else 0
    g4 = RNG.standard_normal((b, hp, hp + padw, c4)).astype(np.float32) * 0.1
    g4[:, :, hp:, :] = 0.0  # zero-gated pad columns, as the producer emits
    wh = RNG.standard_normal((3, 3, c4, 48)).astype(np.float32) * 0.02
    bh = RNG.standard_normal(48).astype(np.float32) * 0.1
    return jnp.asarray(g4), jnp.asarray(wh), jnp.asarray(bh)


def test_kernel_matches_twin_interpret():
    """Kernel body (interpret mode) ≡ jnp twin at highest matmul precision
    (default platform precision adds ~1e-3 matmul noise to both sides)."""
    g4, wh, bh = _operands()
    with jax.default_matmul_precision("highest"):
        want = np.asarray(ft.fused_tail_reference(g4, wh, bh, -100.0, 100.0))
        got = np.asarray(
            ft._forward(g4, wh, bh, -100.0, 100.0, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_twin_matches_dense_oracle():
    """The jnp twin itself equals an explicit f64 conv + canonical PS(4)
    interleave (layout check: [B,H·4,W·12] f32 ≡ row-major NHWC)."""
    g4, wh, bh = _operands(n=16)
    w = g4.shape[1] - 1
    gp = np.pad(np.asarray(g4, np.float64), ((0, 0), (1, 0), (1, 0), (0, 0)))
    pre = np.zeros((g4.shape[0], w, w, 48))
    for dy in range(3):
        for dx in range(3):
            pre += np.einsum("bhwc,co->bhwo", gp[:, dy:dy + w, dx:dx + w],
                             np.asarray(wh, np.float64)[dy, dx])
    pre = np.clip(pre + np.asarray(bh, np.float64), 0.0, 1.0)
    oracle = np.zeros((g4.shape[0], w * 4, w * 12))
    for c in range(3):
        for i in range(4):
            for j in range(4):
                oracle[:, i::4, (j * 3 + c)::12] = pre[..., c * 16 + i * 4 + j]
    got = np.asarray(ft.fused_tail_reference(g4, wh, bh))
    np.testing.assert_allclose(got, oracle, atol=2e-3)


def test_supported_predicate():
    assert ft.fused_tail_supported((8, 257, 264, 512), 4, 3)
    assert not ft.fused_tail_supported((8, 257, 264, 512), 2, 3)   # rt
    assert not ft.fused_tail_supported((8, 257, 263, 512), 4, 3)   # wc % 8
    assert not ft.fused_tail_supported((8, 257, 256, 512), 4, 3)   # wc < hp
    assert not ft.fused_tail_supported((8, 257, 264, 260), 4, 3)   # c4 % 128
    assert not ft.fused_tail_supported((8, 251, 256, 512), 4, 3)   # w % TH


def test_depthnet_wiring_fused_equals_off():
    """DepthNet packed tail with pallas_tail=True (falls back to the twin on
    CPU but exercises the padded-g4 HWNC producer + perm) ≡ the default
    split path."""
    from endosr.nn.depthnet import DepthNet

    rng = np.random.default_rng(3)
    lq = jnp.asarray(rng.random((2, 16, 16, 3), np.float32))
    dep = jnp.asarray(rng.random((2, 16, 16, 1), np.float32))
    mk = jnp.asarray((rng.random((2, 16, 16, 10)) > 0.9).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=8,
              depth_latent_ch=32, depth_range_num=10, dtype=jnp.float32,
              pallas_output=False, packed_tail=True)
    net = DepthNet(**kw, pallas_tail=True)
    params = net.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    a = net.apply({"params": params}, lq, dep, mk)
    b = DepthNet(**kw).apply({"params": params}, lq, dep, mk)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_gradients_flow():
    """custom_vjp routes grads through the twin; they match jax.grad of the
    twin directly."""
    g4, wh, bh = _operands(n=16)

    def loss_fused(g, w, b):
        return jnp.sum(ft.fused_tail(g, w, b, 0.0, 1.0) ** 2)

    def loss_twin(g, w, b):
        return jnp.sum(ft.fused_tail_reference(g, w, b, 0.0, 1.0) ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(g4, wh, bh)
    gb = jax.grad(loss_twin, argnums=(0, 1, 2))(g4, wh, bh)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@pytest.mark.parametrize("bad_pad", [False])
def test_unpadded_square_input_works(bad_pad):
    """hp already 8-aligned+1? n=31 gives hp=32, w=31 — unsupported (w%8);
    but n=64,pad=0 would need hp=65%8!=0 so producer always pads. Check the
    twin handles pad=0 square inputs identically for completeness."""
    g4, wh, bh = _operands(n=32, pad=False)
    out = np.asarray(ft.fused_tail_reference(g4, wh, bh))
    assert out.shape == (1, 128, 384)
