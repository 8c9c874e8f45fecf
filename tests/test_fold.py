"""Pixel-shuffle kernel-folding identities.

Validates the exact-math rewrites that keep the DepthNet tail on the MXU:
``conv_k(pixel_shuffle(x, r)) == pixel_shuffle(conv(x, fold(w, r)), r)`` and
the nested-shuffle channel permutation used when deferring several shuffles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosr.nn.layers import (
    compose_pixel_shuffle_perm,
    fold_kernel_through_pixel_shuffle,
    pixel_shuffle,
)

RNG = np.random.default_rng(3)


def _conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "k,r,cin,cout", [(9, 2, 4, 3), (3, 2, 4, 5), (9, 4, 2, 3),
                     (3, 4, 8, 8), (9, 8, 2, 3), (5, 3, 4, 3)]
)
def test_fold_kernel_identity(k, r, cin, cout):
    x = jnp.asarray(RNG.random((2, 6, 6, cin * r * r), dtype=np.float32))
    w = jnp.asarray(RNG.random((k, k, cin, cout), dtype=np.float32)) - 0.5
    want = _conv(pixel_shuffle(x, r), w, k // 2)
    wf = fold_kernel_through_pixel_shuffle(w, r)
    got = pixel_shuffle(_conv(x, wf, wf.shape[0] // 2), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r,s", [(1, 2), (2, 2), (2, 3), (4, 2), (3, 2)])
def test_compose_pixel_shuffle_perm(r, s):
    c = 3 * (r * s) ** 2
    v = jnp.asarray(RNG.random((2, 4, 5, c), dtype=np.float32))
    want = pixel_shuffle(pixel_shuffle(v, r), s)
    perm = compose_pixel_shuffle_perm(r, s, c)
    got = pixel_shuffle(v[..., perm], s * r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---- centered_conv (bf16c serving mode) ------------------------------------

from endosr.nn.layers import centered_conv  # noqa: E402


@pytest.mark.parametrize("k,H,W", [(3, 8, 8), (3, 3, 3), (3, 17, 5),
                                   (9, 12, 16), (9, 9, 9), (5, 7, 11)])
def test_centered_conv_constant_image_exact(k, H, W):
    """On a per-channel-constant image the centered term is exactly zero, so
    the output IS the border-case correction table — it must match the true
    fp32 conv at every border ring position to fp32 accumulation noise
    (k=9 sums 81 taps scaled by means ~30 through different orders)."""
    cin, cout = 5, 4
    # integer-valued constants: the fp32 spatial mean is then exact for any
    # H*W, so the centered term is exactly zero and only the table is tested
    m = jnp.asarray(np.round(RNG.standard_normal((2, cin)) * 10).astype(np.float32))
    x = jnp.broadcast_to(m[:, None, None, :], (2, H, W, cin))
    w = jnp.asarray(RNG.standard_normal((k, k, cin, cout)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((cout,)).astype(np.float32))
    want = _conv(x, w, k // 2) + b
    got = centered_conv(x, w, b, jnp.bfloat16)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=5e-4)


def test_centered_conv_fp32_is_plain_conv():
    x = jnp.asarray(RNG.random((2, 6, 7, 3), dtype=np.float32))
    w = jnp.asarray(RNG.standard_normal((3, 3, 3, 4)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((4,)).astype(np.float32))
    got = centered_conv(x, w, b, jnp.float32)
    want = _conv(x, w, 1) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_centered_conv_beats_plain_bf16_on_offset_heavy_input():
    """The design target: a small signal riding on a large per-channel mean.
    Plain bf16 rounds the signal away (error relative to |mean|); centered
    bf16 keeps rounding relative to the signal sigma."""
    rng = np.random.default_rng(21)
    cin, cout = 8, 8
    base = rng.standard_normal((1, 1, 1, cin)).astype(np.float32) * 100
    sig = rng.standard_normal((1, 24, 24, cin)).astype(np.float32) * 0.1
    x = jnp.asarray(base + sig)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    want = np.asarray(_conv(x, w, 1))
    got_c = np.asarray(centered_conv(x, w, None, jnp.bfloat16))
    plain = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    got_p = np.asarray(plain)
    err_c = np.sqrt(np.mean((got_c - want) ** 2))
    err_p = np.sqrt(np.mean((got_p - want) ** 2))
    assert err_c < err_p / 10, (err_c, err_p)


def test_centered_conv_small_spatial_falls_back_fp32():
    """H or W below the kernel extent can't build the border table — the
    documented fallback is an exact fp32 conv."""
    x = jnp.asarray(RNG.random((1, 2, 9, 3), dtype=np.float32)) + 50
    w = jnp.asarray(RNG.standard_normal((3, 3, 3, 2)).astype(np.float32))
    got = centered_conv(x, w, None, jnp.bfloat16)
    want = _conv(x, w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
