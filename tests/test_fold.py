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
