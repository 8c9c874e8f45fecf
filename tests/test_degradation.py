"""Degradation toolkit tests (kernel shapes/normalization, blur parity, PCA)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from endosr.ops.degradation import (
    SRMDPreprocessing,
    anisotropic_gaussian_kernel,
    batch_blur,
    bicubic_downsample,
    isotropic_gaussian_kernel,
    pca_encode,
    pca_matrix,
    random_batch_kernel,
    stable_batch_kernel,
)

RNG = np.random.default_rng(11)


def test_kernels_normalized():
    k = np.asarray(random_batch_kernel(jax.random.PRNGKey(0), 8, l=21,
                                       rate_iso=0.5))
    assert k.shape == (8, 21, 21)
    np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-5)
    assert (k >= 0).all()

    ks = np.asarray(stable_batch_kernel(4, 21, 2.6))
    np.testing.assert_allclose(ks.sum(axis=(1, 2)), 1.0, rtol=1e-6)
    # stable kernel is identical across batch
    np.testing.assert_array_equal(ks[0], ks[3])


def test_iso_kernel_matches_reference_formula():
    # reference isotropic_gaussian_kernel (utils/util.py:253-257)
    l, sig = 13, 1.7
    ax = np.arange(-l // 2 + 1.0, l // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    want = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sig ** 2))
    want = want / want.sum()
    got = np.asarray(isotropic_gaussian_kernel(l, sig))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batch_blur_matches_torch_groupconv():
    b, c, h, w, l = 2, 3, 16, 16, 9
    imgs = RNG.random((b, h, w, c)).astype(np.float32)
    kernels = np.asarray(random_batch_kernel(jax.random.PRNGKey(1), b, l=l))
    got = np.asarray(batch_blur(jnp.asarray(imgs), jnp.asarray(kernels)))

    # torch oracle: reflect pad + per-(B,C) group conv (BatchBlur semantics)
    x = torch.from_numpy(imgs).permute(0, 3, 1, 2)
    pad = l // 2
    xp = F.pad(x, (pad, pad, pad, pad), mode="reflect")
    xp = xp.reshape(1, b * c, h + 2 * pad, w + 2 * pad)
    kv = torch.from_numpy(kernels).view(b, 1, l, l).repeat(1, c, 1, 1)
    kv = kv.view(b * c, 1, l, l)
    want = F.conv2d(xp, kv, groups=b * c).view(b, c, h, w).permute(0, 2, 3, 1)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_pca_roundtrip():
    kernels = np.asarray(random_batch_kernel(jax.random.PRNGKey(2), 64, l=11,
                                             rate_iso=0.7))
    w = pca_matrix(kernels, k=10)
    assert w.shape == (121, 10)
    # basis is orthonormal
    np.testing.assert_allclose(w.T @ w, np.eye(10), atol=1e-4)
    codes = np.asarray(pca_encode(jnp.asarray(kernels), jnp.asarray(w)))
    assert codes.shape == (64, 10)


def test_srmd_preprocessing_pipeline():
    kernels = np.asarray(random_batch_kernel(jax.random.PRNGKey(3), 32, l=21))
    pca = pca_matrix(kernels, k=10)
    pre = SRMDPreprocessing(scale=4, pca=pca, random=True, noise=True)
    hr = jnp.asarray(RNG.random((2, 32, 32, 3)).astype(np.float32))
    lr, code, k = pre(jax.random.PRNGKey(4), hr, True)
    assert lr.shape == (2, 8, 8, 3)
    assert code.shape == (2, 11)  # 10 PCA dims + noise level
    assert k.shape == (2, 21, 21)
    assert float(jnp.min(lr)) >= 0.0 and float(jnp.max(lr)) <= 1.0

    pre_nonoise = SRMDPreprocessing(scale=2, pca=pca, random=False, noise=False)
    lr2, code2 = pre_nonoise(jax.random.PRNGKey(5), hr, False)
    assert lr2.shape == (2, 16, 16, 3)
    assert code2.shape == (2, 10)


def test_bicubic_downsample_constant():
    imgs = jnp.full((1, 16, 16, 3), 0.25)
    out = bicubic_downsample(imgs, 4)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)
