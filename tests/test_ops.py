"""Numerics substrate tests: bicubic resize, color, masks, metrics.

Golden values come from two oracles:
  * torch library functions (F.interpolate) for the interpolation modes
  * the reference implementation at /root/reference (skip-gated) for the
    MATLAB-bicubic resample, color converts, SSIM, and depth-mask binning
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from endosr.ops import (
    bgr2ycbcr,
    depth_masks,
    depth_masks_np,
    imresize,
    imresize_np,
    interpolate_bilinear,
    interpolate_nearest,
    modcrop,
    rgb2ycbcr,
    ycbcr2rgb,
)
from endosr.metrics import calculate_psnr, calculate_ssim, psnr_jax, ssim_jax

from tests.conftest import requires_reference

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# MATLAB bicubic
# ---------------------------------------------------------------------------


@requires_reference
@pytest.mark.parametrize("scale", [1 / 8, 1 / 4, 1 / 3, 1 / 2, 2.0, 3.0, 4.0])
def test_imresize_np_matches_reference(reference_path, scale):
    import data.util as ref_util

    img = RNG.random((48, 40, 3)).astype(np.float32)
    got = imresize_np(img, scale, True)
    want = ref_util.imresize_np(img, scale, True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@requires_reference
def test_imresize_jax_matches_numpy(reference_path):
    img = RNG.random((32, 32, 3)).astype(np.float32)
    got = np.asarray(imresize(img, 1 / 4))
    want = imresize_np(img, 1 / 4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_imresize_identity_partition():
    # resample matrix rows sum to 1 → constant images stay constant
    img = np.full((24, 24, 3), 0.5, dtype=np.float32)
    out = imresize_np(img, 1 / 2)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
    out = imresize_np(img, 4.0)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# torch-style interpolation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("size", [(7, 9), (16, 16), (33, 17)])
def test_nearest_matches_torch(size):
    x = RNG.random((2, 13, 11, 4)).astype(np.float32)
    got = np.asarray(interpolate_nearest(x, size))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=size, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(8, 8), (31, 17), (3, 5)])
def test_bilinear_matches_torch(align, size):
    x = RNG.random((2, 13, 11, 4)).astype(np.float32)
    got = np.asarray(interpolate_bilinear(x, size, align_corners=align))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(xt, size=size, mode="bilinear", align_corners=align)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


@requires_reference
def test_color_matches_reference(reference_path):
    import data.util as ref_util

    img = RNG.random((17, 19, 3)).astype(np.float32)
    np.testing.assert_allclose(rgb2ycbcr(img.copy(), True), ref_util.rgb2ycbcr(img.copy(), True), atol=1e-6)
    np.testing.assert_allclose(bgr2ycbcr(img.copy(), True), ref_util.bgr2ycbcr(img.copy(), True), atol=1e-6)
    np.testing.assert_allclose(bgr2ycbcr(img.copy(), False), ref_util.bgr2ycbcr(img.copy(), False), atol=1e-6)
    np.testing.assert_allclose(ycbcr2rgb(img.copy()), ref_util.ycbcr2rgb(img.copy()), atol=1e-5)

    u8 = (RNG.random((9, 9, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(rgb2ycbcr(u8.copy(), True), ref_util.rgb2ycbcr(u8.copy(), True))


def test_modcrop():
    img = RNG.random((17, 19, 3)).astype(np.float32)
    assert modcrop(img, 8).shape == (16, 16, 3)
    assert modcrop(img[..., 0], 3).shape == (15, 18)


# ---------------------------------------------------------------------------
# depth masks
# ---------------------------------------------------------------------------


@requires_reference
@pytest.mark.parametrize("fixed_range", [True, False])
def test_depth_masks_match_reference(reference_path, fixed_range):
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_lqgt_depth", reference_path / "data" / "LQGTker_Depth_dataset.py"
    )
    # The reference dataset module needs package-level imports; instead of
    # executing it, replicate its oracle via torch ops directly is copying —
    # so call its getDepthMask through a minimal instance.
    import data.util  # noqa: F401  (makes `data` package importable for the module)
    mod = ilu.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference dataset module not importable: {e}")

    ds = object.__new__(mod.LQGTKerDepthDataset)
    depth = RNG.random((24, 20)).astype(np.float32)
    want = (
        mod.LQGTKerDepthDataset.getDepthMask(
            ds, torch.from_numpy(depth), fixed_range, 10
        )
        .numpy()
        .transpose(1, 2, 0)
    )
    got = depth_masks_np(depth, fixed_range, 10)
    np.testing.assert_array_equal(got, want)
    got_jax = np.asarray(depth_masks(depth, fixed_range, 10))
    np.testing.assert_array_equal(got_jax, want)


def test_depth_masks_partition():
    depth = RNG.random((16, 16)).astype(np.float32)
    masks = depth_masks_np(depth, fixed_range=True, num_masks=10)
    # fixed [0,1) range: every pixel < 1.0 falls in exactly one bin
    np.testing.assert_array_equal(masks.sum(-1), np.ones((16, 16), np.float32))


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


@requires_reference
def test_psnr_ssim_match_reference(reference_path):
    # load by file path: `depth_estimation/utils.py` (a module) can shadow
    # the reference's `utils` package depending on test order
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_utils_util", reference_path / "utils" / "util.py")
    ref_util = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref_util)

    a = (RNG.random((40, 40, 3)) * 255).round().astype(np.float64)
    b = np.clip(a + RNG.normal(0, 8, a.shape), 0, 255).round()
    assert calculate_psnr(a, b) == pytest.approx(ref_util.calculate_psnr(a, b), abs=1e-9)
    assert calculate_ssim(a, b) == pytest.approx(ref_util.calculate_ssim(a, b), abs=1e-7)


def test_ssim_jax_matches_pytorch_ssim_protocol():
    # against a torch implementation of the same protocol (grouped conv,
    # SAME zero padding, [0,1] constants) built from torch library ops
    a = RNG.random((2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    def torch_ssim(x, y):
        win = 11
        sigma = 1.5
        ax = torch.arange(win, dtype=torch.float64) - (win - 1) / 2
        g = torch.exp(-(ax ** 2) / (2 * sigma ** 2))
        g = (g / g.sum()).float()
        window = torch.outer(g, g)[None, None].repeat(x.shape[1], 1, 1, 1)
        blur = lambda t: F.conv2d(t, window, padding=win // 2, groups=x.shape[1])
        mu1, mu2 = blur(x), blur(y)
        s1 = blur(x * x) - mu1 ** 2
        s2 = blur(y * y) - mu2 ** 2
        s12 = blur(x * y) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
        )
        return m.mean(dim=(1, 2, 3)).numpy()

    got = np.asarray(ssim_jax(a, b))
    want = torch_ssim(
        torch.from_numpy(a).permute(0, 3, 1, 2), torch.from_numpy(b).permute(0, 3, 1, 2)
    )
    # oneDNN-backed XLA CPU convs round slightly differently than torch's
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_psnr_jax_matches_numpy():
    a = RNG.random((2, 16, 16, 3)).astype(np.float32)
    b = RNG.random((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(psnr_jax(a, b))
    want = [calculate_psnr(a[i] * 255, b[i] * 255) for i in range(2)]
    np.testing.assert_allclose(got, want, rtol=1e-4)
