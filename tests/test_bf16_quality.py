"""bf16 serving-precision quality certification.

The benched precision is bfloat16 with fp32 InstanceNorm statistics
(``endosr/nn/layers.py``). The BASELINE.md budget allows ≤0.05 dB PSNR loss
vs the reference protocol. Accounting: if PSNR(bf16 output, fp32 output) is
P_mis and the model operates at quality P_op vs GT, independent-error MSE
addition gives ΔPSNR ≤ 10·log10(1 + 10^((P_op − P_mis)/10)). At P_op = 30 dB
a mismatch-PSNR ≥ 45 dB keeps Δ ≤ 0.05 dB with headroom (Δ = 0.0137 dB at
45 dB, 0.0043 dB at 50 dB). bench.py re-measures this on the real chip at
the flagship shape each run and reports ``bf16_vs_fp32_psnr_db``.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from endosr.nn.depthnet import DepthNet
from endosr.ops.masks import depth_masks_np

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles

RNG = np.random.default_rng(9)


def _smooth(shape, octaves=3):
    """Band-limited random image in [0,1] — realistic spectra, not white noise."""
    import cv2

    h, w = shape[:2]
    img = np.zeros(shape, np.float32)
    for o in range(octaves):
        s = 2 ** (o + 2)
        low = RNG.random((max(2, h // s), max(2, w // s), shape[2])).astype(np.float32)
        img += cv2.resize(low, (w, h), interpolation=cv2.INTER_CUBIC).reshape(shape)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def test_bf16_output_within_quality_budget():
    lr = 48
    lq = _smooth((lr, lr, 3))[None]
    depth = _smooth((lr, lr, 1))[None]
    masks = depth_masks_np(depth[0, ..., 0], True, 10)[None].astype(np.float32)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=8,
              depth_latent_ch=64, depth_range_num=10)
    net32 = DepthNet(dtype=jnp.float32, **kw)
    net16 = DepthNet(dtype=jnp.bfloat16, **kw)
    params = net32.init(jax.random.PRNGKey(1), lq, depth, masks)["params"]

    out32 = np.asarray(net32.apply({"params": params}, lq, depth, masks))
    out16 = np.asarray(net16.apply({"params": params}, lq, depth, masks))
    assert out16.dtype == np.float32  # output contract is fp32 either way

    mse = float(np.mean((out16.astype(np.float64) - out32) ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    assert psnr >= 45.0, f"bf16 mismatch-PSNR {psnr:.2f} dB eats the 0.05 dB budget"


@pytest.mark.parametrize("scale,latent,budget_db", [
    # ×2/×3 random-init trunks are a pathologically amplifying regime for
    # this proxy: residual activations grow to ~30 with near-constant
    # channels, so InstanceNorm's centering amplifies bf16 input rounding
    # ~20× (measured interior-PSNR ~24 dB; fp32-emitting convs recover only
    # +4 dB). Trained trunks keep activations O(1) where the same relative
    # error lands ≥45 dB — but that cannot be proven without the released
    # checkpoint, so bf16 serving at ×2/×3 must be certified against
    # trained weights first (serving default is fp32; see bench_scales.py).
    # The asserts below bound the proxy regime so regressions still fail.
    (2, 32, 25.0),
    (3, 64, 25.0),
    (4, 64, 45.0),
])
def test_bf16_budget_other_scales(scale, latent, budget_db):
    """The certification must hold for every shipped recipe's wiring —
    ×2 (latent 32), ×3 (final_scale 3) and ×4 exercise different
    scale-conditional tails than the ×8 flagship."""
    lr = 48
    lq = _smooth((lr, lr, 3))[None]
    depth = _smooth((lr, lr, 1))[None]
    masks = depth_masks_np(depth[0, ..., 0], True, 10)[None].astype(np.float32)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=scale,
              depth_latent_ch=latent, depth_range_num=10)
    net32 = DepthNet(dtype=jnp.float32, **kw)
    net16 = DepthNet(dtype=jnp.bfloat16, **kw)
    params = net32.init(jax.random.PRNGKey(scale), lq, depth, masks)["params"]

    out32 = np.asarray(net32.apply({"params": params}, lq, depth, masks))
    out16 = np.asarray(net16.apply({"params": params}, lq, depth, masks))
    mse = float(np.mean((out16.astype(np.float64) - out32) ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    assert psnr >= budget_db, (
        f"x{scale}: bf16 mismatch-PSNR {psnr:.2f} dB below the "
        f"{budget_db} dB bound for this regime")


def test_remat_blocks_is_exact():
    """remat_blocks (large-LR training memory mode) must match the hoisted
    default to fp32 schedule tolerance and keep an identical parameter
    tree. (Not bit-identity: the hoisted path runs the N o-branches as one
    wide conv whose lowering differs from the per-block convs the remat
    path runs — same math, different fusion/reduction schedule.)"""
    lr = 16
    rng = np.random.default_rng(4)
    lq = jnp.asarray(rng.random((1, lr, lr, 3)).astype(np.float32))
    dep = jnp.asarray(rng.random((1, lr, lr, 1)).astype(np.float32))
    mk = jnp.asarray((rng.random((1, lr, lr, 10)) > 0.8).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=2,
              depth_latent_ch=16, depth_range_num=10)
    net_a = DepthNet(remat_blocks=False, **kw)
    net_b = DepthNet(remat_blocks=True, **kw)
    params = net_a.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    pb = net_b.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pb))
    oa = np.asarray(net_a.apply({"params": params}, lq, dep, mk))
    ob = np.asarray(net_b.apply({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(oa, ob, atol=2e-5, rtol=0)
    g = jax.grad(lambda p: jnp.sum(
        net_b.apply({"params": p}, lq, dep, mk) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_chain_in_is_exact():
    """chained_instance_norm (one-pass double-IN) must match the sequential
    IN∘IN composition to fp32 rounding and keep an identical param tree."""
    lr = 16
    rng = np.random.default_rng(5)
    lq = jnp.asarray(rng.random((2, lr, lr, 3)).astype(np.float32))
    dep = jnp.asarray(rng.random((2, lr, lr, 1)).astype(np.float32))
    mk = jnp.asarray((rng.random((2, lr, lr, 10)) > 0.8).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=4,
              depth_latent_ch=16, depth_range_num=10)
    net_a = DepthNet(chain_in=False, **kw)
    net_b = DepthNet(chain_in=True, **kw)
    params = net_a.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    pb = net_b.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pb))
    oa = np.asarray(jax.jit(net_a.apply)({"params": params}, lq, dep, mk))
    ob = np.asarray(jax.jit(net_b.apply)({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(oa, ob, atol=5e-5, rtol=0)
    g = jax.grad(lambda p: jnp.sum(
        net_b.apply({"params": p}, lq, dep, mk) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_lazy_branches_is_exact():
    """Lazy per-block branch evaluation (shared-prefix hoist + per-block
    second conv / style matmul) must match the monolithic hoist bit-for-bit
    and keep an identical parameter tree."""
    lr = 16
    rng = np.random.default_rng(11)
    lq = jnp.asarray(rng.random((2, lr, lr, 3)).astype(np.float32))
    dep = jnp.asarray(rng.random((2, lr, lr, 1)).astype(np.float32))
    mk = jnp.asarray((rng.random((2, lr, lr, 10)) > 0.8).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=4,
              depth_latent_ch=16, depth_range_num=10)
    net_a = DepthNet(lazy_branches=False, **kw)
    net_b = DepthNet(lazy_branches=True, **kw)
    params = net_a.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    pb = net_b.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pb))
    oa = np.asarray(jax.jit(net_a.apply)({"params": params}, lq, dep, mk))
    ob = np.asarray(jax.jit(net_b.apply)({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(oa, ob, atol=2e-6, rtol=0)
    g = jax.grad(lambda p: jnp.sum(
        net_b.apply({"params": p}, lq, dep, mk) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("chunk", [1, 3, 4, 13])
def test_hoist_chunk_is_exact(chunk):
    """Chunked hoisting (HBM-locality mode for large batch) must match the
    single-shot hoist to fp32 schedule tolerance: same math, same params —
    but splitting the wide o-branch conv by output channels lets XLA pick a
    different per-width conv algorithm under the "conv" lowering."""
    lr = 16
    rng = np.random.default_rng(7)
    lq = jnp.asarray(rng.random((2, lr, lr, 3)).astype(np.float32))
    dep = jnp.asarray(rng.random((2, lr, lr, 1)).astype(np.float32))
    mk = jnp.asarray((rng.random((2, lr, lr, 10)) > 0.8).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=4,
              depth_latent_ch=16, depth_range_num=10)
    net_a = DepthNet(hoist_chunk=0, **kw)
    net_b = DepthNet(hoist_chunk=chunk, **kw)
    params = net_a.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    pb = net_b.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pb))
    oa = np.asarray(jax.jit(net_a.apply)({"params": params}, lq, dep, mk))
    ob = np.asarray(jax.jit(net_b.apply)({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(oa, ob, atol=2e-5, rtol=0)
    g = jax.grad(lambda p: jnp.sum(
        net_b.apply({"params": p}, lq, dep, mk) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("scale,latent", [(2, 32), (3, 64)])
def test_mixed_precision_within_budget(scale, latent):
    """precision: mixed (fp32 trunk + bf16 hoisted SEAN branches) must pass
    the >=45 dB certification where full bf16 fails — this is the shipped
    fast path for x2/x3 serving."""
    lr = 48
    lq = _smooth((lr, lr, 3))[None]
    depth = _smooth((lr, lr, 1))[None]
    masks = depth_masks_np(depth[0, ..., 0], True, 10)[None].astype(np.float32)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=scale,
              depth_latent_ch=latent, depth_range_num=10)
    net32 = DepthNet(dtype=jnp.float32, **kw)
    netmx = DepthNet(dtype=jnp.float32, modulation_dtype=jnp.bfloat16, **kw)
    params = net32.init(jax.random.PRNGKey(scale), lq, depth, masks)["params"]

    out32 = np.asarray(net32.apply({"params": params}, lq, depth, masks))
    outmx = np.asarray(netmx.apply({"params": params}, lq, depth, masks))
    mse = float(np.mean((outmx.astype(np.float64) - out32) ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    assert psnr >= 45.0, (
        f"x{scale} mixed: mismatch-PSNR {psnr:.2f} dB eats the budget")


@pytest.mark.parametrize("scale,latent,passes,bound_db", [
    (2, 32, 1, 40.0), (3, 64, 1, 38.0),
    # 3-pass (bf16c3): both operands bf16-split + exact mean compensation —
    # measured 55.9/53.7 dB, PAST the >=50 dB certification bar even in
    # this pathologically amplifying random-init proxy regime
    (2, 32, 3, 50.0), (3, 64, 3, 50.0),
])
def test_bf16c_centered_mode_quality(scale, latent, passes, bound_db):
    """``precision: bf16c``/``bf16c3`` serving (mean-compensated bf16 stream
    convs + bf16 SEAN branches + fp32 residual stream) must recover the
    InstanceNorm offset-amplification loss that breaks plain bf16 at ×2/×3:
    1-pass measures 43.9/42.0 dB, 3-pass 55.9/53.7 dB, vs 30/28 dB for
    plain bf16 (see layers.centered_conv and BASELINE.md)."""
    lr = 48
    lq = _smooth((lr, lr, 3))[None]
    depth = _smooth((lr, lr, 1))[None]
    masks = depth_masks_np(depth[0, ..., 0], True, 10)[None].astype(np.float32)

    kw = dict(which_resblk_depth=tuple(range(14)), scale=scale,
              depth_latent_ch=latent, depth_range_num=10)
    net32 = DepthNet(dtype=jnp.float32, **kw)
    netc = DepthNet(dtype=jnp.float32, modulation_dtype=jnp.bfloat16,
                    centered_convs=passes, **kw)
    params = net32.init(jax.random.PRNGKey(scale), lq, depth, masks)["params"]
    assert (jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        netc.init(jax.random.PRNGKey(scale), lq, depth, masks)["params"]))

    out32 = np.asarray(net32.apply({"params": params}, lq, depth, masks))
    outc = np.asarray(netc.apply({"params": params}, lq, depth, masks))
    assert outc.dtype == np.float32
    mse = float(np.mean((outc.astype(np.float64) - out32) ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    assert psnr >= bound_db, (
        f"x{scale}: bf16c mismatch-PSNR {psnr:.2f} dB below {bound_db} dB")


@pytest.mark.parametrize("chunk", [1, 3, 4, 13])
def test_lazy_o_chunk_is_exact(chunk):
    """Chunked lazy o-prefix (HBM-locality mode) must match the single-shot
    prefix to fp32 schedule tolerance: splitting the wide conv by output
    channels is the same math, but under the "conv" lowering XLA may pick a
    different per-width conv algorithm."""
    lr = 16
    rng = np.random.default_rng(13)
    lq = jnp.asarray(rng.random((2, lr, lr, 3)).astype(np.float32))
    dep = jnp.asarray(rng.random((2, lr, lr, 1)).astype(np.float32))
    mk = jnp.asarray((rng.random((2, lr, lr, 10)) > 0.8).astype(np.float32))
    kw = dict(which_resblk_depth=tuple(range(14)), scale=4,
              depth_latent_ch=16, depth_range_num=10)
    net_a = DepthNet(lazy_o_chunk=0, **kw)
    net_b = DepthNet(lazy_o_chunk=chunk, **kw)
    params = net_a.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    pb = net_b.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pb))
    oa = np.asarray(jax.jit(net_a.apply)({"params": params}, lq, dep, mk))
    ob = np.asarray(jax.jit(net_b.apply)({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(oa, ob, atol=2e-5, rtol=0)
    g = jax.grad(lambda p: jnp.sum(
        net_b.apply({"params": p}, lq, dep, mk) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
