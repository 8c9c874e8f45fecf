"""Bucketed eval shapes: one XLA compile per bucket.

Whole-image eval varies in shape per image (the reference modcrops each
EndoScene image, ``codes/data/EndoScene_depth_dataset.py``); with
``eval_bucket_multiple`` set, inputs are padded to a shared bucket so the
jitted forward compiles once per bucket instead of once per image.
"""

import numpy as np
import pytest

from endosr.config.options import dict_to_nonedict
from endosr.models.f_depthcond import FModelDepthCond

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles

RNG = np.random.default_rng(5)


def _opt(bucket):
    return dict_to_nonedict({
        "is_train": False,
        "model": "sftmd_depthCond",
        "scale": 4,
        "eval_bucket_multiple": bucket,
        "datasets": {"test": {"phase": "test", "depthMaskNum": 4, "LR_size": 16}},
        "network_G": {
            "which_model_G": "DepthNet", "in_nc": 3, "out_nc": 3, "nf": 64,
            "nb": 16, "depth_latent_ch": 16, "use_trainable_params": True,
            "which_ResBlk_depth": [0, 1],
        },
        "path": {},
    })


def _batch(h, w, k=4):
    return {
        "LQ": RNG.random((1, h, w, 3), dtype=np.float32),
        "Depth": RNG.random((1, h, w, 1), dtype=np.float32),
        "DepthMaskList": (RNG.random((1, h, w, k)) > 0.8).astype(np.float32),
    }


def test_one_compile_per_bucket():
    model = FModelDepthCond(_opt(bucket=16))
    shapes = [(13, 17), (14, 18), (15, 19), (9, 30)]
    for h, w in shapes:
        model.feed_data(_batch(h, w))
        model.test()
        assert model.fake_SR.shape == (1, h * 4, w * 4, 3)
        assert np.isfinite(model.fake_SR).all()
    # (13,17)->(16,32), (14,18)->(16,32), (15,19)->(16,32), (9,30)->(16,32)
    assert model._apply_bucket_jit._cache_size() == 1


def test_bucketed_eval_is_exact():
    """The masked-eval path (zero pad + valid_hw + host pool mask) must match
    the per-shape unpadded forward to fp32 reduction-order noise — bucketing
    is EXACT, not approximate (VERDICT r1 item 6)."""
    for h, w in [(13, 17), (16, 16), (15, 10)]:
        b = _batch(h, w)
        model = FModelDepthCond(_opt(bucket=0))  # explicit off: per-shape
        model.feed_data(b)
        model.test()
        exact = model.fake_SR.copy()

        bucketed = FModelDepthCond(_opt(bucket=16))
        bucketed.state = model.state  # same params
        bucketed.feed_data(b)
        bucketed.test()
        np.testing.assert_allclose(bucketed.fake_SR, exact,
                                   rtol=0, atol=2e-5)


def test_masked_forward_exact_all_scales():
    """DepthNet(valid_hw=…) must reproduce the unpadded forward at every
    scale wiring — ×8 (upscale1-defer fold), ×4, ×3 (final_scale 3) and ×2
    exercise different tails — including odd valid sizes."""
    import jax
    import jax.numpy as jnp

    from endosr.nn.depthnet import DepthNet
    from endosr.ops.masks import depth_masks_np, pool_mask_np

    rng = np.random.default_rng(3)
    for scale, (h, w) in [(4, (13, 17)), (8, (11, 14)), (2, (15, 10)),
                          (3, (9, 21))]:
        lq = rng.random((1, h, w, 3), dtype=np.float32)
        dep = rng.random((1, h, w, 1), dtype=np.float32)
        masks = depth_masks_np(dep[0, ..., 0], True, 6)[None].astype(np.float32)
        net = DepthNet(which_resblk_depth=tuple(range(14)), scale=scale,
                       depth_latent_ch=16, depth_range_num=6)
        params = net.init(jax.random.PRNGKey(scale), lq, dep, masks)["params"]
        ref = np.asarray(net.apply({"params": params}, lq, dep, masks))
        B = 8
        hb, wb = -(-h // B) * B, -(-w // B) * B
        pad = ((0, 0), (0, hb - h), (0, wb - w), (0, 0))
        v3h, v3w = ((h + 1) // 2 + 1) // 2, ((w + 1) // 2 + 1) // 2
        pm = pool_mask_np(masks, (v3h, v3w), (hb // 4, wb // 4))
        out = np.asarray(net.apply(
            {"params": params}, np.pad(lq, pad), np.pad(dep, pad),
            np.pad(masks, pad),
            valid_hw=(jnp.int32(h), jnp.int32(w)), pool_mask=pm))
        np.testing.assert_allclose(out[:, :h * scale, :w * scale], ref,
                                   rtol=0, atol=2e-5,
                                   err_msg=f"x{scale} ({h},{w})")


def test_x8_ensemble_bucketed_matches_exact():
    """test_x8 routes every transformed view through the exact bucketed
    path — the ensemble must match the per-shape-compile ensemble."""
    b = _batch(13, 10)
    model = FModelDepthCond(_opt(bucket=0))
    model.feed_data(b)
    model.test_x8()
    exact = model.fake_H.copy()

    bucketed = FModelDepthCond(_opt(bucket=16))
    bucketed.state = model.state
    bucketed.feed_data(b)
    bucketed.test_x8()
    np.testing.assert_allclose(bucketed.fake_H, exact, rtol=0, atol=2e-5)


def test_unsupported_configs_fall_back_to_per_shape():
    """Default-on bucketing must not break configs the masked program
    rejects (ablations, bf16c centered modes) — test() falls back to the
    per-shape path instead of raising."""
    o = _opt(bucket=None)  # default-on (32)
    o["network_G"]["ablate_depth_matrix"] = True
    o["datasets"]["test"]["LR_size"] = 13  # ablation encoder needs odd h/w
    m = FModelDepthCond(o)
    m.feed_data(_batch(13, 13))
    m.test()
    assert m.fake_SR.shape == (1, 52, 52, 3)
    # the masked bucket program was never invoked (per-shape fallback)
    assert (m._apply_bucket_jit is None
            or m._apply_bucket_jit._cache_size() == 0)

    o2 = _opt(bucket=None)
    o2["precision"] = "bf16c3"
    m2 = FModelDepthCond(o2)
    m2.feed_data(_batch(12, 12))
    m2.test()
    assert m2.fake_SR.shape == (1, 48, 48, 3)
