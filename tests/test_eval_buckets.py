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
    assert model._apply_jit._cache_size() == 1


def test_no_bucket_compiles_per_shape_and_is_exact():
    model = FModelDepthCond(_opt(bucket=None))
    b = _batch(16, 16)
    model.feed_data(b)
    model.test()
    exact = model.fake_SR.copy()

    bucketed = FModelDepthCond(_opt(bucket=16))
    bucketed.state = model.state  # same params
    bucketed.feed_data(b)
    bucketed.test()
    # aligned shapes take the no-pad path — bit-identical to the exact run
    np.testing.assert_array_equal(exact, bucketed.fake_SR)
