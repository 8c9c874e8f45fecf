"""Training-wrapper smoke tests: every registry entry runs a jitted step."""

import numpy as np
import pytest

from endosr.config.options import dict_to_nonedict

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles

RNG = np.random.default_rng(5)


def _train_block(**over):
    t = {
        "lr_G": 1e-4, "lr_scheme": "MultiStepLR", "lr_steps": [100],
        "lr_gamma": 0.5, "beta1": 0.9, "beta2": 0.99, "niter": 4,
        "warmup_iter": -1, "pixel_criterion": "l1", "pixel_weight": 1.0,
        "manual_seed": 0, "val_freq": 100,
    }
    t.update(over)
    return t


def _opt(model, network_g, train_over=None, **top):
    opt = {
        "is_train": True,
        "model": model,
        "scale": top.pop("scale", 4),
        "datasets": {"train": {"phase": "train", "LR_size": 8, "GT_size": 32,
                               "batch_size": 2, "depthMaskNum": 10}},
        "network_G": network_g,
        "path": {},
        "train": _train_block(**(train_over or {})),
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
    }
    opt.update(top)
    return dict_to_nonedict(opt)


def test_sr_model_step():
    from endosr.models import create_model

    opt = _opt("sr", {"which_model_G": "MSRResNet", "in_nc": 3, "out_nc": 3,
                      "nf": 16, "nb": 2})
    m = create_model(opt)
    batch = {
        "LQ": RNG.random((2, 8, 8, 3)).astype(np.float32),
        "GT": RNG.random((2, 32, 32, 3)).astype(np.float32),
    }
    m.feed_data(batch)
    m.optimize_parameters(1)
    assert np.isfinite(m.log_dict["l_pix"])
    m.test()
    assert m.fake_SR.shape == (2, 32, 32, 3)
    m.test_x8()
    assert m.fake_H.shape == (2, 32, 32, 3)


def test_predictor_corrector_models():
    from endosr.models import create_model

    opt = _opt("predictor", {"which_model_G": "Predictor", "in_nc": 3,
                             "nf": 16, "code_length": 10})
    p = create_model(opt)
    lr_img = RNG.random((2, 8, 8, 3)).astype(np.float32)
    ker = RNG.random((2, 10)).astype(np.float32)
    p.feed_data(lr_img, ker)
    p.optimize_parameters(1)
    assert np.isfinite(p.log_dict["l_pix"])
    p.test()
    assert p.fake_ker.shape == (2, 10)

    opt = _opt("corrector", {"which_model_G": "Corrector", "in_nc": 3,
                             "nf": 16, "code_length": 10})
    c = create_model(opt)
    sr_img = RNG.random((2, 8, 8, 3)).astype(np.float32)
    c.feed_data(sr_img, p.fake_ker, ker)
    c.optimize_parameters(1)
    assert np.isfinite(c.log_dict["l_pix"])
    c.test()
    assert c.fake_ker.shape == (2, 10)


def test_srgan_model_steps():
    from endosr.models import create_model

    opt = _opt(
        "srgan",
        {"which_model_G": "MSRResNet", "in_nc": 3, "out_nc": 3, "nf": 16,
         "nb": 1},
        train_over={"gan_type": "ragan", "gan_weight": 5e-3,
                    "pixel_weight": 1e-2, "feature_weight": 0,
                    "D_update_ratio": 2, "D_init_iters": 0, "lr_D": 1e-4},
        network_D={"which_model_D": "discriminator_vgg_128", "in_nc": 3,
                   "nf": 8},
    )
    m = create_model(opt)
    batch = {
        "LQ": RNG.random((2, 8, 8, 3)).astype(np.float32),
        "GT": RNG.random((2, 32, 32, 3)).astype(np.float32),
    }
    m.feed_data(batch)
    m.optimize_parameters(1)  # D-only step (1 % 2 != 0)
    assert "l_d_real" in m.log_dict and "l_g_pix" not in m.log_dict
    m.feed_data(batch)
    m.optimize_parameters(2)  # G+D step
    assert "l_g_gan" in m.log_dict and np.isfinite(m.log_dict["l_g_gan"])
    m.test()
    assert m.fake_H.shape == (2, 32, 32, 3)


def test_sftgan_model_step():
    from endosr.models import create_model

    opt = _opt(
        "sftgan", {"which_model_G": "sft_arch"},
        train_over={"gan_type": "gan", "gan_weight": 5e-3,
                    "pixel_weight": 1.0, "feature_weight": 0,
                    "D_update_ratio": 1, "D_init_iters": 0,
                    "lr_D": 1e-4, "beta1_G": 0.9, "beta1_D": 0.9},
    )
    opt["datasets"]["train"]["LR_size"] = 8
    m = create_model(opt)
    batch = {
        "LR": RNG.random((2, 8, 8, 3)).astype(np.float32),
        "GT": RNG.random((2, 32, 32, 3)).astype(np.float32),
        "seg": RNG.random((2, 32, 32, 8)).astype(np.float32),
        "category": np.array([1, 0], np.int64),
    }
    m.feed_data(batch)
    m.optimize_parameters(1)
    assert np.isfinite(m.log_dict["l_d_real"])
    assert "l_g_gan" in m.log_dict
    m.test()
    assert m.fake_H.shape == (2, 32, 32, 3)


def test_f_depthseg_model_step():
    from endosr.models import create_model

    opt = _opt(
        "sftmd_depthSegNet",
        {"which_model_G": "DepthNet", "in_nc": 3, "out_nc": 3, "nf": 64,
         "nb": 6, "depth_latent_ch": 16, "which_ResBlk_depth": [0],
         "use_trainable_params": True},
        train_over={
            "lr_scheme": "CosineAnnealingLR_Restart",
            "T_period": [4, 4], "restarts": [4], "restart_weights": [1],
            "eta_min": 1e-7,
            "depth_loss": {"use_depth_criterion": False},
            "vgg_loss": {"use_vgg_criterion": False},
            "ssim_loss": {"use_ssim_criterion": False},
            "mask_loss": {"use_mask_criterion": False},
            "dynamic_loss": {"use_dynamic_criterion": True,
                             "dynamic_criterion": "smoothl1",
                             "dynamic_weight": 10.0},
            "segNet": {"lr": 1e-4, "momentum": 0.9, "weight_decay": 0,
                       "setp_size": 100, "gamma": 0.5},
        },
        network_SegNet={"num_classes": 2},
    )
    m = create_model(opt)
    batch = {
        "LQ": RNG.random((2, 8, 8, 3)).astype(np.float32),
        "GT": RNG.random((2, 32, 32, 3)).astype(np.float32),
        "Depth": RNG.random((2, 8, 8, 1)).astype(np.float32),
        "DepthMaskList": (RNG.random((2, 8, 8, 10)) > 0.9).astype(np.float32),
        "SegLabel": (RNG.random((2, 32, 32, 2)) > 0.5).astype(np.float32),
    }
    m.feed_data(batch)
    m.optimize_parameters(1)
    assert np.isfinite(m.log_dict["l_segBCE"])
    assert np.isfinite(m.log_dict["l_dynamic"])


def test_f_depth_model_step():
    from endosr.models import create_model

    opt = _opt(
        "sftmd_depth",
        {"which_model_G": "SFTMD_upsacle_after_ResBlk_depth",
         "predict_depth_map": True, "n_depthResBlk": 3,
         "use_attention": False, "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 6},
        train_over={"depth_l1_weight": 1.0, "depth_ssim_weight": 1.0},
        scale=8,
    )
    m = create_model(opt)
    batch = {
        "LQ": RNG.random((2, 8, 8, 3)).astype(np.float32),
        "GT": RNG.random((2, 64, 64, 3)).astype(np.float32),
        "Depth_x8": RNG.random((2, 8, 8, 1)).astype(np.float32),
        "Depth_x4": RNG.random((2, 16, 16, 1)).astype(np.float32),
        "Depth_x2": RNG.random((2, 32, 32, 1)).astype(np.float32),
    }
    m.feed_data(batch)
    m.optimize_parameters(1)
    assert np.isfinite(m.log_dict["l_depth"])
    m.test()
    assert m.fake_SR.shape == (2, 64, 64, 3)


def test_flagship_bf16_precision_trains():
    """`precision: bf16` (bf16 compute, fp32 params + IN statistics) runs a
    finite, learning train step — the serving precision certified in
    tests/test_bf16_quality.py is also trainable."""
    import numpy as np

    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond

    opt = dict_to_nonedict({
        "is_train": True, "model": "sftmd_depthCond", "scale": 4,
        "precision": "bf16",
        "datasets": {"train": {"phase": "train", "depthMaskNum": 4,
                               "LR_size": 8, "GT_size": 32, "batch_size": 2}},
        "network_G": {"which_model_G": "DepthNet", "in_nc": 3, "out_nc": 3,
                      "nf": 64, "nb": 6, "depth_latent_ch": 16,
                      "use_trainable_params": True,
                      "which_ResBlk_depth": [0, 1]},
        "path": {},
        "train": {"lr_G": 1e-3, "lr_scheme": "MultiStepLR_Restart",
                  "beta1": 0.9, "beta2": 0.99, "niter": 10,
                  "warmup_iter": -1, "lr_steps": [5], "lr_gamma": 0.5,
                  "pixel_criterion": "l1", "pixel_weight": 1.0,
                  "dynamic_loss": {"use_dynamic_criterion": True,
                                   "dynamic_criterion": "smoothl1",
                                   "dynamic_weight": 10.0},
                  "manual_seed": 0},
        "logger": {},
    })
    model = FModelDepthCond(opt)
    rng = np.random.default_rng(2)
    batch = {
        "LQ": rng.random((2, 8, 8, 3)).astype(np.float32),
        "GT": rng.random((2, 32, 32, 3)).astype(np.float32),
        "Depth": rng.random((2, 8, 8, 1)).astype(np.float32),
        "DepthMaskList": (rng.random((2, 8, 8, 4)) > 0.7).astype(np.float32),
    }
    losses = []
    for i in range(6):
        model.feed_data(batch)
        model.optimize_parameters(i)
        losses.append(model.get_current_log()["l_all"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params stayed fp32 (bf16 is compute-only)
    import jax.numpy as jnp

    leaf = model.state.params["netG"]["head_0"]["v"]
    assert leaf.dtype == jnp.float32


def test_flagship_u8_pipeline_bit_identical_step():
    """`u8_pipeline: true` ships uint8 batches (4× less host + H2D traffic);
    the jitted step's device-side astype(f32)/255 must make the training
    step bit-identical to the fp32 pipeline."""
    import numpy as np

    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond

    def build():
        return dict_to_nonedict({
            "is_train": True, "model": "sftmd_depthCond", "scale": 4,
            "datasets": {"train": {"phase": "train", "depthMaskNum": 4,
                                   "LR_size": 8, "GT_size": 32,
                                   "batch_size": 2}},
            "network_G": {"which_model_G": "DepthNet", "in_nc": 3,
                          "out_nc": 3, "nf": 64, "nb": 6,
                          "depth_latent_ch": 16,
                          "use_trainable_params": True,
                          "which_ResBlk_depth": [0, 1]},
            "path": {},
            "train": {"lr_G": 1e-3, "lr_scheme": "MultiStepLR",
                      "beta1": 0.9, "beta2": 0.99, "niter": 10,
                      "warmup_iter": -1, "lr_steps": [5], "lr_gamma": 0.5,
                      "pixel_criterion": "l1", "pixel_weight": 1.0,
                      "dynamic_loss": {"use_dynamic_criterion": True,
                                       "dynamic_criterion": "smoothl1",
                                       "dynamic_weight": 10.0},
                      "manual_seed": 0},
            "logger": {},
        })

    rng = np.random.default_rng(4)
    lq8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    gt8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    dep = rng.random((2, 8, 8, 1)).astype(np.float32)
    m8 = (rng.random((2, 8, 8, 4)) > 0.7).astype(np.uint8)

    logs = []
    for batch in (
        {"LQ": lq8.astype(np.float32) / 255.0,
         "GT": gt8.astype(np.float32) / 255.0,
         "Depth": dep, "DepthMaskList": m8.astype(np.float32)},
        {"LQ": lq8, "GT": gt8, "Depth": dep, "DepthMaskList": m8},
    ):
        model = FModelDepthCond(build())
        for i in range(3):
            model.feed_data(batch)
            model.optimize_parameters(i)
        logs.append(model.get_current_log())
    assert logs[0]["l_all"] == logs[1]["l_all"]
    assert logs[0]["l_dynamic"] == logs[1]["l_dynamic"]
