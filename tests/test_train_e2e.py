"""End-to-end flagship training smoke on synthetic data.

Builds a tiny on-disk Kvasir-style dataset (LR/GT PNG pairs + monodepth2-
convention ``*_disp.npy``), drives config→data→model→train-step for a few
iterations (the reference's debug-mode fast path, ``options.py:68-71``),
checks the loss moves and checkpoint/resume round-trips.
"""

import os

import numpy as np
import pytest
import yaml

from endosr.config import options as option

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("kvasir_synth")
    scale, lr, n = 4, 12, 6
    gt = lr * scale
    rng = np.random.default_rng(0)
    for sub in ("HR/train", "LR/train", "depth/train"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(n):
        hr_img = (rng.random((gt, gt, 3)) * 255).astype(np.uint8)
        lr_img = cv2.resize(hr_img, (lr, lr), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(root / "HR/train" / f"img{i:03d}.png"), hr_img)
        cv2.imwrite(str(root / "LR/train" / f"img{i:03d}.png"), lr_img)
        disp = rng.random((1, 1, lr, lr)).astype(np.float32)
        np.save(root / "depth/train" / f"img{i:03d}_disp.npy", disp)
    return root, scale, lr, gt, n


def _write_config(tmp_path, root, scale, lr, gt):
    cfg = {
        "name": "debug_smoke",
        "model": "sftmd_depthCond",
        "scale": scale,
        "is_train": True,
        "datasets": {
            "train": {
                "name": "synth",
                "mode": "LQGTker_Depth",
                "dataroot_GT": str(root / "HR/train"),
                "dataroot_LQ": str(root / "LR/train"),
                "dataroot_depthMap": str(root / "depth/train"),
                "use_shuffle": True,
                "batch_size": 2,
                "GT_size": gt,
                "LR_size": lr,
                "use_flip": True,
                "use_rot": True,
                "color": "RGB",
                "depthMaskNum": 10,
                "depthFixedRange": False,
            },
        },
        "network_G": {
            "which_model_G": "DepthNet",
            "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 6,
            "depth_latent_ch": 16,
            "use_trainable_params": True,
            "which_ResBlk_depth": [0, 1, 2],
        },
        "path": {},
        "train": {
            "lr_G": 1e-3, "lr_scheme": "CosineAnnealingLR_Restart",
            "beta1": 0.9, "beta2": 0.99, "niter": 8, "warmup_iter": -1,
            "T_period": [4, 4], "restarts": [4], "restart_weights": [1],
            "eta_min": 1e-7,
            "pixel_criterion": "l1", "pixel_weight": 1.0,
            "depth_loss": {"use_depth_criterion": False},
            "vgg_loss": {"use_vgg_criterion": False},
            "ssim_loss": {"use_ssim_criterion": False},
            "mask_loss": {"use_mask_criterion": True,
                          "mask_criterion": "smoothl1", "mask_weight": 1.0},
            "dynamic_loss": {"use_dynamic_criterion": True,
                             "dynamic_criterion": "smoothl1",
                             "dynamic_weight": 10.0},
            "manual_seed": 0, "val_freq": 8,
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 8},
    }
    p = tmp_path / "opt.yml"
    p.write_text(yaml.dump(cfg))
    return p


def test_flagship_train_smoke(synth_dataset, tmp_path):
    root, scale, lr, gt, n = synth_dataset
    opt_path = _write_config(tmp_path, root, scale, lr, gt)
    opt = option.parse(str(opt_path), is_train=True, root=str(tmp_path))
    opt["dist"] = False
    opt = option.dict_to_nonedict(opt)

    from endosr.data import create_dataloader, create_dataset
    from endosr.models import create_model

    train_set = create_dataset(opt["datasets"]["train"])
    assert len(train_set) == n
    sample = train_set[0]
    assert sample["LQ"].shape == (lr, lr, 3)
    assert sample["GT"].shape == (gt, gt, 3)
    assert sample["Depth"].shape == (lr, lr, 1)
    assert sample["DepthMaskList"].shape == (lr, lr, 10)

    loader = create_dataloader(train_set, opt["datasets"]["train"], opt)
    model = create_model(opt)

    losses = []
    step = 0
    for epoch in range(4):
        loader.set_epoch(epoch)
        for batch in loader:
            model.feed_data(batch)
            model.optimize_parameters(step)
            logs = model.get_current_log()
            assert "l_pix" in logs and "l_dynamic" in logs and "l_mask" in logs
            assert "dyn_w_0" in logs
            losses.append(logs["l_all"])
            step += 1
            if step >= 8:
                break
        if step >= 8:
            break

    assert np.isfinite(losses).all()
    # the optimizer actually learns: loss drops materially within 8 steps
    # (fixed tiny dataset repeats, so this is a strong signal)
    assert min(losses[-3:]) < 0.7 * losses[0], losses
    # trainable dynamic weights should sum to 1 under softmax
    w = [model.log_dict[f"dyn_w_{i}"] for i in range(10)]
    assert abs(sum(w) - 1.0) < 1e-4

    # checkpoint round-trip
    os.makedirs(opt["path"]["models"], exist_ok=True)
    os.makedirs(opt["path"]["training_state"], exist_ok=True)
    model.save(step)
    model.save_training_state(0, step)

    # inference path
    model.feed_data(next(iter(loader)))
    model.test()
    vis = model.get_current_visuals()
    assert vis["SR"].shape == (gt, gt, 3)
    assert vis["SR"].min() >= 0.0 and vis["SR"].max() <= 1.0

    # resume restores the step counter
    state_path = os.path.join(opt["path"]["training_state"], f"{step}.state")
    epoch_r, iter_r = model.resume_training(state_path)
    assert iter_r == step

    # LR schedule follows the cosine-restart closed form
    lr0 = model.get_current_learning_rate(0)
    assert lr0 == pytest.approx(1e-3, rel=1e-5)
    lr_restart = model.get_current_learning_rate(4)
    assert lr_restart == pytest.approx(1e-3, rel=1e-5)
    lr_mid = model.get_current_learning_rate(2)
    assert lr_mid < lr0
