"""Self-supervised depth trainer smoke: one jitted step on synthetic video."""

import os
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles


def _make_opts(tmp_path, h=32, w=32):
    from endosr.depth.options import MonodepthOptions

    opts = MonodepthOptions().parse([
        "--data_path", str(tmp_path), "--log_dir", str(tmp_path / "logs"),
        "--height", str(h), "--width", str(w), "--batch_size", "2",
        "--num_epochs", "1", "--log_frequency", "1",
    ])
    return opts


def _synth_frames(tmp_path, n=8, h=48, w=48):
    import cv2

    rng = np.random.default_rng(0)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    for i in range(n):
        shifted = np.roll(base, shift=i * 2, axis=1)
        cv2.imwrite(str(tmp_path / f"{i:010d}.jpg"), shifted)


def test_depth_trainer_step(tmp_path):
    _synth_frames(tmp_path)
    opts = _make_opts(tmp_path)

    from endosr.depth.datasets import SequenceFolderDataset
    from endosr.depth.trainer import Trainer

    ds = SequenceFolderDataset(
        str(tmp_path), [str(i) for i in range(1, 7)], opts.height, opts.width,
        opts.frame_ids, num_scales=4, is_train=True,
    )
    item = ds[0]
    assert item[("color", 0, 0)].shape == (32, 32, 3)
    assert item[("color", -1, 0)].shape == (32, 32, 3)
    assert item[("color", 0, 3)].shape == (4, 4, 3)
    assert item[("K", 0)].shape == (4, 4)

    trainer = Trainer(opts, dataset=ds)
    trainer.opt = types.SimpleNamespace(**vars(opts))  # plain namespace
    trainer.run_epoch()
    assert trainer.step >= 1

    # eval-mode forward produces disparities at all scales
    import jax.numpy as jnp

    batch = {k: jnp.asarray(np.stack([ds[0][k], ds[1][k]])) for k in item}
    outputs, losses = trainer.process_batch(batch)
    assert ("disp", 0) in outputs
    assert outputs[("disp", 0)].shape == (2, 32, 32, 1)
    assert np.isfinite(float(losses["loss"]))

    # checkpoint round-trip
    trainer.save_model()
    folder = os.path.join(trainer.log_path, "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "encoder.ckpt"))
    trainer.opt.load_weights_folder = folder
    trainer.load_model()


def test_depth_evaluate_helpers():
    from endosr.depth.evaluate import batch_post_process_disparity, compute_ate

    rng = np.random.default_rng(1)
    l = rng.random((1, 16, 16)).astype(np.float32)
    r = rng.random((1, 16, 16)).astype(np.float32)
    out = batch_post_process_disparity(l, r)
    assert out.shape == (1, 16, 16)

    gt = np.cumsum(rng.random((5, 3)), axis=0)
    ate = compute_ate(gt, gt.copy())
    assert ate == pytest.approx(0.0, abs=1e-9)


def _stereo_pair_frames(tmp_path, n=6, h=48, w=48):
    import cv2

    rng = np.random.default_rng(2)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    for cam in (1, 2):
        d = tmp_path / "seq" / f"image0{cam}"
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            # horizontal shift between cameras emulates a stereo baseline
            shifted = np.roll(base, shift=i * 2 + (cam - 1) * 4, axis=1)
            cv2.imwrite(str(d / f"{i:010d}.jpg"), shifted)


def test_depth_trainer_stereo_step(tmp_path):
    """'s' frames: stereo_T from the dataset, finite losses in one jitted
    step (reference ``trainer.py:49-52,296-302``)."""
    _stereo_pair_frames(tmp_path)
    opts = _make_opts(tmp_path)
    opts.use_stereo = True
    opts.frame_ids = [0, -1, 1]

    from endosr.depth.datasets import EndovisDataset
    from endosr.depth.trainer import Trainer

    ds = EndovisDataset(
        str(tmp_path), [f"seq {i} l" for i in range(1, 5)], opts.height,
        opts.width, [0, -1, 1, "s"], num_scales=4, is_train=True,
        img_ext=".jpg",
    )
    item = ds[0]
    assert item[("color", "s", 0)].shape == (32, 32, 3)
    assert item["stereo_T"].shape == (4, 4)
    assert abs(item["stereo_T"][0, 3]) == pytest.approx(0.1)

    trainer = Trainer(opts, dataset=ds)
    assert trainer.frame_ids == [0, -1, 1, "s"]
    trainer.run_epoch()
    assert trainer.step >= 1

    import jax.numpy as jnp

    batch = {k: jnp.asarray(np.stack([ds[0][k], ds[1][k]])) for k in item}
    _, losses = trainer.process_batch(batch)
    assert np.isfinite(float(losses["loss"]))


def test_depth_trainer_stereo_only_no_pose_net(tmp_path):
    """Stereo-only ([0]+'s') trains without any pose networks."""
    _stereo_pair_frames(tmp_path)
    opts = _make_opts(tmp_path)
    opts.use_stereo = True
    opts.frame_ids = [0]

    from endosr.depth.datasets import EndovisDataset
    from endosr.depth.trainer import Trainer

    ds = EndovisDataset(
        str(tmp_path), [f"seq {i} r" for i in range(1, 5)], opts.height,
        opts.width, [0, "s"], num_scales=4, is_train=True, img_ext=".jpg",
    )
    trainer = Trainer(opts, dataset=ds)
    assert not trainer.use_pose_net
    assert "pose" not in trainer.variables
    trainer.run_epoch()
    assert trainer.step >= 1
