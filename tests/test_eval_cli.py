"""End-to-end eval driver: test.py over an EndoScene-style dataset.

Covers the reference flow ``codes/test.py`` (config → EndoScene_Depth
dataset → model.test → PNG + TSV) including the factory fix for the
EndoScene mode (SURVEY §2.9-1) and the real (non-stubbed) PSNR/SSIM columns
(§2.9-3).
"""

import os
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles


@pytest.fixture
def endoscene_dirs(tmp_path):
    import cv2

    scale, lr_size, n = 4, 12, 3
    gt = lr_size * scale
    rng = np.random.default_rng(17)
    (tmp_path / "GT").mkdir()
    (tmp_path / "LR" / f"x{scale}").mkdir(parents=True)
    (tmp_path / "depth").mkdir()
    names = []
    for i in range(n):
        name = f"frame{i:02d}.png"
        names.append(name)
        hr = (rng.random((gt, gt, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "GT" / name), hr)
        lrim = cv2.resize(hr, (lr_size, lr_size), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(tmp_path / "LR" / f"x{scale}" / name), lrim)
        np.save(tmp_path / "depth" / f"frame{i:02d}_disp.npy",
                rng.random((1, 1, lr_size, lr_size)).astype(np.float32))
    (tmp_path / "split.txt").write_text("\n".join(names) + "\n")
    return tmp_path, scale, lr_size


def test_eval_cli_endoscene(endoscene_dirs, tmp_path, monkeypatch):
    root, scale, lr_size = endoscene_dirs
    cfg = {
        "name": "eval_smoke",
        "model": "sftmd_depthCond",
        "scale": scale,
        "gpu_ids": [0],
        "datasets": {
            "test_1": {
                "name": "endoscene_synth",
                "mode": "EndoScene_Depth",
                "phase": "test",
                "dataroot_GT": str(root / "GT"),
                "dataroot_LQ": str(root / "LR"),
                "dataroot_depthMap": str(root / "depth"),
                "dataset_split_list": str(root / "split.txt"),
                "depthMaskNum": 10,
                "depthFixedRange": True,
            },
        },
        "network_G": {
            "which_model_G": "DepthNet",
            "in_nc": 3, "out_nc": 3, "nf": 64, "nb": 16,
            "depth_latent_ch": 16,
            "use_trainable_params": True,
            "which_ResBlk_depth": [0, 1],
        },
        "path": {"root": str(tmp_path / "run")},
    }
    opt_path = tmp_path / "test_opt.yml"
    opt_path.write_text(yaml.dump(cfg))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import test as test_cli

    monkeypatch.setattr(sys, "argv", ["test.py", "-opt_F", str(opt_path)])
    test_cli.main()

    results = tmp_path / "run" / "results" / "eval_smoke"
    tsv = results / f"result_x{scale}.tsv"
    assert tsv.exists()
    lines = tsv.read_text().strip().splitlines()
    assert lines[0].split("\t") == ["Name", "PSNR", "SSIM", "PSNR_Y", "SSIM_Y"]
    assert lines[-1].startswith("Average")
    # real (non-stubbed) metrics: finite, positive PSNR on random data
    avg_psnr = float(lines[-1].split("\t")[1])
    assert 3.0 < avg_psnr < 60.0
    pngs = sorted((results / f"x{scale}").glob("*.png"))
    assert len(pngs) == 3
    import cv2

    img = cv2.imread(str(pngs[0]))
    assert img.shape == (lr_size * scale, lr_size * scale, 3)
