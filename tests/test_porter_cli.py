"""End-to-end checkpoint porter: torch .pth → flax .ckpt → identical outputs."""

import subprocess
import sys

import numpy as np
import pytest
import torch
import yaml

from tests.conftest import REPO_ROOT, requires_reference

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles


@requires_reference
def test_port_torch_checkpoint_cli(reference_path, tmp_path):
    from models.modules.sftmd_arch import DepthNet as TorchDepthNet

    torch.manual_seed(3)
    tnet = TorchDepthNet(
        which_ResBlk_depth=[0, 1], in_nc=3, out_nc=3, nf=64, nb=6, scale=4,
        depth_latent_ch=16, depthRangeNum=10, norm_type="weight_norm",
    ).eval()
    pth = tmp_path / "gen.pth"
    torch.save(tnet.state_dict(), pth)

    cfg = {
        "name": "porter_test", "model": "sftmd_depthCond", "scale": 4,
        "datasets": {"test_1": {"name": "t", "mode": "LQGTker_Depth",
                                "dataroot_GT": "/tmp", "LR_size": 8,
                                "GT_size": 32, "depthMaskNum": 10}},
        "network_G": {"which_model_G": "DepthNet", "in_nc": 3, "out_nc": 3,
                      "nf": 64, "nb": 6, "upscale": 4, "depth_latent_ch": 16,
                      "which_ResBlk_depth": [0, 1],
                      "use_trainable_params": True},
        "path": {},
    }
    opt_path = tmp_path / "opt.yml"
    opt_path.write_text(yaml.dump(cfg))
    out_path = tmp_path / "gen.ckpt"

    r = subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools/port_torch_checkpoint.py"),
         "--pth", str(pth), "--opt", str(opt_path), "--out", str(out_path)],
        capture_output=True, text=True, cwd=str(REPO_ROOT),
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/local/bin:/usr/bin:/bin",
             "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_path.exists()

    # load through the model path and compare against torch
    import jax

    from endosr.nn.depthnet import DepthNet
    from endosr.utils.checkpoint import load_network

    jnet = DepthNet(which_resblk_depth=(0, 1), scale=4, nb=6,
                    depth_latent_ch=16)
    rng = np.random.default_rng(0)
    lq = rng.random((1, 8, 8, 3), dtype=np.float32)
    d = rng.random((1, 8, 8, 1), dtype=np.float32)
    m = (rng.random((1, 8, 8, 10)) > 0.9).astype(np.float32)
    template = jnet.init(jax.random.PRNGKey(0), lq, d, m)["params"]

    for src in (str(out_path), str(pth)):  # .ckpt and direct .pth load
        params = load_network(src, template)
        got = np.asarray(jnet.apply({"params": params}, lq, d, m))
        with torch.no_grad():
            want = tnet(
                torch.from_numpy(lq).permute(0, 3, 1, 2),
                torch.from_numpy(d).permute(0, 3, 1, 2),
                torch.from_numpy(m).permute(0, 3, 1, 2),
            ).permute(0, 2, 3, 1).numpy()
        assert np.max(np.abs(got - want)) < 2e-4, src
