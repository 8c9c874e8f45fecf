"""End-to-end serving pipeline: LR frames + depth npys → SR PNGs.

Covers ``scripts/sr_pipeline.py`` (the reference's two-stage manual flow,
``README.md:34-45``, as one command) in both the plain per-chip path and
the ``--spatial`` H-sharded path on the virtual 8-device mesh.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

LATENT, MASKS, SCALE, H = 16, 10, 2, 32


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    import cv2

    from endosr.nn.depthnet import DepthNet
    from endosr.utils.checkpoint import save_pytree

    root = tmp_path_factory.mktemp("serve")
    lr_dir = root / "lr"
    depth_dir = root / "depth"
    os.makedirs(lr_dir)
    os.makedirs(depth_dir)
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((H, H, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(lr_dir / f"f{i}.png"), img)
        np.save(depth_dir / f"f{i}_disp.npy",
                rng.random((1, 1, H, H)).astype(np.float32))

    net = DepthNet(which_resblk_depth=tuple(range(14)), scale=SCALE,
                   depth_latent_ch=LATENT, depth_range_num=MASKS)
    dummy = (jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 1)),
             jnp.zeros((1, H, H, MASKS)))
    params = net.init(jax.random.PRNGKey(0), *dummy)["params"]
    ckpt_path = str(root / "g.ckpt")
    save_pytree(params, ckpt_path)
    return root, str(lr_dir), str(depth_dir), ckpt_path


def _run(pipeline_env, out_name, extra):
    import sr_pipeline

    root, lr_dir, depth_dir, ckpt_path = pipeline_env
    out = str(root / out_name)
    sr_pipeline.main([
        "--input", lr_dir, "--output", out, "--model", ckpt_path,
        "--scale", str(SCALE), "--depth_dir", depth_dir,
        "--latent", str(LATENT),
        "--mask_num", str(MASKS), *extra,
    ])
    pngs = sorted(os.listdir(out))
    assert pngs == ["f0.png", "f1.png", "f2.png"]
    import cv2

    sr = cv2.imread(os.path.join(out, pngs[0]))
    assert sr.shape == (H * SCALE, H * SCALE, 3)
    return out


def test_pipeline_writes_sr_frames(pipeline_env):
    _run(pipeline_env, "out_plain", [])


def test_pipeline_spatial_matches_plain(pipeline_env):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    import cv2

    plain = _run(pipeline_env, "out_plain2", [])
    spatial = _run(pipeline_env, "out_spatial", ["--spatial"])
    for name in ("f0.png", "f1.png", "f2.png"):
        a = cv2.imread(os.path.join(plain, name)).astype(np.int16)
        b = cv2.imread(os.path.join(spatial, name)).astype(np.int16)
        # uint8-quantized outputs; SPMD reduction order may flip a few LSBs
        assert np.max(np.abs(a - b)) <= 1
