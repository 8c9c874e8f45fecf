"""monodepth2 subsystem parity: networks, geometry, losses."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.conftest import requires_reference

pytestmark = pytest.mark.slow  # torch oracles / e2e / full-net compiles

RNG = np.random.default_rng(7)


def test_disp_to_depth_matches_reference_formula():
    from endosr.depth.layers import disp_to_depth

    disp = RNG.random((2, 8, 8, 1)).astype(np.float32)
    scaled, depth = disp_to_depth(disp, 0.1, 100.0)
    want_scaled = 1 / 100 + (1 / 0.1 - 1 / 100) * disp
    np.testing.assert_allclose(np.asarray(scaled), want_scaled, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), 1 / want_scaled, rtol=1e-5)


@requires_reference
def test_se3_matches_reference(reference_path):
    import importlib.util as ilu
    import sys

    sys.path.insert(0, str(reference_path / "depth_estimation"))
    spec = ilu.spec_from_file_location(
        "ref_layers", reference_path / "depth_estimation" / "layers.py")
    ref = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from endosr.depth.layers import transformation_from_parameters

    axis = RNG.normal(0, 0.2, (3, 1, 3)).astype(np.float32)
    trans = RNG.normal(0, 0.1, (3, 1, 3)).astype(np.float32)
    for invert in (False, True):
        got = np.asarray(
            transformation_from_parameters(axis, trans, invert=invert))
        want = ref.transformation_from_parameters(
            torch.from_numpy(axis), torch.from_numpy(trans), invert=invert
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_matches_torch():
    from endosr.depth.layers import grid_sample

    img = RNG.random((2, 9, 11, 3)).astype(np.float32)
    grid = (RNG.random((2, 5, 7, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    got = np.asarray(grid_sample(img, grid))
    want = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_reference
def test_monodepth_ssim_and_smoothness(reference_path):
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_layers2", reference_path / "depth_estimation" / "layers.py")
    ref = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from endosr.depth.layers import get_smooth_loss, ssim_monodepth

    x = RNG.random((2, 12, 12, 3)).astype(np.float32)
    y = RNG.random((2, 12, 12, 3)).astype(np.float32)
    got = np.asarray(ssim_monodepth(x, y))
    want = ref.SSIM()(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)

    disp = RNG.random((2, 12, 12, 1)).astype(np.float32)
    got_s = float(get_smooth_loss(disp, x))
    want_s = float(ref.get_smooth_loss(
        torch.from_numpy(disp).permute(0, 3, 1, 2),
        torch.from_numpy(x).permute(0, 3, 1, 2)))
    assert got_s == pytest.approx(want_s, rel=1e-5)


@requires_reference
def test_backproject_project_roundtrip(reference_path):
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_layers3", reference_path / "depth_estimation" / "layers.py")
    ref = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from endosr.depth.layers import backproject_depth, project_3d

    b, h, w = 2, 6, 8
    k = np.eye(4, dtype=np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = 3.0, 3.5, w / 2, h / 2
    k = np.tile(k, (b, 1, 1))
    inv_k = np.linalg.inv(k)
    depth = (RNG.random((b, h, w, 1)) * 5 + 1).astype(np.float32)
    t = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    t[:, 0, 3] = 0.3

    got_pts = np.asarray(backproject_depth(depth, inv_k))
    ref_bp = ref.BackprojectDepth(b, h, w)
    want_pts = ref_bp(
        torch.from_numpy(depth).permute(0, 3, 1, 2), torch.from_numpy(inv_k)
    ).numpy()
    np.testing.assert_allclose(got_pts, want_pts, rtol=1e-4, atol=1e-5)

    got_pix = np.asarray(project_3d(got_pts, k, t, h, w))
    ref_p3 = ref.Project3D(b, h, w)
    want_pix = ref_p3(torch.from_numpy(want_pts), torch.from_numpy(k),
                      torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(got_pix, want_pix, rtol=1e-4, atol=1e-5)


def _torch_resnet18():
    """Minimal torchvision-layout ResNet-18 (oracle; torchvision not in image)."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, inp, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

    return ResNet18()


def _monodepth_encoder_forward(encoder, x):
    """monodepth2 ResnetEncoder.forward semantics on a torch resnet."""
    feats = []
    h = (x - 0.45) / 0.225
    h = encoder.relu(encoder.bn1(encoder.conv1(h)))
    feats.append(h)
    feats.append(encoder.layer1(encoder.maxpool(feats[-1])))
    feats.append(encoder.layer2(feats[-1]))
    feats.append(encoder.layer3(feats[-1]))
    feats.append(encoder.layer4(feats[-1]))
    return feats


@requires_reference
def test_resnet_encoder_depth_decoder_parity(reference_path):
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_ddec", reference_path / "depth_estimation" / "networks" /
        "depth_decoder.py")
    # depth_decoder does `from layers import *`
    import sys

    sys.path.insert(0, str(reference_path / "depth_estimation"))
    ddec_mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(ddec_mod)
    TDec = ddec_mod.DepthDecoder

    import jax

    from endosr.nn.monodepth import (
        DepthDecoder,
        ResnetEncoder,
        port_depth_decoder,
        port_resnet_encoder,
    )

    torch.manual_seed(0)
    tenc_net = _torch_resnet18().eval()
    # randomize BN running stats so the frozen-stats path is exercised
    with torch.no_grad():
        for m in tenc_net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tdec = TDec(np.array([64, 64, 128, 256, 512])).eval()
    enc_sd = {f"encoder.{k}": v.detach().numpy()
              for k, v in tenc_net.state_dict().items()}
    dec_sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}

    jenc = ResnetEncoder(num_layers=18)
    jdec = DepthDecoder(num_ch_enc=tuple(jenc.num_ch_enc))
    x = RNG.random((1, 64, 64, 3)).astype(np.float32)
    enc_vars = jenc.init(jax.random.PRNGKey(0), x, train=False)
    enc_vars = port_resnet_encoder(enc_sd, enc_vars)
    feats = jenc.apply(enc_vars, x, train=False)
    dec_vars = jdec.init(jax.random.PRNGKey(0), feats)
    dec_vars = port_depth_decoder(dec_sd, dec_vars)
    outs = jdec.apply(dec_vars, feats)

    with torch.no_grad():
        tfeats = _monodepth_encoder_forward(
            tenc_net, torch.from_numpy(x).permute(0, 3, 1, 2))
        touts = tdec(tfeats)

    for i, (jf, tf_) in enumerate(zip(feats, tfeats)):
        np.testing.assert_allclose(
            np.asarray(jf), tf_.permute(0, 2, 3, 1).numpy(), atol=1e-4,
            err_msg=f"encoder feature {i}")
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(outs[("disp", s)]),
            touts[("disp", s)].permute(0, 2, 3, 1).numpy(), atol=1e-5,
            err_msg=f"disp scale {s}")


@requires_reference
def test_pose_decoder_parity(reference_path):
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_pose", reference_path / "depth_estimation" / "networks" /
        "pose_decoder.py")
    pose_mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(pose_mod)
    TPose = pose_mod.PoseDecoder

    import jax

    from endosr.nn.monodepth import PoseDecoder, port_pose_decoder

    torch.manual_seed(1)
    tpose = TPose(np.array([64, 64, 128, 256, 512]), num_input_features=1,
                  num_frames_to_predict_for=2).eval()
    sd = {k: v.detach().numpy() for k, v in tpose.state_dict().items()}

    jpose = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    feat = RNG.random((2, 4, 5, 512)).astype(np.float32)
    variables = jpose.init(jax.random.PRNGKey(0), [[feat]])
    variables = port_pose_decoder(sd, variables)
    ja, jt = jpose.apply(variables, [[feat]])
    with torch.no_grad():
        ta, tt = tpose([[torch.from_numpy(feat).permute(0, 3, 1, 2)]])
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=1e-6)
