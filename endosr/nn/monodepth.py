"""monodepth2 networks in flax — the depth-estimation sub-project's models.

Twins of ``codes/depth_estimation/networks/``:
  * :class:`ResnetEncoder` — torchvision-layout ResNet-18/34/50 feature
    encoder with the (x−0.45)/0.225 input normalization and 5 feature taps
    (``resnet_encoder.py:62-98``); multi-image input supported.
  * :class:`DepthDecoder` — skip-connected upconv decoder with reflection-pad
    3×3 convs, ELU, nearest ×2 upsampling and per-scale sigmoid disparity
    heads (``depth_decoder.py:17-65``).
  * :class:`PoseDecoder` / :class:`PoseCNN` — pose regression heads
    (``pose_decoder.py:14-54``, ``pose_cnn.py:13-50``).

Conv names mirror the torch state-dict keys (``encoder.layer1.0.conv1`` →
``layer1_0/conv1``) so pretrained ``encoder.pth``/``depth.pth``/``pose.pth``
port mechanically (see ``port_resnet_encoder`` / ``port_depth_decoder``).
BatchNorm runs from ported running statistics (inference / frozen-loss mode)
or batch statistics (training).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from endosr.nn.layers import Conv
from endosr.ops.resize import interpolate_nearest

__all__ = [
    "ResnetEncoder",
    "DepthDecoder",
    "PoseDecoder",
    "PoseCNN",
    "port_resnet_encoder",
    "port_depth_decoder",
    "port_pose_decoder",
]


def _bn(name):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype)
        identity = x
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False,
                   name="conv1", **kw)(x)
        out = _bn("bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, 1, use_bias=False, name="conv2", **kw)(out)
        out = _bn("bn2")(out, use_running_average=not train)
        if self.downsample:
            identity = Conv(self.planes, 1, self.stride, 0, use_bias=False,
                            name="downsample_0", **kw)(x)
            identity = _bn("downsample_1")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype)
        identity = x
        out = Conv(self.planes, 1, 1, 0, use_bias=False, name="conv1", **kw)(x)
        out = nn.relu(_bn("bn1")(out, use_running_average=not train))
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False,
                   name="conv2", **kw)(out)
        out = nn.relu(_bn("bn2")(out, use_running_average=not train))
        out = Conv(self.planes * 4, 1, 1, 0, use_bias=False, name="conv3", **kw)(out)
        out = _bn("bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = Conv(self.planes * 4, 1, self.stride, 0, use_bias=False,
                            name="downsample_0", **kw)(x)
            identity = _bn("downsample_1")(identity, use_running_average=not train)
        return nn.relu(out + identity)


_RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2), 1),
    34: (BasicBlock, (3, 4, 6, 3), 1),
    50: (Bottleneck, (3, 4, 6, 3), 4),
}


class ResnetEncoder(nn.Module):
    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self):
        ch = np.array([64, 64, 128, 256, 512])
        if self.num_layers > 34:
            ch[1:] *= 4
        return ch

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layers, expansion = _RESNET_SPECS[self.num_layers]
        kw = dict(dtype=self.dtype)
        x = (x - 0.45) / 0.225

        features = []
        h = Conv(64, 7, 2, 3, use_bias=False, name="conv1", **kw)(x)
        h = nn.relu(_bn("bn1")(h, use_running_average=not train))
        features.append(h)

        # maxpool k3 s2 p1
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        in_planes = 64
        for li, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layers), start=1
        ):
            stride = 1 if li == 1 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_ds = s != 1 or in_planes != planes * expansion
                h = block_cls(
                    planes=planes, stride=s, downsample=need_ds,
                    name=f"layer{li}_{bi}", dtype=self.dtype,
                )(h, train)
                in_planes = planes * expansion
            features.append(h)
        return features


def _reflect_conv3x3(x, features, name, dtype):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return Conv(features, 3, 1, 0, name=name, dtype=dtype)(x)


class DepthDecoder(nn.Module):
    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = nn.elu(_reflect_conv3x3(x, num_ch_dec[i], f"upconv_{i}_0", self.dtype))
            x = interpolate_nearest(x, (x.shape[1] * 2, x.shape[2] * 2))
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = nn.elu(_reflect_conv3x3(x, num_ch_dec[i], f"upconv_{i}_1", self.dtype))
            if i in self.scales:
                outputs[("disp", i)] = nn.sigmoid(
                    _reflect_conv3x3(x, self.num_output_channels,
                                     f"dispconv_{i}", self.dtype).astype(jnp.float32)
                )
        return outputs


class PoseDecoder(nn.Module):
    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    num_input_features: int = 1
    num_frames_to_predict_for: int | None = None
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        nf = self.num_frames_to_predict_for or (self.num_input_features - 1)
        last = [f[-1] for f in input_features]
        cat = [
            nn.relu(Conv(256, 1, 1, 0, name="squeeze", dtype=self.dtype)(f))
            for f in last
        ]
        out = jnp.concatenate(cat, axis=-1)
        out = nn.relu(Conv(256, 3, self.stride, 1, name="pose_0", dtype=self.dtype)(out))
        out = nn.relu(Conv(256, 3, self.stride, 1, name="pose_1", dtype=self.dtype)(out))
        out = Conv(6 * nf, 1, 1, 0, name="pose_2", dtype=self.dtype)(out)
        out = jnp.mean(out, axis=(1, 2))
        out = 0.01 * out.reshape(-1, nf, 1, 6).astype(jnp.float32)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    num_input_frames: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        specs = [(16, 7, 2, 3), (32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1),
                 (256, 3, 2, 1), (256, 3, 2, 1), (256, 3, 2, 1)]
        for i, (f, k, s, p) in enumerate(specs):
            x = nn.relu(Conv(f, k, s, p, name=f"net_{i}", dtype=self.dtype)(x))
        nf = self.num_input_frames - 1
        x = Conv(6 * nf, 1, 1, 0, name="pose_conv", dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = 0.01 * x.reshape(-1, nf, 1, 6).astype(jnp.float32)
        return x[..., :3], x[..., 3:]


# ---------------------------------------------------------------------------
# porters for the released monodepth2 checkpoints
# ---------------------------------------------------------------------------


def _port_conv_bn(sd, variables, torch_prefix_fn):
    """Fill params + batch_stats from a torch dict keyed by mapped names."""
    from endosr.utils.port_torch import flatten_params, unflatten_params

    out_p, out_s = {}, {}
    for path, leaf in flatten_params(variables["params"]).items():
        tkey = torch_prefix_fn(path)
        arr = np.asarray(sd[tkey])
        if path[-1] == "kernel" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch at {path}: {arr.shape} vs {np.shape(leaf)}")
        out_p[path] = arr.astype(np.float32)
    for path, leaf in flatten_params(variables.get("batch_stats", {})).items():
        name = {"mean": "running_mean", "var": "running_var"}[path[-1]]
        tkey = torch_prefix_fn(path[:-1] + (name,))
        out_s[path] = np.asarray(sd[tkey]).astype(np.float32)
    res = {"params": unflatten_params(out_p)}
    if out_s:
        res["batch_stats"] = unflatten_params(out_s)
    return res


def port_resnet_encoder(sd, variables):
    """Port monodepth2 ``encoder.pth`` (torchvision resnet names under
    ``encoder.``) into :class:`ResnetEncoder` variables."""

    def key_fn(path):
        segs = []
        for s in path[:-1]:
            if s.startswith("layer") and "_" in s:
                l, b = s.split("_")
                segs += [l, b]
            elif s.startswith("downsample"):
                segs += s.split("_")
            elif s == "BatchNorm_0":
                continue
            else:
                segs.append(s)
        leaf = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "running_mean": "running_mean", "running_var": "running_var"}[
            path[-1]
        ]
        return "encoder." + ".".join(segs + [leaf])

    # the torch dict may carry extra scalars (height/width/use_stereo)
    sd = {k: v for k, v in sd.items() if hasattr(v, "ndim") and v.ndim > 0}
    # bn modules are anonymous flax children (named bn1 etc. explicitly)
    return _port_conv_bn(sd, variables, key_fn)


def port_depth_decoder(sd, variables):
    """Port monodepth2 ``depth.pth`` (ModuleList ``decoder.N`` names)."""
    order = []
    for i in range(4, -1, -1):
        order += [f"upconv_{i}_0", f"upconv_{i}_1"]
    order += [f"dispconv_{s}" for s in range(4)]
    index = {name: i for i, name in enumerate(order)}

    def key_fn(path):
        name = path[0]
        leaf = {"kernel": "weight", "bias": "bias"}[path[-1]]
        idx = index[name]
        inner = "conv.conv" if name.startswith("upconv") else "conv"
        return f"decoder.{idx}.{inner}.{leaf}"

    return _port_conv_bn(sd, variables, key_fn)


def port_pose_decoder(sd, variables):
    """Port monodepth2 ``pose.pth`` (ModuleList ``net.N`` names)."""
    index = {"squeeze": 0, "pose_0": 1, "pose_1": 2, "pose_2": 3}

    def key_fn(path):
        leaf = {"kernel": "weight", "bias": "bias"}[path[-1]]
        return f"net.{index[path[0]]}.{leaf}"

    return _port_conv_bn(sd, variables, key_fn)
