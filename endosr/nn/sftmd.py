"""SFTMD family — kernel-code conditioned SR nets (IKC legacy path).

Twins of ``codes/models/modules/sftmd_arch.py``: Predictor / Corrector
kernel-code estimators (:10-93), SFT layer + residual block (:96-126),
SFTMD (:955-1015) and SFTMD_DEMO (:1018-1093). The kernel code [B, P] is
stretched to a spatial map and modulates features through SFT layers.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, Dense, leaky_relu, pixel_shuffle

__all__ = ["Predictor", "Corrector", "SFTLayer", "SFTResidualBlock",
           "SFTMD", "SFTMDDemo"]


class Predictor(nn.Module):
    """LR image → kernel code [B, code_len] (``sftmd_arch.py:10-35``)."""

    nf: int = 64
    code_len: int = 10
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype)
        strides = (1, 1, 1, 2, 1, 1)
        feats = (self.nf,) * 5 + (self.code_len,)
        biases = (True,) + (self.use_bias,) * 5
        for i, (f, s, b) in enumerate(zip(feats, strides, biases)):
            x = Conv(f, 5, s, 2, use_bias=b, name=f"ConvNet_{2 * i}", **kw)(x)
            x = leaky_relu(x, 0.2)
        flat = jnp.mean(x, axis=(1, 2))  # global average pool
        return flat


class Corrector(nn.Module):
    """SR image + estimated code → corrected code (``sftmd_arch.py:39-93``)."""

    nf: int = 64
    code_len: int = 10
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, code, res: bool = False):
        kw = dict(dtype=self.dtype)
        strides = (1, 2, 1, 2, 1, 1, 1)
        h = x
        for i, s in enumerate(strides):
            h = Conv(self.nf, 5, s, 2, use_bias=self.use_bias,
                     name=f"ConvNet_{2 * i}", **kw)(h)
            h = leaky_relu(h, 0.2)

        c = leaky_relu(Dense(self.nf, use_bias=self.use_bias,
                             name="code_dense_0", **kw)(code), 0.2)
        c = leaky_relu(Dense(self.nf, use_bias=self.use_bias,
                             name="code_dense_2", **kw)(c), 0.2)
        c = jnp.broadcast_to(c[:, None, None, :], h.shape[:3] + (self.nf,))

        m = jnp.concatenate([h, c], axis=-1)
        m = leaky_relu(Conv(self.nf * 2, 1, 1, 0, use_bias=self.use_bias,
                            name="global_dense_0", **kw)(m), 0.2)
        m = leaky_relu(Conv(self.nf, 1, 1, 0, use_bias=self.use_bias,
                            name="global_dense_2", **kw)(m), 0.2)
        m = Conv(self.code_len, 1, 1, 0, use_bias=self.use_bias,
                 name="global_dense_4", **kw)(m)
        delta = jnp.mean(m, axis=(1, 2))
        return delta if res else delta + code


class SFTLayer(nn.Module):
    """Spatial feature transform: scale+shift from concatenated code map."""

    nf: int = 64
    para: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, para_maps):
        kw = dict(dtype=self.dtype)
        cat = jnp.concatenate([features, para_maps], axis=-1)
        mul = Conv(32, 3, 1, 1, name="mul_conv1", **kw)(cat)
        mul = Conv(self.nf, 3, 1, 1, name="mul_conv2", **kw)(leaky_relu(mul, 0.2))
        add = Conv(32, 3, 1, 1, name="add_conv1", **kw)(cat)
        add = Conv(self.nf, 3, 1, 1, name="add_conv2", **kw)(leaky_relu(add, 0.2))
        return features * nn.sigmoid(mul) + add


class SFTResidualBlock(nn.Module):
    nf: int = 64
    para: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, para_maps):
        kw = dict(nf=self.nf, para=self.para, dtype=self.dtype)
        fea1 = nn.relu(SFTLayer(name="sft1", **kw)(features, para_maps))
        fea1 = Conv(64, 3, 1, 1, name="conv1", dtype=self.dtype)(fea1)
        fea2 = nn.relu(SFTLayer(name="sft2", **kw)(fea1, para_maps))
        fea3 = Conv(64, 3, 1, 1, name="conv2", dtype=self.dtype)(fea2)
        return features + fea3


class SFTMD(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    scale: int = 4
    input_para: int = 10
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ker_code):
        kw = dict(dtype=self.dtype)
        b, h, w, _ = x.shape
        code_exp = jnp.broadcast_to(
            ker_code[:, None, None, :], (b, h, w, ker_code.shape[-1])
        ).astype(self.dtype)

        fea = leaky_relu(Conv(64, 3, 1, 1, name="conv1", **kw)(x), 0.2)
        fea = leaky_relu(Conv(64, 3, 1, 1, name="conv2", **kw)(fea), 0.2)
        fea_bef = Conv(64, 3, 1, 1, name="conv3", **kw)(fea)

        fea_in = fea_bef
        for i in range(self.nb):
            fea_in = SFTResidualBlock(
                nf=self.nf, para=self.input_para,
                name=f"SFT_residual{i + 1}", dtype=self.dtype,
            )(fea_in, code_exp)

        fea_add = fea_in + fea_bef
        fea = SFTLayer(nf=64, para=self.input_para, name="sft",
                       dtype=self.dtype)(fea_add, code_exp)
        fea = Conv(64, 3, 1, 1, name="conv_mid", **kw)(fea)

        if self.scale == 4:
            fea = leaky_relu(
                pixel_shuffle(Conv(64 * 4, 3, 1, 1, name="upscale_0", **kw)(fea), 2)
            )
            fea = leaky_relu(
                pixel_shuffle(Conv(64 * 4, 3, 1, 1, name="upscale_3", **kw)(fea), 2)
            )
        else:
            fea = leaky_relu(
                pixel_shuffle(
                    Conv(64 * self.scale ** 2, 3, 1, 1, name="upscale_0", **kw)(fea),
                    self.scale,
                )
            )
        out = Conv(self.out_nc, 9, 1, 4, name="conv_output", **kw)(fea)
        return jnp.clip(out.astype(jnp.float32), self.clamp_min, self.clamp_max)


class SFTMDDemo(nn.Module):
    """SFTMD_DEMO (``sftmd_arch.py:1018-1093``): code concatenated at input."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    scale: int = 4
    input_para: int = 10
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, code, clip: bool = False):
        kw = dict(dtype=self.dtype)
        b, h, w, _ = x.shape
        code_exp = jnp.broadcast_to(
            code[:, None, None, :], (b, h, w, code.shape[-1])
        ).astype(self.dtype)
        inp = jnp.concatenate([x.astype(self.dtype), code_exp], axis=-1)

        fea = leaky_relu(Conv(64, 3, 1, 1, name="conv1", **kw)(inp), 0.2)
        fea = leaky_relu(Conv(64, 3, 1, 1, name="conv2", **kw)(fea), 0.2)
        before_res = Conv(64, 3, 1, 1, name="conv3", **kw)(fea)

        res = before_res
        for i in range(self.nb):
            res = SFTResidualBlock(
                nf=64, para=self.input_para,
                name=f"SFT_residual{i + 1}", dtype=self.dtype,
            )(res, code_exp)

        mid = SFTLayer(nf=self.nf, para=self.input_para, name="sft_mid",
                       dtype=self.dtype)(res, code_exp)
        mid = Conv(64, 3, 1, 1, use_bias=False, name="conv_mid", **kw)(nn.relu(mid))
        fea = before_res + mid

        ups = {4: (2, 2), 3: (3,), 2: (2,)}.get(self.scale, (2, 2))
        for j, r in enumerate(ups):
            fea = leaky_relu(
                pixel_shuffle(
                    Conv(64 * r * r, 3, 1, 1, use_bias=False,
                         name=f"upscale_{3 * j}", **kw)(fea), r,
                )
            )
        out = Conv(self.out_nc, 9, 1, 4, use_bias=False, name="conv_output", **kw)(fea)
        if clip:
            out = jnp.clip(out, self.clamp_min, self.clamp_max)
        return out.astype(jnp.float32)
