"""Intermediate depth-aware SFTMD variants (``sftmd_arch.py:153-705``).

The paper's development line between plain SFTMD and the final DepthNet:

* :class:`PositionAttention` / :class:`PositionAttentionEfficient` —
  DANet-style spatial attention between features and a depth embedding
  (:153-204). The torch bmm chains collapse to einsums (MXU matmuls).
* :class:`SPADE` — depth-map-conditioned normalization (:205-253).
* :class:`DepthResidualBlockSPADE` — DGB precursor using SPADE (:256-282).
* :class:`SFTMDUpscaleAfterResBlkDepthCondition` (:285-382),
  :class:`SFTMDUpscaleAfterResBlkDepth` (:385-513, with optional learned
  depth upsamplers + multi-scale depth prediction outputs),
  :class:`SFTMDUpscaleAfterResBlk` (:516-613),
  :class:`SFTMDNoKernel` (:615-705).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.depthnet import ClassicResidualBlock
from endosr.nn.layers import Conv, WNConv, instance_norm, leaky_relu, pixel_shuffle
from endosr.ops.resize import interpolate_nearest

__all__ = [
    "PositionAttention",
    "PositionAttentionEfficient",
    "SPADE",
    "DepthResidualBlockSPADE",
    "SFTMDUpscaleAfterResBlk",
    "SFTMDUpscaleAfterResBlkDepth",
    "SFTMDUpscaleAfterResBlkDepthCondition",
    "SFTMDNoKernel",
]


class PositionAttention(nn.Module):
    """Quadratic spatial attention feature←depth (``sftmd_arch.py:153-177``)."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, depth):
        c = self.in_channels
        kw = dict(dtype=self.dtype)
        d = nn.relu(Conv(c, 1, 1, 0, name="conv_a_0", **kw)(depth))
        b_feat = Conv(c // 8, 1, 1, 0, name="conv_b", **kw)(features)
        c_feat = Conv(c // 8, 1, 1, 0, name="conv_c", **kw)(d)
        d_feat = Conv(c, 1, 1, 0, name="conv_d", **kw)(d)
        bsz, h, w, _ = features.shape
        # attn[n, m] over pixels; softmax along the depth-pixel axis
        attn = jnp.einsum("bnc,bmc->bnm", b_feat.reshape(bsz, h * w, -1),
                          c_feat.reshape(bsz, h * w, -1))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bmc,bnm->bnc", d_feat.reshape(bsz, h * w, -1), attn)
        return out.reshape(bsz, h, w, c)


class PositionAttentionEfficient(nn.Module):
    """Linear-complexity reordering of the attention (``:179-204``)."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, depth):
        c = self.in_channels
        kw = dict(dtype=self.dtype)
        d = nn.relu(Conv(c, 1, 1, 0, name="conv_a_0", **kw)(depth))
        b_feat = Conv(c // 8, 1, 1, 0, name="conv_b", **kw)(features)
        c_feat = Conv(c // 8, 1, 1, 0, name="conv_c", **kw)(d)
        d_feat = Conv(c, 1, 1, 0, name="conv_d", **kw)(d)
        bsz, h, w, _ = features.shape
        attn = jnp.einsum("bnc,bnk->bck", d_feat.reshape(bsz, h * w, -1),
                          b_feat.reshape(bsz, h * w, -1))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bck,bnk->bnc", attn, c_feat.reshape(bsz, h * w, -1))
        return out.reshape(bsz, h, w, -1)


class SPADE(nn.Module):
    """Depth-conditioned normalization (``sftmd_arch.py:205-253``)."""

    nf: int
    in_channels: int = 1
    use_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, segmap):
        kw = dict(dtype=self.dtype)
        if segmap.shape[1] != x.shape[1] or segmap.shape[2] != x.shape[2]:
            segmap = interpolate_nearest(segmap, (x.shape[1], x.shape[2]))
        if self.use_attention:
            x = PositionAttentionEfficient(self.nf, name="attenModule",
                                           dtype=self.dtype)(x, segmap)
        normalized = instance_norm(x)
        actv = nn.relu(Conv(self.nf, 3, 1, 1, name="mlp_shared_0", **kw)(segmap))
        gamma = Conv(self.nf, 3, 1, 1, name="mlp_gamma", **kw)(actv)
        beta = Conv(self.nf, 3, 1, 1, name="mlp_beta", **kw)(actv)
        return normalized * (1 + gamma) + beta


class DepthResidualBlockSPADE(nn.Module):
    """DGB precursor: conv+IN → SPADE → ReLU → conv+IN → SPADE → +res → ReLU."""

    nf: int = 64
    depth_ch: int = 1
    use_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth_map):
        kw = dict(dtype=self.dtype)
        spade_kw = dict(nf=self.nf, in_channels=self.depth_ch,
                        use_attention=self.use_attention, dtype=self.dtype)
        h = instance_norm(Conv(self.nf, 3, 1, 1, name="conv1_0", **kw)(x))
        h = nn.relu(SPADE(name="norm1", **spade_kw)(h, depth_map))
        h = instance_norm(Conv(self.nf, 3, 1, 1, name="conv2_0", **kw)(h))
        h = SPADE(name="norm2", **spade_kw)(h, depth_map)
        return nn.relu(x + h)


def _upscale_block(x, mid_ch, out_ch, prefix, kw):
    h = leaky_relu(WNConv(mid_ch * 4, 3, 1, 1, name=f"{prefix}_0", **kw)(x))
    h = pixel_shuffle(h, 2)
    return leaky_relu(WNConv(out_ch, 3, 1, 1, name=f"{prefix}_3", **kw)(h))


class SFTMDUpscaleAfterResBlk(nn.Module):
    """All-classic trunk, ×8 pipeline (``sftmd_arch.py:516-613``)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        nb = self.nb
        h = x
        for i in (0, 2, 4):
            h = leaky_relu(WNConv(64, 3, 1, 1, name=f"head_{i}", **kw)(h))
        fea_bef = h
        fea_in = fea_bef
        for i in range(nb - 3):
            fea_in = ClassicResidualBlock(nf=self.nf,
                                          name=f"classic_residual{i + 1}",
                                          **kw)(fea_in)
        feat_add1 = fea_in + fea_bef
        feat_up1 = _upscale_block(feat_add1, 64, 32, "upscale1", kw)
        feat_up1 = ClassicResidualBlock(nf=32, name=f"classic_residual{nb - 1}",
                                        **kw)(feat_up1)
        feat_up2 = _upscale_block(feat_up1, 32, 32, "upscale2", kw)
        feat_up2 = ClassicResidualBlock(nf=32, name=f"classic_residual{nb}",
                                        **kw)(feat_up2)
        h = leaky_relu(pixel_shuffle(
            WNConv(32 * 4, 3, 1, 1, name="upscale3_0", **kw)(feat_up2), 2))
        out = Conv(self.out_nc, 9, 1, 4, name="conv_output", **kw)(h)
        return jnp.clip(out.astype(jnp.float32), self.clamp_min, self.clamp_max)


class SFTMDUpscaleAfterResBlkDepthCondition(nn.Module):
    """Depth-feature-conditioned variant (``sftmd_arch.py:285-382``):
    a 3-conv depth branch produces a 64-ch conditioning map consumed by
    SPADE-normed depth blocks chosen by ``which_resblk_depth``."""

    which_resblk_depth: tuple[int, ...] = ()
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        nb = self.nb
        which = set(self.which_resblk_depth)

        h = x
        for i in (0, 2, 4):
            h = leaky_relu(WNConv(64, 3, 1, 1, name=f"head_{i}", **kw)(h))
        fea_bef = h

        d = depth
        for i in (0, 2, 4):
            d = leaky_relu(WNConv(64, 3, 1, 1, name=f"depth_condition_{i}", **kw)(d))
        depth_feat = d

        def block_ch(i):
            return 32 if i > nb - 3 else self.nf

        def run_block(i, feat):
            if i in which:
                return DepthResidualBlockSPADE(
                    nf=block_ch(i), depth_ch=64,
                    name=f"depth_residual{i + 1}", dtype=self.dtype,
                )(feat, depth_feat)
            return ClassicResidualBlock(nf=block_ch(i),
                                        name=f"classic_residual{i + 1}",
                                        **kw)(feat)

        fea_in = fea_bef
        for i in range(nb - 3):
            fea_in = run_block(i, fea_in)
        feat_add1 = fea_in + fea_bef
        feat_up1 = _upscale_block(feat_add1, 64, 32, "upscale1", kw)
        feat_up1 = run_block(nb - 2, feat_up1)
        feat_up2 = _upscale_block(feat_up1, 32, 32, "upscale2", kw)
        feat_up2 = run_block(nb - 1, feat_up2)
        h = leaky_relu(pixel_shuffle(
            WNConv(32 * 4, 3, 1, 1, name="upscale3_0", **kw)(feat_up2), 2))
        out = Conv(self.out_nc, 9, 1, 4, name="conv_output", **kw)(h)
        return jnp.clip(out.astype(jnp.float32), self.clamp_min, self.clamp_max)


class _DepthUpscale(nn.Module):
    """Learned ×2 depth upsampler (``sftmd_arch.py:448-474``)."""

    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, d):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        h = leaky_relu(WNConv(self.nf, 3, 1, 1, name="c0", **kw)(d))
        h = ClassicResidualBlock(nf=self.nf, name="res", **kw)(h)
        h = leaky_relu(pixel_shuffle(
            WNConv(self.nf * 4, 3, 1, 1, name="up", **kw)(h), 2))
        return nn.sigmoid(Conv(1, 9, 1, 4, name="out", **kw)(h))


class SFTMDUpscaleAfterResBlkDepth(nn.Module):
    """Depth-map variant with n trailing SPADE blocks and optional learned
    depth pyramids (``sftmd_arch.py:385-513``). Returns (SR, depth_x4,
    depth_x2) when ``pred_depth``."""

    pred_depth: bool = False
    n_depth_resblk: int = 3
    use_attention: bool = False
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        nb = self.nb
        n = self.n_depth_resblk

        h = x
        for i in (0, 2, 4):
            h = leaky_relu(WNConv(64, 3, 1, 1, name=f"head_{i}", **kw)(h))
        fea_bef = h
        fea_in = fea_bef
        for i in range(nb - 4):
            fea_in = ClassicResidualBlock(nf=self.nf,
                                          name=f"classic_residual{i + 1}",
                                          **kw)(fea_in)
        if n >= 1:
            fea_in = DepthResidualBlockSPADE(
                nf=self.nf, use_attention=self.use_attention,
                name=f"depth_residual{nb - 3}", dtype=self.dtype,
            )(fea_in, depth)
        else:
            fea_in = ClassicResidualBlock(nf=self.nf,
                                          name=f"classic_residual{nb - 3}",
                                          **kw)(fea_in)

        feat_add1 = fea_in + fea_bef
        feat_up1 = _upscale_block(feat_add1, 64, 32, "upscale1", kw)
        depth_x4 = depth_x2 = None
        if n >= 2:
            depth_x4 = (_DepthUpscale(name="depth_upscale1",
                                      dtype=self.dtype)(depth)
                        if self.pred_depth else depth)
            feat_up1 = DepthResidualBlockSPADE(
                nf=32, use_attention=self.use_attention,
                name=f"depth_residual{nb - 1}", dtype=self.dtype,
            )(feat_up1, depth_x4)
        else:
            feat_up1 = ClassicResidualBlock(nf=32,
                                            name=f"classic_residual{nb - 1}",
                                            **kw)(feat_up1)

        feat_up2 = _upscale_block(feat_up1, 32, 32, "upscale2", kw)
        if n >= 3:
            # the reference re-applies depth_upscale1 to depth_x4 (:497)
            depth_x2 = (_DepthUpscale(name="depth_upscale1_x2",
                                      dtype=self.dtype)(depth_x4)
                        if self.pred_depth else depth)
            feat_up2 = DepthResidualBlockSPADE(
                nf=32, use_attention=self.use_attention,
                name=f"depth_residual{nb}", dtype=self.dtype,
            )(feat_up2, depth_x2)
        else:
            feat_up2 = ClassicResidualBlock(nf=32,
                                            name=f"classic_residual{nb}",
                                            **kw)(feat_up2)

        h = leaky_relu(pixel_shuffle(
            WNConv(32 * 4, 3, 1, 1, name="upscale3_0", **kw)(feat_up2), 2))
        out = Conv(self.out_nc, 9, 1, 4, name="conv_output", **kw)(h)
        out = jnp.clip(out.astype(jnp.float32), self.clamp_min, self.clamp_max)
        if self.pred_depth:
            return out, depth_x4, depth_x2
        return out


class SFTMDNoKernel(nn.Module):
    """Kernel-free SFTMD (``sftmd_arch.py:615-705``): wn head, classic trunk,
    conv_mid, scale-switched PixelShuffle upscale."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    scale: int = 4
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        h = x
        for i in (0, 2, 4):
            h = leaky_relu(WNConv(64, 3, 1, 1, name=f"head_{i}", **kw)(h))
        fea_bef = h
        fea_in = fea_bef
        for i in range(self.nb):
            fea_in = ClassicResidualBlock(nf=self.nf,
                                          name=f"classic_residual{i + 1}",
                                          **kw)(fea_in)
        fea = fea_in + fea_bef
        fea = leaky_relu(WNConv(64, 3, 1, 1, name="conv_mid_0", **kw)(fea))

        if self.scale == 8:
            for j in range(3):
                fea = leaky_relu(pixel_shuffle(
                    WNConv(64 * 4, 3, 1, 1, name=f"upscale_{3 * j}", **kw)(fea), 2))
        elif self.scale == 4:
            for j in range(2):
                fea = leaky_relu(pixel_shuffle(
                    Conv(64 * 4, 3, 1, 1, name=f"upscale_{3 * j}", **kw)(fea), 2))
        else:
            fea = leaky_relu(pixel_shuffle(
                Conv(64 * self.scale ** 2, 3, 1, 1, name="upscale_0", **kw)(fea),
                self.scale))
        out = Conv(self.out_nc, 9, 1, 4, name="conv_output", **kw)(fea)
        return jnp.clip(out.astype(jnp.float32), self.clamp_min, self.clamp_max)
