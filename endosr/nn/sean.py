"""SEAN depth-conditioned normalization — the paper's core novelty.

TPU-native rebuild of the reference's SEAN module
(``codes/models/modules/normalization.py:7-92``): parameter-free instance
norm (fp32 stats) modulated by two sources, blended by trainable scalars —

  (o) depth-map branch: γ_o, β_o = convs(relu(conv(depthMap)))
  (s) depth-matrix branch: per-bin style vectors are mixed by a 1×1 conv
      ``A_i_j`` over the bin axis and broadcast to pixels through the binary
      depth masks. The reference does this with an unsqueeze/expand/permute/
      matmul dance; here it is a single einsum
      ``style[b,h,w,l] = Σ_k st'[b,k,l]·mask[b,h,w,k]`` → one MXU matmul.

Layout is NHWC; the style matrix is [B, K, L] (K depth bins, L latent).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from endosr.nn.layers import Conv, ConvTranspose, instance_norm, torch_conv_init
from endosr.ops.resize import interpolate_nearest

__all__ = ["SEAN"]


def _style_modulation(mod: nn.Module, st_mixed, depth_mask, c, dtype,
                      param_dtype):
    """γ_s, β_s from the factored style-map convolution (see SEAN.__call__).

    Parameters are registered under the same names/layout as the direct
    ``mlp_gamma_s``/``mlp_beta_s`` convs, so ported torch checkpoints load
    unchanged.
    """
    import jax

    l = st_mixed.shape[-1]
    b = st_mixed.shape[0]
    k = depth_mask.shape[-1]
    h, w = depth_mask.shape[1], depth_mask.shape[2]
    fan_in = l * 9

    w_g = mod.param("mlp_gamma_s", _ConvParams(fan_in, (3, 3, l, c), param_dtype))
    w_b = mod.param("mlp_beta_s", _ConvParams(fan_in, (3, 3, l, c), param_dtype))

    w_cat = jnp.concatenate(
        [w_g["kernel"].astype(dtype), w_b["kernel"].astype(dtype)], axis=-1
    )  # [3,3,L,2C]
    # per-sample, per-bin, per-tap weights [B, 9·K, 2C] (τ-major then k —
    # must match the shifted-mask channel order below)
    v = jnp.einsum("bkl,xylc->bxykc", st_mixed, w_cat)
    v = v.reshape(b, 9 * k, 2 * c)

    # 9 shifted copies of the K-channel binary mask stack: a batched matmul
    # with K≈90 contraction replaces a feature_group conv whose 10-channel
    # groups waste >90% of the MXU lanes. XLA CSEs this shift stack across
    # all SEAN instances (identical subgraph on the same mask input).
    m = depth_mask.astype(dtype)
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifted = jnp.concatenate(
        [mp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # [B, H, W, 9K]
    y = jnp.einsum("bhwj,bjm->bhwm", shifted, v)
    gamma_s = y[..., :c] + w_g["bias"].astype(dtype)
    beta_s = y[..., c:] + w_b["bias"].astype(dtype)
    return gamma_s, beta_s


class _ConvParams:
    """Initializer producing a {'kernel','bias'} subtree with torch init —
    shaped exactly like a ``Conv`` module's params for porter compatibility."""

    def __init__(self, fan_in, shape, param_dtype):
        self.fan_in = fan_in
        self.shape = shape
        self.param_dtype = param_dtype

    def __call__(self, rng):
        import jax

        k1, k2 = jax.random.split(rng)
        init = torch_conv_init(self.fan_in)
        return {
            "kernel": init(k1, self.shape, self.param_dtype),
            "bias": init(k2, (self.shape[-1],), self.param_dtype),
        }


class SEAN(nn.Module):
    label_nc: int = 10          # number of depth bins K
    norm_nc: int = 32           # channels of the normalized feature
    len_latent: int = 256       # style-vector length L
    inject_st: bool = True
    use_trainable_params: bool = True
    norm_gamma: float = 0.1     # fixed blend if not trainable
    norm_beta: float = 0.1
    ablate_depth_matrix: bool = False
    ablate_depth_block: bool = False
    fused_epilogue: bool = False   # Pallas fused IN+modulation (inference)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth_map, depth_mask, st):
        """x: [B,h,w,C]; depth_map: [B,H,W,1]; depth_mask: [B,H,W,K]; st: [B,K,L]."""
        c = self.norm_nc
        nhidden = c * 2
        size = (x.shape[1], x.shape[2])

        def epilogue(gamma, beta):
            if self.fused_epilogue:
                from endosr.kernels.fused_in_mod import (
                    fused_instance_norm_modulate,
                )

                return fused_instance_norm_modulate(
                    x, gamma.astype(jnp.float32), beta.astype(jnp.float32)
                )
            return instance_norm(x) * (1 + gamma) + beta

        depth_map = interpolate_nearest(depth_map, size).astype(self.dtype)
        depth_mask = interpolate_nearest(depth_mask, size).astype(self.dtype)

        actv = nn.relu(
            Conv(nhidden, 3, 1, 1, dtype=self.dtype, param_dtype=self.param_dtype,
                 name="mlp_mask_0")(depth_map)
        )

        if self.ablate_depth_block:
            # ablation: concatenate a duplicated/downscaled style matrix
            dup = jnp.broadcast_to(
                st[:, :, :, None], (*st.shape, st.shape[2])
            )  # [B,K,L,L]
            dup = dup.transpose(0, 2, 3, 1)  # NHWC with K channels
            down = ConvTranspose(self.label_nc, 3, 2, 1, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="mlp_depthMatrix")(dup)
            down = interpolate_nearest(down, size)
            cat = jnp.concatenate([down, actv], axis=-1)
            cat = Conv(c, 3, 1, 1, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="mlp_before_all")(cat)
            gamma = Conv(c, 3, 1, 1, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="mlp_gamma_all")(cat)
            beta = Conv(c, 3, 1, 1, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="mlp_beta_all")(cat)
            return epilogue(gamma, beta)

        # one full-width conv for both modulation heads: 2C=128 output lanes
        # instead of two half-width convs (params identical to the reference's
        # separate mlp_gamma_o/mlp_beta_o convs)
        w_bo = self.param("mlp_beta_o",
                          _ConvParams(nhidden * 9, (3, 3, nhidden, c),
                                      self.param_dtype))
        w_go = self.param("mlp_gamma_o",
                          _ConvParams(nhidden * 9, (3, 3, nhidden, c),
                                      self.param_dtype))
        import jax as _jax

        w_ob = jnp.concatenate(
            [w_go["kernel"].astype(self.dtype), w_bo["kernel"].astype(self.dtype)],
            axis=-1,
        )
        b_ob = jnp.concatenate(
            [w_go["bias"].astype(self.dtype), w_bo["bias"].astype(self.dtype)]
        )
        ob = _jax.lax.conv_general_dilated(
            actv.astype(self.dtype), w_ob, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_ob
        gamma_o = ob[..., :c]
        beta_o = ob[..., c:]

        if not self.inject_st:
            return epilogue(gamma_o, beta_o)

        if self.ablate_depth_matrix:
            # st is a spatial latent [B,h,w,L]
            beta_s = Conv(c, 3, 1, 1, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="mlp_beta_s")(st)
            gamma_s = Conv(c, 3, 1, 1, dtype=self.dtype, param_dtype=self.param_dtype,
                           name="mlp_gamma_s")(st)
        else:
            # A_i_j: 1×1 conv over the bin axis (torch applies it to the
            # [B,K,L,1] "image"; algebraically a K×K mix of style rows).
            k = self.label_nc
            a_w = self.param("A_i_j_kernel", torch_conv_init(k),
                             (1, 1, k, k), self.param_dtype)
            a_b = self.param("A_i_j_bias", torch_conv_init(k),
                             (k,), self.param_dtype)
            st = st.astype(self.dtype)
            st_mixed = (
                jnp.einsum("jk,bjl->bkl", a_w[0, 0].astype(self.dtype), st)
                + a_b.astype(self.dtype)[None, :, None]
            )
            # The reference broadcasts per-bin styles to a [B,H,W,L] style
            # map and runs two L→C 3×3 convs over it. The style map is
            # piecewise-constant over the K binary masks, so
            #   conv(Σ_k st'_k ⊗ mask_k) = Σ_k (W·st'_k) ⊛ mask_k :
            # contract the conv weights with the K style vectors first
            # (tiny matmul), then convolve the K-channel mask stack with the
            # resulting per-sample kernels — L/K ≈ 25× fewer conv MACs for
            # the hottest op in the network, bit-identical math (same
            # parameters; only the summation order changes).
            gamma_s, beta_s = _style_modulation(
                self, st_mixed, depth_mask, c, self.dtype, self.param_dtype,
            )

        if self.use_trainable_params:
            # torch init: Parameter(torch.rand(1)) — uniform [0,1)
            import jax

            alpha_gamma = self.param(
                "alpha_gamma", lambda rng: jax.random.uniform(rng, (1,), self.param_dtype)
            )
            alpha_beta = self.param(
                "alpha_beta", lambda rng: jax.random.uniform(rng, (1,), self.param_dtype)
            )
            ag = alpha_gamma.astype(self.dtype)
            ab = alpha_beta.astype(self.dtype)
        else:
            ag = jnp.asarray(self.norm_gamma, self.dtype)
            ab = jnp.asarray(self.norm_beta, self.dtype)

        gamma = ag * gamma_s + (1.0 - ag) * gamma_o
        beta = ab * beta_s + (1.0 - ab) * beta_o
        return epilogue(gamma, beta)
