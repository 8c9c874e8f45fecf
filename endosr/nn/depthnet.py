"""DepthNet — the Dynamic Depth-Aware Network (flagship generator).

TPU-first rebuild of the reference architecture
(``codes/models/modules/sftmd_arch.py:709-950``):

  Encoder (5 weight-norm convs) → region-wise masked pooling into a
  per-depth-bin style matrix → conv head → 13 depth-guided residual blocks
  (SEAN-modulated) → scale-conditional PixelShuffle upsampling interleaved
  with classic residual blocks → 9×9 output conv → clamp [0,1].

Scale wiring (reference ``sftmd_arch.py:879-908,932-946``):
  ×8: upscale1 + upscale2 + upscale3(2), trailing blocks at 32 ch
  ×4: upscale2 + upscale3(2); ×2: upscale3(2); ×3: upscale3(3)

The reference constructs a ``depth-residual14`` block that its forward never
calls (its quirk; SURVEY.md §2.9-2) — we neither build nor run it, and the
checkpoint porter drops those dead parameters.

Layout: NHWC; depth masks [B,H,W,K]; style matrix [B,K,L].
"""

from __future__ import annotations

import functools
import math
from typing import Any

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

import jax

from endosr.nn.layers import (
    Conv,
    WNConv,
    WNConvParams,
    WNConvTranspose,
    centered_conv,
    chained_instance_norm,
    compose_pixel_shuffle_perm,
    fold_kernel_through_pixel_shuffle,
    masked_chained_instance_norm,
    masked_instance_norm,
    valid_mask,
    instance_norm,
    leaky_relu,
    pixel_shuffle,
    torch_conv_init,
    wn_effective_kernel,
)
from endosr.nn.sean import (
    SEAN,
    hoisted_blended_mods,
    hoisted_o_branch,
    hoisted_style_branch,
    o_branch_from_actv,
    o_branch_raw_hwnc,
    pallas_o_branch,
    precompute_o_actv,
    precompute_style_v,
    shifted_mask_stack,
    style_blend_chunk,
    style_chunk_dot,
)
from endosr.ops.resize import interpolate_bilinear, interpolate_nearest

from endosr.kernels.warn import warn_kernel_drop as _warn_kernel_drop


def _conv_dt(x, w, b, dtype, pad=None, centered=0):
    """SAME-ish conv in compute dtype from an fp32 kernel + bias.

    ``centered=N`` (bf16c/bf16c3 serving): N-pass mean-compensated
    low-precision conv (``layers.centered_conv``) — bf16 MXU work whose
    rounding is relative to the CENTERED signal, exact fp32 constant-offset
    compensation; output fp32. Only valid for the default SAME padding.
    """
    if centered and pad is None:
        return centered_conv(x, w, b, dtype, passes=int(centered))
    pad = w.shape[0] // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(dtype)


def _fold_wb(w, b, r):
    """Fold an fp32 (kernel, bias) through a pending pixel_shuffle(r)."""
    if r == 1:
        return w, b
    return fold_kernel_through_pixel_shuffle(w, r), jnp.repeat(b, r * r)


def _pk_gate(x, s, c):
    """Zero a packed tensor's out-of-fine-range slots (layers.packed_gate).

    ``x`` is the packed [B, NH+1, NW+1, 4C] tensor; the row gate is built
    from NH and the column gate from NW so non-square grids are exact
    (the reference forward is shape-agnostic, ``sftmd_arch.py:912-950``).

    Applied as ONE [H, W, 4] constant group mask on a lane-split view:
    the two broadcast multiplies (row along H, col along W) measured 7×
    over their bandwidth roofline at the 129² up1-chain shapes (round-3
    profile); the combined mask is constant-folded and the multiply is a
    single pass."""
    from endosr.nn.layers import packed_gate

    row, _ = packed_gate(x.shape[1] - 1, c, s, x.dtype)
    _, col = packed_gate(x.shape[2] - 1, c, s, x.dtype)
    m = row[:, None, :] * col[None, :, :]            # [H, W, 4C] constant
    return x * m[None]


def _pk_conv(x, w, b, s_in, s_out, pad, dt, interleaved=False):
    """One packed-grid conv stage: [2,2,4C,4C'] lowering of a fine-grid 3×3
    conv (layers.packed_stage_kernel) + group-tiled bias (``b=None`` emits
    the RAW conv — the caller defers the bias, see ``tail_defer_act``)."""
    from endosr.nn.layers import packed_stage_kernel

    k = packed_stage_kernel(w, s_in, s_out, in_interleaved=interleaved)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), k.astype(dt), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + jnp.tile(b, 4).astype(dt)

__all__ = ["DepthNet", "Encoder", "region_wise_avg_pooling",
           "DepthResidualBlock", "ClassicResidualBlock"]


def region_wise_avg_pooling(feature_map: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked average pool: [B,h,w,L] × [B,H,W,K] → [B,K,L].

    Reference ``RegionWiseAvgPooling`` (``sftmd_arch.py:709-733``): if the mask
    resolution differs from the feature's, bilinear-resize (align_corners) and
    re-binarize at 0.5. The K per-bin reductions collapse into one einsum —
    a single MXU matmul instead of K masked passes.
    """
    fh, fw = feature_map.shape[1], feature_map.shape[2]
    if mask.shape[1] != fh or mask.shape[2] != fw:
        mask = interpolate_bilinear(mask, (fh, fw), align_corners=True)
        mask = (mask >= 0.5).astype(feature_map.dtype)
    mask = mask.astype(feature_map.dtype)
    sum_feat = jnp.einsum("bhwk,bhwl->bkl", mask, feature_map)
    sum_mask = jnp.sum(mask, axis=(1, 2))  # [B,K]
    return sum_feat / (sum_mask[..., None] + 1e-10)


class Encoder(nn.Module):
    """Depth-matrix encoder (``sftmd_arch.py:735-783``, weight-norm variant).

    Returns (stride-1 32-ch feature for the SR trunk, [B,K,L] style matrix).
    With ``is_baseline`` the style branch is skipped and None is returned.
    """

    latent_ch: int = 256
    is_baseline: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth_mask, valid_hw=None, pool_mask=None):
        """``valid_hw``: (hv, wv) dynamic valid extent for exact bucketed
        eval — every conv input is re-zeroed outside the valid region (so
        the implicit SAME zero padding lands at the true image border) and
        the style pooling uses ``pool_mask``, the host-precomputed
        resized+binarized depth mask zero-padded to the latent shape."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if valid_hw is None:
            m1 = m2 = m3 = m4 = None
        else:
            hv, wv = valid_hw
            H, W = x.shape[1], x.shape[2]
            v2h, v2w = (hv + 1) // 2, (wv + 1) // 2      # after stride-2
            v3h, v3w = (v2h + 1) // 2, (v2w + 1) // 2    # after stride-2
            v4h, v4w = 2 * v3h - 1, 2 * v3w - 1          # convT(2): 2n-1
            m1 = valid_mask((H, W), hv, wv)
            m2 = valid_mask((H // 2, W // 2), v2h, v2w)
            m3 = valid_mask((H // 4, W // 4), v3h, v3w)
            m4 = valid_mask((H // 2 - 1, W // 2 - 1), v4h, v4w)

        def _m(t, m):
            return t if m is None else t * m.astype(t.dtype)

        out = WNConv(32, 3, 1, 1, name="layer1", **kw)(x)
        feat_downscaled = out
        if self.is_baseline:
            return _m(leaky_relu(feat_downscaled), m1), None
        out = WNConv(64, 3, 2, 1, name="layer2", **kw)(_m(leaky_relu(out), m1))
        out = WNConv(128, 3, 2, 1, name="layer3", **kw)(_m(leaky_relu(out), m2))
        out = WNConvTranspose(self.latent_ch, 3, 2, 1, name="layer4", **kw)(
            _m(leaky_relu(out), m3))
        out = WNConv(self.latent_ch, 3, 2, 1, name="layer5", **kw)(
            _m(leaky_relu(out), m4))
        depth_vec = region_wise_avg_pooling(
            out, depth_mask if pool_mask is None else pool_mask)
        return _m(leaky_relu(feat_downscaled), m1), depth_vec


class EncoderNoDepthMatrix(nn.Module):
    """Ablation encoder (``sftmd_arch.py:785-806``): spatial latent, no pooling."""

    latent_ch: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out = WNConv(32, 3, 1, 1, name="layer1", **kw)(x)
        feat_downscaled = out
        out = WNConv(64, 3, 1, 1, name="layer2", **kw)(leaky_relu(out))
        out = WNConv(128, 3, 2, 1, name="layer3", **kw)(leaky_relu(out))
        out = WNConvTranspose(256, 3, 2, 1, name="layer4", **kw)(leaky_relu(out))
        out = WNConv(self.latent_ch, 3, 1, 1, name="layer5", **kw)(leaky_relu(out))
        return feat_downscaled, out


class DepthResidualBlock(nn.Module):
    """Depth-Guided Block (DGB): conv+IN → SEAN → ReLU → conv+IN → SEAN → +res → ReLU.

    Reference ``Depth_Residual_Block_Mask`` (``sftmd_arch.py:808-834``).
    """

    nf: int = 64
    depth_latent_ch: int = 256
    depth_range_num: int = 10
    use_trainable_params: bool = True
    norm_gamma: float = 0.1
    norm_beta: float = 0.1
    ablate_depth_matrix: bool = False
    ablate_depth_block: bool = False
    fused_epilogue: bool = False
    # Fold SEAN's param-free norm into the block InstanceNorm that directly
    # precedes it (chained_instance_norm): one statistics pass instead of
    # two, identical math (see endosr/nn/layers.py). Saves ~3 ms/step on
    # the flagship ×8 forward.
    chain_in: bool = True
    # bf16c serving: block convs run as mean-compensated bf16
    # (layers.centered_conv) while the residual stream stays fp32 — the
    # certified fast path for regimes where plain bf16's input rounding is
    # amplified by InstanceNorm (×2/×3, tests/test_bf16_quality.py).
    centered: int = 0  # 0 = off; N = centered_conv passes (bf16c/bf16c3)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        sean_kw = dict(
            label_nc=self.depth_range_num,
            norm_nc=self.nf,
            len_latent=self.depth_latent_ch,
            use_trainable_params=self.use_trainable_params,
            norm_gamma=self.norm_gamma,
            norm_beta=self.norm_beta,
            ablate_depth_matrix=self.ablate_depth_matrix,
            ablate_depth_block=self.ablate_depth_block,
            fused_epilogue=self.fused_epilogue,
            **kw,
        )
        ckw = (dict(dtype=jnp.bfloat16, param_dtype=self.param_dtype,
                    centered=int(self.centered)) if self.centered else kw)
        self.conv1_0 = Conv(self.nf, 3, 1, 1, **ckw)
        self.norm1 = SEAN(**sean_kw)
        self.conv2_0 = Conv(self.nf, 3, 1, 1, **ckw)
        self.norm2 = SEAN(**sean_kw)

    def depth_branch_weights(self):
        """Both SEANs' hoistable depth-map-branch weights (see sean.py)."""
        return [self.norm1.depth_branch_weights(),
                self.norm2.depth_branch_weights()]

    def style_branch_weights(self):
        """Both SEANs' hoistable depth-matrix-branch weights (see sean.py)."""
        return [self.norm1.style_branch_weights(),
                self.norm2.style_branch_weights()]

    def blend_alphas(self):
        return [self.norm1.blend_alphas(), self.norm2.blend_alphas()]

    def __call__(self, x, depth_map, depth_mask, depth_vec, ob=None, sb=None,
                 mod=None, vmask=None):
        """``ob``/``sb``/``mod``: optional per-SEAN precomputed modulation.
        ``vmask``: validity mask for exact bucketed eval (masked IN stats,
        SEAN output re-zeroed outside the valid region)."""
        chain = bool(self.chain_in) and not self.fused_epilogue
        if vmask is None:
            norm = chained_instance_norm if chain else instance_norm
        elif chain:
            norm = functools.partial(masked_chained_instance_norm, vmask=vmask)
        else:
            norm = functools.partial(masked_instance_norm, vmask=vmask)
        h = norm(self.conv1_0(x))
        h = self.norm1(h, depth_map, depth_mask, depth_vec,
                       ob=None if ob is None else ob[0],
                       sb=None if sb is None else sb[0],
                       mod=None if mod is None else mod[0],
                       pre_normalized=chain, vmask=vmask)
        h = nn.relu(h)
        h = norm(self.conv2_0(h))
        h = self.norm2(h, depth_map, depth_mask, depth_vec,
                       ob=None if ob is None else ob[1],
                       sb=None if sb is None else sb[1],
                       mod=None if mod is None else mod[1],
                       pre_normalized=chain, vmask=vmask)
        return nn.relu(x + h)


class ClassicResidualBlock(nn.Module):
    """wn-conv → ReLU → wn-conv → +res → ReLU (``sftmd_arch.py:128-151``).

    Params are registered as raw weight-norm subtrees (same tree as WNConv
    children) so :class:`DepthNet` can fold the effective kernels through
    deferred pixel-shuffles when the block sits between upscale stages.
    """

    nf: int = 64
    centered: int = 0  # N = centered_conv passes; bf16 convs, fp32 stream
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.block_0 = self.param(
            "block_0", WNConvParams(self.nf * 9, (3, 3, self.nf, self.nf),
                                    self.param_dtype)
        )
        self.block_2 = self.param(
            "block_2", WNConvParams(self.nf * 9, (3, 3, self.nf, self.nf),
                                    self.param_dtype)
        )

    def effective_weights(self):
        """fp32 ((w0, b0), (w2, b2)) effective conv kernels."""
        return (wn_effective_kernel(self.block_0),
                wn_effective_kernel(self.block_2))

    def __call__(self, x, vmask=None):
        (w0, b0), (w2, b2) = self.effective_weights()
        dt = jnp.bfloat16 if self.centered else self.dtype
        h = _conv_dt(x, w0, b0, dt, centered=self.centered)
        h = nn.relu(h) if vmask is None else nn.relu(h) * vmask
        h = _conv_dt(h, w2, b2, dt, centered=self.centered)
        out = nn.relu(x + h)
        return out if vmask is None else out * vmask


class DepthNet(nn.Module):
    which_resblk_depth: tuple[int, ...] = tuple(range(14))
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    scale: int = 4
    clamp_min: float = 0.0
    clamp_max: float = 1.0
    depth_latent_ch: int = 256
    depth_range_num: int = 10
    use_trainable_params: bool = True
    norm_gamma: float = 0.1
    norm_beta: float = 0.1
    ablate_depth_matrix: bool = False
    ablate_depth_block: bool = False
    fused_epilogue: bool = False  # Pallas IN+modulation epilogue (inference)
    # One-pass chained InstanceNorm (block IN + SEAN param-free norm fused
    # analytically — see layers.chained_instance_norm). Exact math.
    chain_in: bool = True
    fold_output_conv: bool = True  # run the 9×9 head pre-PixelShuffle (exact)
    fold_tail: bool = True  # defer upscale2/3 shuffles; tail convs run folded
    hoist_style: bool = True  # batch trunk SEAN depth-matrix branches
    # Pallas fused blended-modulation kernel (endosr/kernels/fused_mod.py).
    # Correct and gradient-capable, but measured SLOWER than the XLA
    # two-hoist lowering on v5e (16.1 ms vs 9.1 ms at the flagship shape:
    # the op is FLOP-bound and XLA's grouped-conv schedule beats our
    # per-tile matmuls) — so off by default; kept for other shapes/parts.
    fused_modulation: bool = False
    # Gradient rematerialization for memory-bound training shapes: wraps
    # every trunk block in nn.remat so the backward recomputes block
    # internals instead of storing them, and disables the SEAN-branch
    # hoisting (hoisted [B,H,W,N·2C] modulation maps would be saved for
    # the backward whole — at the ×2 recipe's LR 512² that alone is
    # ~7 GB and the full step needs 28.8 G vs 16 G HBM). Each rematted
    # block recomputes only its own two SEAN branches. Set
    # ``network_G: {remat_blocks: true}`` for large-LR training recipes.
    remat_blocks: bool = False
    # Mixed precision for scales where full bf16 fails the quality budget
    # (×2/×3 — see tests/test_bf16_quality.py): keep the IN-amplified trunk
    # in fp32 but run the FLOP-heavy hoisted SEAN branches in this dtype.
    # Measured mismatch-PSNR 55.7/54.4 dB at ×2/×3 on the random-init proxy
    # (vs 28–30 dB full-bf16), comfortably inside the 0.05 dB budget.
    # Select with ``precision: mixed`` in the YAML. Applies to the hoisted
    # path only (remat_blocks computes branches per block at ``dtype``).
    modulation_dtype: Any = None
    # Chunked hoisting: with 0 every trunk SEAN's modulation maps are
    # computed up front — at bs≥16 the live [B,H,W,26·128] γβ maps
    # (≥1.7 GB) defeat HBM locality and fps/chip regresses ~40%
    # (BASELINE.md). With G>0 the trunk is hoisted in groups of G blocks:
    # each group's maps are produced right before its blocks run (a zero-
    # cost data dependency on the running feature pins the schedule), so
    # only one group's maps are live at a time. Same math, same params.
    # (Only used when lazy_branches is off.)
    hoist_chunk: int = 0
    # Lazy per-block branch evaluation: hoist only the SHARED branch
    # prefixes — the wide 1→N·2C o-branch conv1+ReLU and the style
    # tiny-matmul/shifted-mask stack — and run each block's second o-conv
    # and style matmul right before the block consumes them. XLA
    # output-fuses these into the block's modulation epilogue, so the
    # monolithic [B,H,W,N·2C] γβ/style maps (whose grouped conv measured
    # 7.7 ms and whose conv-layout relayout copy 2.6 ms at the flagship
    # shape) never materialize. Bit-identical math and parameters.
    lazy_branches: bool = True
    # Chunk the lazy o-branch shared prefix: with 0 the one wide
    # 1→N·2C conv+ReLU activation ([B,H,W,26·2C] — 872 MB at the ×8
    # flagship batch, GBs at the ×2 recipe's LR 512²) is produced up
    # front; with G>0 it is produced per group of G blocks, tied to the
    # running trunk feature, so only one group's slab is live at a time.
    # Exact math, same params (tests/test_bf16_quality.py).
    lazy_o_chunk: int = 0
    # Blocks per style-matmul group in lazy mode: each group's SEAN style
    # modulations are one batched [B,HW,9K]×[B,9K,G·4C] dot (scheduled at
    # the group's first block via an optimization_barrier tie), so the
    # ~24 MB ``shifted`` mask stack is read once per group instead of once
    # per SEAN instance. 1 = per-block dots. 7 groups the 13 trunk blocks
    # as (7,6) — two style_blend kernel launches; round-5 quick_fps sweep
    # at the new op balance: 4→335.6, 5→340.3, 6→340.1, **7→344.0**,
    # 9→339.3 (M=2304 exceeds the fused-blend VMEM gate → per-instance
    # fallback), 13→336.0; bench.py-confirmed (bench_runs.jsonl).
    style_chunk: int = 7
    # Pallas style-map dot (lazy mode): the group style matmul emits
    # [H,W,B,M]-logical output whose bytes ARE the conv activation layout,
    # so the relayout copy XLA's dot lowering pays (0.82 ms per group
    # output at the ×8 flagship shape, 2.45 ms/step) disappears — the
    # transpose back is a verified bitcast. Exact math; gradient-capable
    # (endosr/kernels/style_dot.py). "auto" = on for TPU-supported shapes
    # (the kernel self-falls-back to the einsum twin elsewhere).
    pallas_style: Any = "auto"
    # Fused packed-chain kernel (endosr/kernels/packed_chain.py): the
    # g1→g2→g3 stage prefix of BOTH phase-packed chains (up1 level and
    # tail level) in one Pallas pass — g1/g2 live in VMEM, border gates
    # apply in-register. XLA's unfused lowering paid 0.4–0.8 ms per gate
    # fusion (several × bandwidth roofline) plus two full HBM round
    # trips per chain (round-3 profile). Exact math (interpret-mode
    # parity + the serving matrix); gradient-capable via the twin.
    # "auto" = on (the kernel self-falls-back off-TPU / unsupported).
    pallas_packed_chain: Any = "auto"
    # Fused style+blend group kernel (endosr/kernels/style_dot.py::
    # style_blend_dot): the group style dot, the (1−α)-scaled o-branch
    # conv2 adds and the blended biases in ONE Pallas pass per style
    # group. XLA materializes the per-instance blended-map add as its own
    # [B,H,W,2C] fusion (26 × ~208 µs at the ×8 flagship shape, round-3
    # profile); with the kernel those fusions disappear — the conv2s emit
    # HWNC raw (zero relayout in) and the kernel writes the FINAL (γ,β)
    # maps. Exact blend-fold reassociation of the same math; gradient-
    # capable via the twin's VJP. "auto" = on when lazy + unmasked +
    # shapes qualify (self-falls-back off-TPU).
    pallas_style_blend: Any = "auto"
    # Blend-fold (lazy mode): reassociate SEAN's α blend
    #   γ = α·γ_s + (1−α)·γ_o
    # into the branch producers — the style dot's v is α-scaled, the
    # o-branch conv2 weights are (1−α)-scaled, the biases merge into one
    # blended bias — so the block epilogue reads ONE blended (γ,β) map per
    # SEAN instead of separate o/s maps (the conv2 fusion adds the style
    # slice in its epilogue). Exact reassociation of the same math (fp32
    # differences are multiplication-order rounding only; f64 fold-vs-
    # nofold gradient parity 2.6e-13); gradients flow through the folds to
    # the same parameters, α included. MEASURED NEUTRAL on v5e ×8 bs8
    # (232.3 vs 235.5 fps/chip — within run noise): XLA already folds the
    # blend into the consumer fusions, so halving the nominal map count
    # doesn't change scheduled HBM traffic. Default off; kept as an A/B
    # knob for other shapes/hardware. NOTE: ``pallas_style_blend`` (default
    # "auto") SUPERSEDES this knob on qualifying lazy-mode shapes — the
    # fused style+blend kernel applies the same blend-fold reassociation
    # by construction regardless of ``blend_fold``; to A/B the
    # unreassociated numerics set ``pallas_style_blend=False`` too.
    blend_fold: bool = False
    # Pallas fused o-branch (conv1+relu+conv2 per VMEM tile) for the hoisted
    # SEAN depth-map branch — the network's single largest op. Measured
    # SLOWER than XLA on v5e (15.3 ms vs 6.3 ms in isolation: XLA's grouped
    # conv runs ~80% MXU and hides the intermediate's HBM round-trip, while
    # the in-kernel shifted-tap slices cost a relayout per dot), so off by
    # default; kept tested + gradient-capable for other shapes/hardware.
    pallas_obranch: bool = False
    # Pallas fused clip→shuffle→fp32 output stage. With the SR frame
    # actually MATERIALIZED (honest serving; a reduce consumer lets XLA
    # elide the layout work entirely, which round-1 A/Bs under-counted),
    # the kernel wins at every scale on v5e: ×8 bs8 full forward 35.6 ms
    # (v2 dense-row kernel) vs 39.3 ms XLA. The v2 kernel writes dense
    # [B,H·r,W·r·C] rows via a one-hot scatter matmul, avoiding v1's
    # 10×-lane-padded 4D intermediate (see endosr/kernels/output_stage.py).
    # "auto" = on everywhere; booleans force.
    pallas_output: Any = "auto"
    # bf16c serving mode: every stream conv (trunk blocks, classic blocks,
    # folded tail and head) runs as a mean-compensated bf16 conv
    # (layers.centered_conv) while the residual stream, InstanceNorm and
    # modulation applies stay fp32. Removes the |mean|/sigma amplification
    # that breaks plain bf16 at ×2/×3 (tests/test_bf16_quality.py) at
    # near-bf16 MXU throughput. Select with ``precision: bf16c`` in the
    # YAML (pairs with modulation_dtype=bf16 for the SEAN branches).
    centered_convs: int = 0  # 0 = off; 1 = bf16c; 3 = bf16c3 (>=50 dB)
    # Phase-packed ×8 tail (see _packed_tail): 2.25× fewer tail MACs than
    # the dense r=2 folds, exact math. Serving fast path only (off under
    # centered convs and exact bucketed eval).
    packed_tail: bool = True
    # Phase-packed up1-level chain (upscale1_3 / block15 / upscale2_0 as
    # [2,2,4C,4C'] convs on the packed 129² grid). Exact (parity-tested),
    # 7% fewer FLOPs/frame, and it removes the mid-tail PixelShuffle
    # materialization + relayout (1.2 ms at the flagship shape). Round 2
    # measured it SLOWER (227.2 vs 235.1 fps/chip) because its packed-
    # kernel builds ran as per-step scatters; with weight prep constant-
    # folded under the fixed-weight serving jit (round 3) it WINS:
    # 319.3 vs 304.5 fps/chip (bs8 ×8, v5e, tools/quick_fps.py). Default
    # on since round 3.
    packed_up1: bool = True
    # Fused packed-tail head (endosr/kernels/fused_tail.py): the folded
    # [3,3,512,48] head conv + clamp + PS(4) + f32 rows as ONE Pallas pass.
    # XLA's split lowering caps the head conv at 48/128 = 37.5% MXU lane
    # utilization and pays a 2.9 ms scatter-matmul output stage; the kernel
    # runs the conv at 432/512 lanes and chunk-scatters the interleave.
    # MEASURED (v5e, ×8 bs8): kernel stage 4.55 ms vs 6.5 ms split — but
    # feeding it costs a 2.07 ms {(b,c)→lane}-retile XLA cannot elide
    # (conv tiles put batch in sublanes inside c-tiles; every batch-
    # sliceable default-layout form retiles), so end-to-end is a wash
    # (34.1 vs 33.9 ms). Default False; True/"auto" enable on TPU when
    # the packed ×8 tail shape qualifies.
    pallas_tail: Any = False
    # Tap-stacked head conv (endosr/kernels/head_dot.py): the folded ×8
    # head conv alone (pre64 producer) as a Pallas kernel — all nine taps
    # stacked on the lane axis (576/640 utilization vs XLA's 64/128) from
    # an HWNC-emitted g4 (no retile in, none out: pre64 lands in the v3
    # output stage's native layout). "auto" = on when the ×8 packed-tail
    # + v3-output-stage shape qualifies; ignored when pallas_tail forces
    # the fully fused kernel.
    pallas_head: Any = "auto"
    # Hoisted o-branch conv1 lowering: "conv" (plain NHWC conv) or "dot"
    # (taps stacked on the contraction axis — see sean._mask_conv_relu).
    # Round-5 bench.py A/B (×8 bs8 flagship, v5e): conv 328.7 fps/chip vs
    # dot 285.1 — the round-4 "dot" default was the regression. The
    # ENDOSR_OBRANCH_BODY env var overrides the field (dev A/Bs only).
    obranch_body: str = "conv"
    # Defer the packed-up1 stage-4 leaky_relu into the tail chain's pre_act
    # (saves one [8,128²,512] activation pass). Round-5 bench.py A/B
    # (interleaved, tools/ab_bench.py): True 328.0/328.0 vs False 328.4
    # fps/chip — within noise; kept (the deferral also lets the packed
    # chain skip a whole-tensor pass on the fallback path).
    tail_defer_act: bool = True
    # Build the 9-shift mask stack ([B,H,W,9K] from the K-bin depth mask)
    # with one 0/1 conv instead of 9 pad/slice fusions + a lane-unaligned
    # concat (K=10 channel offsets defeat lane tiling; the pad/slice+concat
    # build measured 303+363 µs in the round-5 flagship profile). Round-5
    # interleaved bench.py A/B (tools/ab_bench.py, same tree): conv
    # 335.9/335.7 vs pad-slice 333.1/332.7 fps/chip — default on. The
    # ENDOSR_STACK_CONV env var overrides (dev A/Bs only).
    mask_stack_conv: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth_map, depth_mask, valid_hw=None,
                 pool_mask=None):
        """x: [B,H,W,3], depth_map: [B,H,W,1], depth_mask: [B,H,W,K] → [B,H·s,W·s,3].

        ``valid_hw``: optional (hv, wv) dynamic scalars for EXACT bucketed
        eval — inputs are zero-padded to a bucket shape on the host and the
        network re-zeroes every stream outside rows<hv/cols<wv before each
        conv (so the implicit SAME zero padding falls at the true image
        border), computes InstanceNorm statistics over the valid region
        only, and pools styles with ``pool_mask`` (the host-precomputed
        resized+binarized depth mask, zero-padded to the latent shape).
        The [:hv·s, :wv·s] crop of the output then matches the unpadded
        forward to fp32 reduction-order noise. Requires H, W divisible by 4.
        """
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nb = self.nb
        which = set(self.which_resblk_depth)
        is_baseline = len(which) == 0

        if valid_hw is None:
            vm = None
        else:
            if (self.ablate_depth_matrix or self.ablate_depth_block
                    or self.fused_epilogue):
                raise ValueError(
                    "exact bucketed eval (valid_hw) supports the standard "
                    "DepthNet paths only — not ablations or the Pallas "
                    "fused epilogue")
            hv, wv = valid_hw
            Hp, Wp = x.shape[1], x.shape[2]
            vm = valid_mask((Hp, Wp), hv, wv)

        def _vm_for(t):
            if vm is None:
                return None
            rh, rw = t.shape[1] // Hp, t.shape[2] // Wp
            if (rh, rw) == (1, 1):
                return vm
            return valid_mask((t.shape[1], t.shape[2]), hv * rh, wv * rw)

        def _m(t):
            m = _vm_for(t)
            # cast the mask: bf16 * f32 would silently promote the stream
            return t if m is None else t * m.astype(t.dtype)

        # encoder
        if self.ablate_depth_matrix:
            feat_downscaled, depth_vec = EncoderNoDepthMatrix(
                latent_ch=self.depth_latent_ch, name="encoder", **kw
            )(x)
        else:
            feat_downscaled, depth_vec = Encoder(
                latent_ch=self.depth_latent_ch, is_baseline=is_baseline,
                name="encoder", **kw,
            )(x, depth_mask, valid_hw=valid_hw, pool_mask=pool_mask)

        # head: 2× wn-conv + LeakyReLU (Sequential indices 0 and 2)
        fea = _m(leaky_relu(WNConv(64, 3, 1, 1, name="head_0", **kw)(feat_downscaled)))
        fea_bef = _m(leaky_relu(WNConv(64, 3, 1, 1, name="head_2", **kw)(fea)))
        fea_in = fea_bef

        # ×8 → trailing 2 blocks at 32 ch; ×4 → trailing 1; ×2/×3 → all 64
        num_last_block = 1 if self.scale == 3 else int(math.log2(self.scale))

        def block_ch(i: int) -> int:
            return 32 if i > nb - num_last_block else self.nf

        depth_block_cls = (nn.remat(DepthResidualBlock) if self.remat_blocks
                           else DepthResidualBlock)
        blocks = {}
        for i in [*range(nb - 3), nb - 2, nb - 1]:
            if i in which:
                blocks[i] = depth_block_cls(
                    nf=block_ch(i),
                    depth_latent_ch=self.depth_latent_ch,
                    depth_range_num=self.depth_range_num,
                    use_trainable_params=self.use_trainable_params,
                    norm_gamma=self.norm_gamma,
                    norm_beta=self.norm_beta,
                    ablate_depth_matrix=self.ablate_depth_matrix,
                    ablate_depth_block=self.ablate_depth_block,
                    fused_epilogue=self.fused_epilogue,
                    chain_in=self.chain_in,
                    centered=int(self.centered_convs),
                    name=f"depth_residual{i + 1}", **kw,
                )
            else:
                tail_blk = i >= nb - 2 and self.scale < 4
                blocks[i] = ClassicResidualBlock(
                    nf=block_ch(i),
                    centered=0 if tail_blk else int(self.centered_convs),
                    name=f"classic_residual{i + 1}", **kw
                )

        # Hoist the loop-invariant SEAN depth-map branch: all trunk depth
        # blocks run at the input resolution on the identical depth_map, so
        # their 2N per-instance conv pairs collapse into one wide conv + one
        # grouped conv evaluated once per forward (see sean.hoisted_o_branch;
        # reference math batched: ``normalization.py:37-42,61,73-74``).
        trunk_depth = [i for i in range(nb - 3) if i in which]
        ob_map: dict[int, tuple] = {}
        sb_map: dict[int, tuple] = {}
        mod_map: dict[int, tuple] = {}
        do_hoist = bool(trunk_depth and not self.ablate_depth_block
                        and not self.remat_blocks)
        dmap = dmask = None
        mod_dt = self.modulation_dtype or self.dtype
        if do_hoist:
            size = (feat_downscaled.shape[1], feat_downscaled.shape[2])
            dmap = interpolate_nearest(depth_map, size)
            # mixed precision: branch outputs stay in mod_dt; the SEAN
            # epilogue's promotion (mod_dt + fp32 x̂) keeps the trunk fp32
            can_fuse = (self.fused_modulation and not self.ablate_depth_matrix
                        and depth_vec is not None and vm is None)
            want_style = ((self.hoist_style and not self.ablate_depth_matrix)
                          or can_fuse)
            if want_style:
                dmask = interpolate_nearest(depth_mask, size)

        def hoist_group(ids, tie):
            """Compute the SEAN modulation maps for blocks ``ids``.

            ``tie``: when chunked, the running trunk feature — an
            optimization_barrier makes the group's branch inputs depend on
            it, so XLA cannot schedule all groups' [B,H,W,G·2C] maps up
            front (which is exactly the HBM-locality failure chunking
            exists to avoid).
            """
            dmap_g, dmask_g = dmap, dmask
            if tie is not None:
                if dmask_g is not None:
                    dmap_g, dmask_g, _ = jax.lax.optimization_barrier(
                        (dmap_g, dmask_g, tie))
                else:
                    dmap_g, _ = jax.lax.optimization_barrier((dmap_g, tie))
            if can_fuse:
                # one Pallas kernel: conv1+relu+conv2 (o-branch), the style
                # matmul, biases and the α blend per VMEM tile — the blended
                # (γ,β) is the only HBM-size intermediate
                o_w, s_w, al = [], [], []
                for i in ids:
                    o_w.extend(blocks[i].depth_branch_weights())
                    s_w.extend(blocks[i].style_branch_weights())
                    al.extend(blocks[i].blend_alphas())
                mods = hoisted_blended_mods(o_w, s_w, al, dmap_g, dmask_g,
                                            depth_vec, mod_dt)
                for idx, i in enumerate(ids):
                    mod_map[i] = (mods[2 * idx], mods[2 * idx + 1])
                return
            weights = []
            for i in ids:
                weights.extend(blocks[i].depth_branch_weights())
            from endosr.kernels.fused_obranch import fused_o_branch_supported

            if (self.pallas_obranch and vm is None
                    and fused_o_branch_supported(*size, mod_dt)):
                # fused conv1+ReLU+conv2 per VMEM tile — the N·2C-wide
                # intermediate activation never touches HBM (see
                # endosr/kernels/fused_obranch.py)
                obs = pallas_o_branch(weights, dmap_g, mod_dt)
            else:
                obs = hoisted_o_branch(weights, dmap_g, mod_dt, vmask=vm,
                                       body=self.obranch_body)
            for idx, i in enumerate(ids):
                ob_map[i] = (obs[2 * idx], obs[2 * idx + 1])
            if want_style:
                # the depth-matrix branch is equally loop-invariant: one
                # batched [B,HW,9K]×[B,9K,N·2C] matmul replaces N thin ones
                sweights = []
                for i in ids:
                    sweights.extend(blocks[i].style_branch_weights())
                sbs = hoisted_style_branch(sweights, dmask_g, depth_vec,
                                           mod_dt)
                for idx, i in enumerate(ids):
                    sb_map[i] = (sbs[2 * idx], sbs[2 * idx + 1])

        lazy = bool(do_hoist and self.lazy_branches and not can_fuse
                    and not self.pallas_obranch) if do_hoist else False
        blend = bool(lazy and self.blend_fold and want_style)
        lazy_o: dict[int, tuple] = {}
        lazy_s: dict[int, tuple] = {}
        style_groups: dict[int, list[int]] = {}
        o_groups: dict[int, list[int]] = {}
        if lazy:
            o_weights, s_weights = [], []
            for i in trunk_depth:
                o_weights.extend(blocks[i].depth_branch_weights())
                if want_style:
                    s_weights.extend(blocks[i].style_branch_weights())
            if int(self.lazy_o_chunk) > 0:
                go = int(self.lazy_o_chunk)
                o_groups = {grp[0]: grp for grp in (
                    trunk_depth[j:j + go]
                    for j in range(0, len(trunk_depth), go))}
            else:
                actv_chunks = precompute_o_actv(o_weights, dmap, mod_dt,
                                                vmask=vm,
                                                body=self.obranch_body)
                for idx, i in enumerate(trunk_depth):
                    lazy_o[i] = (actv_chunks[2 * idx], o_weights[2 * idx],
                                 actv_chunks[2 * idx + 1],
                                 o_weights[2 * idx + 1])
            if want_style:
                # HWBC handoff to the fused style+blend kernel measured
                # SLOWER (bench.py 329.6 vs 340.2 fps/chip): the J=90
                # lane-unaligned in-kernel sublane shuffle costs more than
                # the ~60 µs XLA layout copies it removes. Capability kept
                # (style_dot hwbc=True, tested) — off.
                sh_hwbc = False
                shifted = shifted_mask_stack(dmask, mod_dt,
                                             stack_conv=self.mask_stack_conv,
                                             hwbc=sh_hwbc)
                v_chunks = precompute_style_v(s_weights, depth_vec, mod_dt)
                for idx, i in enumerate(trunk_depth):
                    lazy_s[i] = (v_chunks[2 * idx], s_weights[2 * idx],
                                 v_chunks[2 * idx + 1], s_weights[2 * idx + 1])
                g = max(1, int(self.style_chunk))
                style_groups = {grp[0]: grp for grp in (
                    trunk_depth[j:j + g]
                    for j in range(0, len(trunk_depth), g))}

        def o_group_prefix(ids, tie):
            """Produce the lazy o-branch prefix for blocks ``ids`` only.

            Splitting the wide 1→N·2C conv by output channels is exact;
            ``tie`` (running trunk feature) pins the group's slab next to
            its consumers via an optimization_barrier.
            """
            dmap_g = dmap
            if tie is not None:
                dmap_g, _ = jax.lax.optimization_barrier((dmap_g, tie))
            weights = []
            for i in ids:
                weights.extend(blocks[i].depth_branch_weights())
            chunks = precompute_o_actv(weights, dmap_g, mod_dt, vmask=vm,
                                       body=self.obranch_body)
            for idx, i in enumerate(ids):
                lazy_o[i] = (chunks[2 * idx], weights[2 * idx],
                             chunks[2 * idx + 1], weights[2 * idx + 1])

        def style_group_dots(ids, tie):
            """Evaluate the style matmuls for blocks ``ids`` in one dot.

            ``tie``: running trunk feature — an optimization_barrier pins
            the group's dot next to its consumers so only one group's
            [B,H,W,G·2C] style maps are live at a time.
            """
            sh = shifted
            if tie is not None:
                sh, _ = jax.lax.optimization_barrier((sh, tie))
            # fused style+blend kernel: one pass emits the FINAL blended
            # (γ,β) maps for the whole group (see pallas_style_blend flag)
            fuse_blend = False
            if ((self.pallas_style_blend
                 if isinstance(self.pallas_style_blend, bool) else True)
                    and vm is None and all(i in lazy_o for i in ids)):
                from endosr.kernels.style_dot import style_blend_supported

                m_total = sum(lazy_s[i][0].shape[2] + lazy_s[i][2].shape[2]
                              for i in ids)
                sh_bhwc_shape = ((sh.shape[2], sh.shape[0], sh.shape[1],
                                  sh.shape[3]) if sh_hwbc else sh.shape)
                fuse_blend = style_blend_supported(
                    sh_bhwc_shape, m_total, 2 * len(ids),
                    itemsize=jnp.dtype(sh.dtype).itemsize)
                if not fuse_blend and jax.default_backend() == "tpu":
                    _warn_kernel_drop(
                        "style_blend_dot",
                        f"shape {tuple(sh.shape)} M={m_total} "
                        f"dtype={jnp.dtype(sh.dtype).name} (batch>8 or "
                        "VMEM budget): per-instance blended-map adds fall "
                        "back to XLA fusions")
            if fuse_blend:
                v_list, w_list, a_list, ob_list, convs = [], [], [], [], []
                for i in ids:
                    v1, w1s, v2, w2s = lazy_s[i]
                    a1, w1o, a2, w2o = lazy_o.pop(i)
                    al = blocks[i].blend_alphas()
                    v_list += [v1, v2]
                    w_list += [w1s, w2s]
                    a_list += al
                    ob_list += [w1o[2], w2o[2]]
                    convs.append(o_branch_raw_hwnc(a1, w1o, mod_dt, al[0]))
                    convs.append(o_branch_raw_hwnc(a2, w2o, mod_dt, al[1]))
                outs = style_blend_chunk(sh, v_list, w_list, a_list,
                                         ob_list, convs, mod_dt,
                                         shifted_hwbc=sh_hwbc)
                for idx, i in enumerate(ids):
                    mod_map[i] = (outs[2 * idx], outs[2 * idx + 1])
                return
            if sh_hwbc:  # fallback consumers want [B,H,W,9K]
                sh = jnp.transpose(sh, (2, 0, 1, 3))
            v_list, w_list, a_list, ob_list = [], [], [], []
            for i in ids:
                v1, w1, v2, w2 = lazy_s[i]
                v_list += [v1, v2]
                w_list += [w1, w2]
                if blend:
                    a_list += blocks[i].blend_alphas()
                    dbw = blocks[i].depth_branch_weights()
                    ob_list += [dbw[0][2], dbw[1][2]]
            outs = style_chunk_dot(
                sh, v_list, w_list, mod_dt,
                alphas=a_list if blend else None,
                o_biases=ob_list if blend else None,
                use_pallas=(self.pallas_style
                            if isinstance(self.pallas_style, bool)
                            else True))
            for idx, i in enumerate(ids):
                sb_map[i] = (outs[2 * idx], outs[2 * idx + 1])

        group_start: dict[int, list[int]] = {}
        if do_hoist and not lazy:
            g = int(self.hoist_chunk)
            if g > 0:
                groups = [trunk_depth[j:j + g]
                          for j in range(0, len(trunk_depth), g)]
            else:
                groups = [trunk_depth]
            group_start = {grp[0]: grp for grp in groups}

        def run_block(i: int, feat):
            if i in which:
                ob, sb, mod = ob_map.get(i), sb_map.get(i), mod_map.get(i)
                if i in lazy_o:
                    a1, w1, a2, w2 = lazy_o[i]
                    if blend:
                        # blend-fold: (1−α)-scaled conv2 + α-scaled style
                        # (with the blended bias) = the final (γ, β); one
                        # map per SEAN, the add fuses into conv2's epilogue
                        al = blocks[i].blend_alphas()
                        o1 = o_branch_from_actv(a1, w1, mod_dt, alphas=al[0])
                        o2 = o_branch_from_actv(a2, w2, mod_dt, alphas=al[1])
                        s1, s2 = sb
                        mod = ((o1[0] + s1[0], o1[1] + s1[1]),
                               (o2[0] + s2[0], o2[1] + s2[1]))
                        ob = sb = None
                    else:
                        ob = (o_branch_from_actv(a1, w1, mod_dt),
                              o_branch_from_actv(a2, w2, mod_dt))
                return blocks[i](feat, depth_map, depth_mask, depth_vec,
                                 ob=ob, sb=sb, mod=mod,
                                 vmask=_vm_for(feat))
            return blocks[i](feat, vmask=_vm_for(feat))

        # trunk: blocks 0 .. nb-4 (the hottest loop)
        for i in range(nb - 3):
            if i in o_groups:
                o_group_prefix(o_groups[i],
                               fea_in if i != trunk_depth[0] else None)
            if i in group_start:
                # tie chunked groups to the running feature; the first
                # (or only) group has no predecessor to wait for
                tie = fea_in if (self.hoist_chunk and i != trunk_depth[0]) \
                    else None
                hoist_group(group_start[i], tie)
            if i in style_groups:
                style_group_dots(style_groups[i],
                                 fea_in if i != trunk_depth[0] else None)
            fea_in = run_block(i, fea_in)

        feat_add1 = fea_in + fea_bef  # global skip

        # bf16c applies centered-bf16 to the TAIL only at >=x4: at x2/x3 the
        # tail runs past the last InstanceNorm, so its rounding reaches the
        # output unfiltered while costing few FLOPs (the x2 trunk is 6x the
        # tail) — fp32 there buys ~7 dB of the certification for ~no speed.
        cc = int(self.centered_convs) if self.scale >= 4 else 0
        cc_dt = jnp.bfloat16 if cc else self.dtype
        final_scale = 3 if self.scale == 3 else 2
        # ×8 upscale1-defer: the 32-channel tensors between upscale1 and
        # upscale2 are lane-padded 4× (32 of 128 lanes) and their convs
        # measure <20% of MXU peak. When block nb-2 is classic (every
        # shipped config), defer upscale1's PixelShuffle too: upscale1_3,
        # block 15 and upscale2_0 run folded at LR² with 128–512 channels
        # (full lanes), then ONE explicit PS(2) rejoins the r=2 tail below.
        # Exact math (fold_kernel_through_pixel_shuffle); parity-tested.
        fold1 = (self.scale == 8 and bool(self.fold_tail)
                 and self.fold_output_conv and (nb - 2) not in which
                 and (nb - 1) not in which)
        # set when z carries the up1 stage-4 conv's RAW output — the tail
        # chain applies the deferred leaky_relu (pre_act) itself
        tail_pre_act = False

        if self.scale == 8 and fold1:
            # raw conv; the leaky_relu is applied per consumer path (the
            # fused packed chain runs it in-kernel on its input strips)
            h_pre = WNConv(64 * 4, 3, 1, 1, name="upscale1_0", **kw)(feat_add1)
            # upscale1_3 folded through the pending PS(2): 256→128 at LR².
            # WNConvParams registers the identical {v,g,bias} subtree a
            # WNConv child would, so checkpoints are unaffected.
            p13 = self.param(
                "upscale1_3",
                WNConvParams(64 * 9, (3, 3, 64, 32), self.param_dtype),
            )
            p20 = self.param(
                "upscale2_0",
                WNConvParams(32 * 9, (3, 3, 32, 32 * 4), self.param_dtype),
            )
            if self.packed_up1 and self.packed_tail and not cc and vm is None:
                # phase-packed up1-level chain (see _packed_tail docstring):
                # upscale1_3, block15 and upscale2_0 as [2,2,4C,4C'] convs
                # on the packed 129² grid — 2.25× fewer MACs than their
                # dense r=2 folds. The interleave to the real 256² grid
                # (formerly the mid-tail pixel_shuffle) reads the packed
                # tensor's valid slots instead.
                dtp = self.dtype
                n1h, n1w = h_pre.shape[1], h_pre.shape[2]
                w13n, b13n = wn_effective_kernel(p13)
                (w50, b50), (w52, b52) = blocks[nb - 2].effective_weights()
                w20n, b20n = wn_effective_kernel(p20)
                if (self.pallas_packed_chain
                        if isinstance(self.pallas_packed_chain, bool)
                        else True):
                    # the whole packed up1 chain in ONE kernel: h's
                    # leaky_relu on the input strips (pre_act), stages
                    # 1–3 with in-register gates, and the UNGATED
                    # stage-4 conv + leaky_relu (its s=0 gate zeroes
                    # exactly the slots the interleave slice drops)
                    from endosr.kernels.packed_chain import packed_g123
                    from endosr.nn.layers import packed_stage_kernel as _psk

                    g3h = packed_g123(
                        jnp.transpose(h_pre.astype(dtp), (1, 2, 0, 3)),
                        _psk(w13n, 0, 1, in_interleaved=True),
                        jnp.tile(b13n, 4),
                        _psk(w50, 1, 0), jnp.tile(b50, 4),
                        _psk(w52, 0, 1), jnp.tile(b52, 4),
                        None, None, True)
                    g3 = jnp.transpose(g3h, (2, 0, 1, 3))
                    # stage 4 stays in XLA: its [2,2,128,512] conv runs
                    # near-roofline there; the absorbed variant measured
                    # SLOWER (319.6 vs 323.0 fps/chip — per-row dots +
                    # g3 scratch traffic cost more than the saved pass).
                    # tail_defer_act pushes its BIAS + leaky_relu into the
                    # tail chain's pre-stage (both commute with the
                    # interleave slice; the tiled packed bias repeats the
                    # same native vector in every phase slot, so the
                    # interleaved-space bias is one per-channel [C] add —
                    # XLA ran bias+slice as its own 406 µs pass on the
                    # 134 MB g4). Off = apply both here as XLA fusions.
                    if self.tail_defer_act:
                        g4 = _pk_conv(
                            g3, w20n, None, 1, 0, [(0, 1), (0, 1)], dtp)
                        tail_pre_act = b20n
                    else:
                        g4 = leaky_relu(_pk_conv(
                            g3, w20n, b20n, 1, 0, [(0, 1), (0, 1)], dtp))
                else:
                    h = leaky_relu(h_pre)
                    g1 = _pk_gate(leaky_relu(_pk_conv(
                        h, w13n, b13n, 0, 1, [(1, 1), (1, 1)], dtp,
                        interleaved=True)), 1, 32)
                    g2 = _pk_gate(nn.relu(_pk_conv(
                        g1, w50, b50, 1, 0, [(0, 1), (0, 1)], dtp)), 0, 32)
                    g3 = _pk_gate(nn.relu(g1 + _pk_conv(
                        g2, w52, b52, 0, 1, [(1, 0), (1, 0)], dtp)), 1, 32)
                    # no gate on g4: the s=0 gate zeroes exactly row/col
                    # n1 — the slots the [:n1h, :n1w] interleave slice
                    # below drops
                    g4 = leaky_relu(_pk_conv(
                        g3, w20n, b20n, 1, 0, [(0, 1), (0, 1)], dtp))
                # interleave the packed (unshifted) grid to the real fine
                # grid: z[2Y+a, 2X+b, o] = g4[Y, X, (a·2+b)·128 + o].
                # When the tail runs the Pallas chain, z_g4 hands it the
                # PACKED tensor and the interleave happens in-VMEM during
                # row assembly (packed_g123 phases=True) — the XLA
                # transpose copy below measured 410 µs on the 134 MB
                # flagship tensor (copy.112, round-5 profile); XLA
                # dead-codes this z when the phases path consumes z_g4.
                z_g4 = g4
                gv = g4[:, :n1h, :n1w, :].reshape(
                    g4.shape[0], n1h, n1w, 2, 2, 128)
                z = gv.transpose(0, 1, 3, 2, 4, 5).reshape(
                    g4.shape[0], 2 * n1h, 2 * n1w, 128)
            else:
                z_g4 = None
                h = leaky_relu(h_pre)
                w13, b13 = _fold_wb(*wn_effective_kernel(p13), 2)
                z = leaky_relu(_conv_dt(_m(h), w13, b13, cc_dt, centered=cc))
                # classic block 15 (blocks[nb-2]) folded by 2
                (wb0, bb0), (wb2, bb2) = blocks[nb - 2].effective_weights()
                wb0, bb0 = _fold_wb(wb0, bb0, 2)
                wb2, bb2 = _fold_wb(wb2, bb2, 2)
                t = nn.relu(_conv_dt(_m(z), wb0, bb0, cc_dt, centered=cc))
                z = nn.relu(z + _conv_dt(_m(t), wb2, bb2, cc_dt, centered=cc))
                # upscale2_0 folded by 2 (native 32→128): 128→512 at LR²,
                # then the deferred upscale1 shuffle is applied for real —
                # its output channel layout is already canonical PS(2)
                w20, b20 = _fold_wb(*wn_effective_kernel(p20), 2)
                z = leaky_relu(_conv_dt(_m(z), w20, b20, cc_dt, centered=cc))
                z = pixel_shuffle(z, 2)
            r = 2
            p23 = self.param(
                "upscale2_3", WNConvParams(32 * 9, (3, 3, 32, 32), self.param_dtype)
            )
            if self.packed_tail and not cc and vm is None:
                # packed tail: upscale2_3, block16 and upscale3_0 run as
                # [2,2,4C,4C'] convs on the phase-packed 257² grid — 4/9 of
                # the dense r=2 fold's MACs, no further shuffles, and the
                # folded 9×9 head re-merges into ONE dense conv (see
                # layers.packed_stage_kernel).
                return self._packed_tail(z, p23, blocks[nb - 1], final_scale,
                                         pre_act=tail_pre_act, z_g4=z_g4)
            w23, b23 = _fold_wb(*wn_effective_kernel(p23), r)
            z = leaky_relu(_conv_dt(_m(z), w23, b23, cc_dt, centered=cc))
            # classic block 16 (blocks[nb-1]) with both convs folded by r
            (wc0, bc0), (wc2, bc2) = blocks[nb - 1].effective_weights()
            wc0, bc0 = _fold_wb(wc0, bc0, r)
            wc2, bc2 = _fold_wb(wc2, bc2, r)
            t = nn.relu(_conv_dt(_m(z), wc0, bc0, cc_dt, centered=cc))
            z = nn.relu(z + _conv_dt(_m(t), wc2, bc2, cc_dt, centered=cc))
            return self._folded_head(z, r, final_scale, vmask=_vm_for(z))

        # upscale1 (×8 only): 64→256 → PS(2) → 64→32 — kept at real
        # resolution; the expensive later stages defer theirs.
        if self.scale == 8:
            h = leaky_relu(WNConv(64 * 4, 3, 1, 1, name="upscale1_0", **kw)(feat_add1))
            h = pixel_shuffle(h, 2)
            feat_up1 = _m(leaky_relu(
                WNConv(32, 3, 1, 1, name="upscale1_3", **kw)(_m(h))))
        else:
            feat_up1 = feat_add1

        feat_up1 = run_block(nb - 2, feat_up1)
        # Deferred-shuffle tail: convs at SR resolution with 32 channels run
        # the MXU at ≤25% occupancy and the 9×9/3-channel head at <10%, so
        # every pixel-shuffle from upscale2 on is DEFERRED — each conv's
        # effective kernel is folded through the pending shuffles
        # (fold_kernel_through_pixel_shuffle: exact math, canonical layout
        # kept by compose_pixel_shuffle_perm) and one pixel_shuffle(r) runs at
        # the very end. Requires the post-upscale2 block to be shuffle-
        # commuting (classic — no InstanceNorm), which holds for every
        # shipped config (``which_ResBlk_depth`` never reaches nb-1).
        fold = (bool(self.fold_tail) and self.fold_output_conv
                and (self.scale < 4 or (nb - 1) not in which))

        r = 1
        z = feat_up1
        if self.scale >= 4:
            cin20 = z.shape[-1]
            p20 = self.param(
                "upscale2_0",
                WNConvParams(cin20 * 9, (3, 3, cin20, 32 * 4), self.param_dtype),
            )
            w20, b20 = wn_effective_kernel(p20)
            z = leaky_relu(_conv_dt(z, w20, b20, cc_dt, centered=cc))
            if fold:
                r = 2  # conv output channels are already canonical PS(2) layout
            else:
                z = pixel_shuffle(z, 2)
            p23 = self.param(
                "upscale2_3", WNConvParams(32 * 9, (3, 3, 32, 32), self.param_dtype)
            )
            w23, b23 = _fold_wb(*wn_effective_kernel(p23), r)
            z = leaky_relu(_conv_dt(_m(z), w23, b23, cc_dt, centered=cc))
            if fold:
                # classic block nb-1 with both convs folded by r
                (wb0, bb0), (wb2, bb2) = blocks[nb - 1].effective_weights()
                wb0, bb0 = _fold_wb(wb0, bb0, r)
                wb2, bb2 = _fold_wb(wb2, bb2, r)
                t = nn.relu(_conv_dt(_m(z), wb0, bb0, cc_dt, centered=cc))
                z = nn.relu(z + _conv_dt(_m(t), wb2, bb2, cc_dt, centered=cc))
            else:
                z = run_block(nb - 1, _m(z))
        else:
            z = run_block(nb - 1, z)

        if fold:
            return self._folded_head(z, r, final_scale, vmask=_vm_for(z))

        # upscale3: ch→32·fs² → PS(fs)
        p30 = self.param(
            "upscale3_0",
            WNConvParams(z.shape[-1] * 9,
                         (3, 3, z.shape[-1], 32 * final_scale ** 2),
                         self.param_dtype),
        )
        w30, b30 = wn_effective_kernel(p30)
        h = _conv_dt(z, w30, b30, cc_dt, centered=cc)
        if self.fold_output_conv:
            # fold only the head through the final shuffle (the ×8/×4
            # mid-tail shuffles were already applied for real above)
            fs = final_scale
            head = self.param("conv_output", self._init_head)
            wh, bh = _fold_wb(
                head["kernel"].astype(jnp.float32),
                head["bias"].astype(jnp.float32), fs,
            )
            out = pixel_shuffle(
                _conv_dt(_m(leaky_relu(h)), wh, bh, cc_dt, centered=cc), fs)
        else:
            feat_up3 = leaky_relu(pixel_shuffle(h, final_scale))
            out = Conv(self.out_nc, 9, 1, 4, name="conv_output", **kw)(_m(feat_up3))
        return jnp.clip(out.astype(jnp.float32), self.clamp_min, self.clamp_max)

    def _packed_tail(self, z, p23, block16, final_scale, pre_act=False,
                     z_g4=None):
        """×8 fold1 tail on the phase-packed PS(2)-pending grid.

        ``z``: the mid-tail-shuffled [B,N,N,4·32] tensor (torch PS channel
        order) whose fine grid is 2N². upscale2_3, block16's two convs and
        upscale3_0 — natively 3×3 convs on the fine grid, previously run as
        dense r=2 folds carrying a 4× MAC tax — lower to [2,2,4C,4C'] convs
        on a packed (N+1)² tensor via :func:`layers.packed_stage_kernel`
        (2.25× fewer MACs than the dense fold, full-lane shapes, zero
        shuffles). Packing shift alternates 1→0→1→0 per stage so windows
        stay uniform; border gates re-zero the out-of-fine-range slots each
        stage (exact: tests/test_depthnet_parity.py). The head's folded
        9×9 conv then runs as ONE dense [3,3,512,48] conv on the unshifted
        final packed tensor. Reference ops: ``sftmd_arch.py:898-908,941-950``.
        """
        from endosr.nn.layers import packed_gate, packed_stage_kernel

        dt = self.dtype
        nh, nw = z.shape[1], z.shape[2]
        fs = final_scale
        rt = 2 * fs
        # ``pre_act`` may carry the producer conv's deferred BIAS (a [C]
        # vector — see the tail_defer_act caller): phase-tiled biases are
        # phase-independent after the interleave, so one per-channel add
        # before the deferred leaky_relu is exact.
        pre_bias = None
        if not isinstance(pre_act, bool):
            pre_bias, pre_act = pre_act, True

        def gate(G, s, c):
            # row gate from the packed H dim, column gate from the packed
            # W dim — non-square grids are exact (regression: round-2 HEAD
            # built both from z.shape[1] and crashed every H≠W ×8 forward).
            # One constant [H, W, 4] group mask on a lane-split view (see
            # _pk_gate) instead of two broadcast multiplies.
            row, _ = packed_gate(G.shape[1] - 1, c, s, G.dtype)
            _, col = packed_gate(G.shape[2] - 1, c, s, G.dtype)
            m = row[:, None, :] * col[None, :, :]
            return G * m[None]

        def pconv(x, k, pad, bias):
            return jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.tile(bias, 4).astype(dt)

        w23, b23 = wn_effective_kernel(p23)
        (wc0, bc0), (wc2, bc2) = block16.effective_weights()

        if (self.pallas_packed_chain
                if isinstance(self.pallas_packed_chain, bool) else True):
            # fused g1→g2→g3 (endosr/kernels/packed_chain.py): one read
            # of z, one write of g3, gates in-register; the transposes
            # are bitcasts (HWNC bytes = the conv activation layout)
            from endosr.kernels.packed_chain import packed_g123

            # z_g4: consume the PACKED producer tensor and interleave
            # in-VMEM (phases=True) — the materialized z transpose copy
            # measured 410 µs at the flagship shape
            xin = (jnp.transpose(z_g4.astype(dt), (1, 2, 0, 3))
                   if z_g4 is not None
                   else jnp.transpose(z.astype(dt), (1, 2, 0, 3)))
            g3h = packed_g123(
                xin,
                packed_stage_kernel(w23, 0, 1, in_interleaved=True),
                jnp.tile(b23, 4),
                packed_stage_kernel(wc0, 1, 0), jnp.tile(bc0, 4),
                packed_stage_kernel(wc2, 0, 1), jnp.tile(bc2, 4),
                None, None, pre_act,
                None if pre_bias is None else pre_bias.astype(dt),
                z_g4 is not None)
            g3 = jnp.transpose(g3h, (2, 0, 1, 3))
        else:
            if pre_bias is not None:  # deferred producer bias (see caller)
                z = z + pre_bias.reshape(1, 1, 1, -1).astype(z.dtype)
            if pre_act:  # deferred producer activation (see caller)
                z = leaky_relu(z)
            g1 = gate(leaky_relu(pconv(
                z, packed_stage_kernel(w23, 0, 1, in_interleaved=True),
                [(1, 1), (1, 1)], b23)), 1, 32)
            g2 = gate(nn.relu(pconv(
                g1, packed_stage_kernel(wc0, 1, 0), [(0, 1), (0, 1)], bc0)),
                0, 32)
            g3 = gate(nn.relu(g1 + pconv(
                g2, packed_stage_kernel(wc2, 0, 1), [(1, 0), (1, 0)], bc2)),
                1, 32)

        p30 = self.param(
            "upscale3_0",
            WNConvParams(32 * 9, (3, 3, 32, 32 * fs * fs), self.param_dtype),
        )
        w30, b30 = wn_effective_kernel(p30)

        # Fused head kernel (endosr/kernels/fused_tail.py): its halo DMA
        # needs the column dim 8-sublane aligned, so the last packed stage
        # right-pads its output columns (zero-gated; never read by the
        # head's [0..n] column window).
        use_fused = False
        padw = 0
        if (self.pallas_tail if isinstance(self.pallas_tail, bool) else True):
            from endosr.kernels.fused_tail import fused_tail_supported

            padw = (-(nw + 1)) % 8
            # fused_tail's in-kernel strip math is square-only (w = hp - 1)
            use_fused = nh == nw and fused_tail_supported(
                (z.shape[0], nh + 1, nw + 1 + padw, 4 * 32 * fs * fs),
                rt, self.out_nc)
            if not use_fused:
                padw = 0

        # Tap-stacked head kernel (endosr/kernels/head_dot.py): reads an
        # HNWC-emitted g4 (strips DMA over the untiled H/N dims — zero
        # relayout) and hands pre64 to the v3 output stage in its native
        # layout — the XLA head conv is output-lane-bound (64/128).
        use_head = False
        if (not use_fused and rt == 4 and self.out_nc == 3
                and (self.pallas_head
                     if isinstance(self.pallas_head, bool) else True)):
            from endosr.kernels.head_dot import head_dot_supported
            from endosr.kernels.output_stage import output_stage_x8_supported

            hpadw = (-(nw + 1)) % 8
            use_head = (head_dot_supported(
                (nh + 1, nw + 1 + hpadw, z.shape[0], 4 * 32 * fs * fs), 64,
                wout=nw, itemsize=jnp.dtype(dt).itemsize)
                and output_stage_x8_supported((nh, z.shape[0], nw, 64),
                                              order="hbwc"))
            if use_head:
                padw = hpadw
            elif jax.default_backend() == "tpu":
                _warn_kernel_drop(
                    "head_dot/output_stage_x8",
                    f"tail shape (nh={nh}, nw={nw}, b={z.shape[0]}, "
                    f"dtype={jnp.dtype(dt).name}) fails the support gate "
                    "(batch>8, alignment or VMEM budget): head conv + "
                    "interleave fall back to the XLA path")

        c30 = packed_stage_kernel(w30, 1, 0)
        if use_head:
            # HWNC emission (g4 [Hp, Wc, B, C4]): the default {3,2,1,0}
            # layout on this logical order IS the conv's natural bytes,
            # so head_dot reads the tensor with zero relayout. The conv
            # emits RAW output — its bias + leaky_relu epilogue runs
            # inside head_dot (XLA materialized it as a separate 556 MB
            # read+write pass, 1.5 ms at the flagship shape). The s=0
            # packed gate is applied inside the kernel too (an XLA gating
            # multiply here measured 1.51 ms; an HNWC emission moved a
            # 1.65 ms retile into the lrelu fusion).
            g4 = jax.lax.conv_general_dilated(
                g3.astype(dt), c30.astype(dt), (1, 1),
                [(0, 1), (0, 1 + padw)],
                dimension_numbers=("NHWC", "HWIO", "HWNC"),
            )
        elif use_fused:
            # emit the conv in HWNC logical order: its physical bytes equal
            # the NHWC conv's natural {3,0,2,1} layout, so the fused kernel
            # reads it with zero relayout (a post-hoc transpose measured
            # 2.07 ms at the flagship shape)
            g4r = leaky_relu(jax.lax.conv_general_dilated(
                g3.astype(dt), c30.astype(dt), (1, 1),
                [(0, 1), (0, 1 + padw)],
                dimension_numbers=("NHWC", "HWIO", "HWNC"),
            ) + jnp.tile(b30, 4).astype(dt))
            row, _ = packed_gate(nh, 32 * fs * fs, 0, g4r.dtype)
            _, col = packed_gate(nw, 32 * fs * fs, 0, g4r.dtype)
            colw = jnp.concatenate(
                [col, jnp.zeros((padw, col.shape[1]), col.dtype)], axis=0)
            g4 = g4r * row[:, None, None, :] * colw[None, :, None, :]
        else:
            g4 = gate(leaky_relu(pconv(g3, c30, [(0, 1), (0, 1)], b30)),
                      0, 32 * fs * fs)

        # head: fold by rt, then permute its input channels from canonical
        # PS(rt) order (c·rt² + (2α+g)·rt + 2β+h) to g4's group-major
        # packed order ((α·2+β)·32fs² + c·fs² + g·fs + h)
        head = self.param("conv_output", self._init_head)
        wh, bh = _fold_wb(
            head["kernel"].astype(jnp.float32),
            head["bias"].astype(jnp.float32), rt,
        )
        c32 = np.arange(32)
        gg = np.arange(fs)
        perm = np.concatenate([
            (c32[:, None, None] * rt * rt
             + (a * fs + gg[:, None]) * rt
             + (b * fs + gg[None, :])).ravel()
            for a in (0, 1) for b in (0, 1)
        ])
        if use_fused:
            from endosr.kernels.fused_tail import fused_tail

            flat = fused_tail(g4, wh[:, :, perm, :].astype(dt),
                              bh.astype(jnp.float32),
                              self.clamp_min, self.clamp_max, "hwbc")
            return flat.reshape(
                flat.shape[0], flat.shape[1], -1, self.out_nc)
        if use_head:
            from endosr.kernels.head_dot import head_dot
            from endosr.kernels.output_stage import (
                embed_head_channels,
                output_stage_x8,
            )

            w64, b64 = embed_head_channels(wh[:, :, perm, :], bh)
            pre64 = head_dot(g4, w64.astype(dt), b64, nw,
                             jnp.tile(b30, 4).astype(dt))  # [H, B, W, 64]
            flat = output_stage_x8(pre64, self.clamp_min, self.clamp_max,
                                   order="hbwc")
            return flat.reshape(
                flat.shape[0], flat.shape[1], -1, self.out_nc)
        use_pallas = (self.pallas_output
                      if isinstance(self.pallas_output, bool) else True)
        if use_pallas and rt == 4 and self.out_nc == 3:
            # v3 output stage: the head conv emits 64 embedded channels
            # (free — the 48-lane conv pads to 128 lanes either way) and
            # the M-stacked interleave kernel writes the fp32 rows (see
            # endosr/kernels/output_stage.py)
            from endosr.kernels.output_stage import (
                embed_head_channels,
                output_stage_x8,
                output_stage_x8_supported,
            )

            w64, b64 = embed_head_channels(wh[:, :, perm, :], bh)
            if output_stage_x8_supported((g4.shape[0], nh, nw, 64)):
                pre64 = jax.lax.conv_general_dilated(
                    g4, w64.astype(dt), (1, 1), [(1, 0), (1, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b64.astype(dt)
                flat = output_stage_x8(pre64, self.clamp_min, self.clamp_max)
                b_, hr = flat.shape[0], flat.shape[1]
                return flat.reshape(b_, hr, -1, self.out_nc)
        pre = jax.lax.conv_general_dilated(
            g4, wh[:, :, perm, :].astype(dt), (1, 1),
            [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bh.astype(dt)
        if use_pallas:
            from endosr.kernels.output_stage import output_stage

            flat = output_stage(pre, rt, self.clamp_min, self.clamp_max)
            b_, hr = flat.shape[0], flat.shape[1]
            return flat.reshape(b_, hr, -1, self.out_nc)
        out = pixel_shuffle(
            jnp.clip(pre, self.clamp_min, self.clamp_max), rt
        )
        return out.astype(jnp.float32)

    def _phase_split_head(self, z, w30, b30, head, final_scale, cc_dt, _m):
        """Phase-split lowering of the r==2 folded tail head (see
        :meth:`_folded_head` docstring). ``w30``/``b30``: the dense folded
        upscale3_0 kernel [3,3,C,4M] in canonical PS(2·fs) output order —
        its tap slices outside u ∈ {a,a+1}, v ∈ {b,b+1} for phase (a,b)'s
        output channels are structurally zero (asserted by
        tests/test_depthnet_parity.py::test_phase_split_fold_zeros), so
        dropping them is exact."""
        fs = final_scale
        rt = 2 * fs
        wh, bh = _fold_wb(
            head["kernel"].astype(jnp.float32),
            head["bias"].astype(jnp.float32), rt,
        )
        c8 = np.arange(32)
        g = np.arange(fs)
        phases = [(a, b) for a in (0, 1) for b in (0, 1)]
        # canonical PS(rt) channels owned by pending-r2 phase (a,b)
        idxs = [
            (c8[:, None, None] * rt * rt
             + (a * fs + g[:, None]) * rt
             + (b * fs + g[None, :])).ravel()
            for a, b in phases
        ]
        m_per = 32 * fs * fs
        use_mask = _m(z) is not z  # vmask present (exact bucketed eval)
        use_pallas = (self.pallas_output
                      if isinstance(self.pallas_output, bool) else True)
        v3 = False
        if use_pallas and not use_mask and rt == 4 and self.out_nc == 3:
            from endosr.kernels.output_stage import (
                embed_head_channels,
                output_stage_x8,
                output_stage_x8_supported,
            )

            v3 = output_stage_x8_supported(
                (z.shape[0], z.shape[1], z.shape[2], 64))

        def head_w(idx):
            """Per-phase head kernel — v3 embeds its 48 output channels
            into the 64-slot order the v3 interleave kernel consumes."""
            w_ab = wh[:, :, idx, :]
            return embed_head_channels(w_ab, bh)[0] if v3 else w_ab

        if not use_mask:
            # ONE wide [2,2,C,4M] conv: phase (a,b)'s map is the (a,b)-
            # shifted slice of a 257²-style output (pad 1 on both sides),
            # consumed by the per-phase head convs through their padding.
            # Border rows/cols a phase's head-pad must see as ZERO but that
            # hold real neighbor values for the other phases are gated off
            # per channel group (fuses into the conv epilogue). Exact in
            # fp32; in bf16 it differs from the per-phase form only by
            # f32-accumulation order inside the conv.
            w_all = jnp.concatenate(
                [w30[a:a + 2, b:b + 2, :, :][..., idx]
                 for (a, b), idx in zip(phases, idxs)], axis=-1)
            b_all = jnp.concatenate([b30[idx] for idx in idxs])
            big = jax.lax.conv_general_dilated(
                z.astype(cc_dt), w_all.astype(cc_dt), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b_all.astype(cc_dt)
            big = leaky_relu(big)
            hN, wN = z.shape[1], z.shape[2]
            ga0_r = (jnp.arange(hN + 1) != hN).astype(big.dtype)
            ga1_r = (jnp.arange(hN + 1) != 0).astype(big.dtype)
            ga0_c = (jnp.arange(wN + 1) != wN).astype(big.dtype)
            ga1_c = (jnp.arange(wN + 1) != 0).astype(big.dtype)
            grow = jnp.concatenate(
                [jnp.tile((ga0_r if a == 0 else ga1_r)[:, None], (1, m_per))
                 for a, b in phases], axis=1)
            gcol = jnp.concatenate(
                [jnp.tile((ga0_c if b == 0 else ga1_c)[:, None], (1, m_per))
                 for a, b in phases], axis=1)
            big = big * grow[None, :, None, :] * gcol[None, None, :, :]
            pre = None
            for k, ((a, b), idx) in enumerate(zip(phases, idxs)):
                h_ab = jax.lax.conv_general_dilated(
                    big[..., m_per * k:m_per * (k + 1)],
                    head_w(idx).astype(cc_dt), (1, 1),
                    [(1 - a, a), (1 - b, b)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                pre = h_ab if pre is None else pre + h_ab
        else:
            pre = None
            for (a, b), idx in zip(phases, idxs):
                w_ab = w30[a:a + 2, b:b + 2, :, :][..., idx]
                zp = jax.lax.conv_general_dilated(
                    z.astype(cc_dt), w_ab.astype(cc_dt), (1, 1),
                    [(1 - a, a), (1 - b, b)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b30[idx].astype(cc_dt)
                h_ab = jax.lax.conv_general_dilated(
                    _m(leaky_relu(zp)),
                    wh[:, :, idx, :].astype(cc_dt), (1, 1),
                    [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                pre = h_ab if pre is None else pre + h_ab
        if v3:
            pre = pre + embed_head_channels(wh[:, :, idxs[0], :],
                                            bh)[1].astype(cc_dt)
            flat = output_stage_x8(pre, self.clamp_min, self.clamp_max)
            b_, hr = flat.shape[0], flat.shape[1]
            return flat.reshape(b_, hr, -1, self.out_nc)
        pre = pre + bh.astype(cc_dt)
        if use_pallas:
            from endosr.kernels.output_stage import output_stage

            flat = output_stage(pre, rt, self.clamp_min, self.clamp_max)
            b_, hr = flat.shape[0], flat.shape[1]
            return flat.reshape(b_, hr, -1, self.out_nc)
        out = pixel_shuffle(
            jnp.clip(pre, self.clamp_min, self.clamp_max), rt
        )
        return out.astype(jnp.float32)

    def _init_head(self, rng):
        import jax as _jax

        k1, k2 = _jax.random.split(rng)
        init = torch_conv_init(32 * 81)
        return {
            "kernel": init(k1, (9, 9, 32, self.out_nc), self.param_dtype),
            "bias": init(k2, (self.out_nc,), self.param_dtype),
        }

    def _folded_head(self, z, r, final_scale, vmask=None):
        """upscale3 + 9×9 head with every pending shuffle deferred.

        ``z``: folded tail features at SR/(r·fs) resolution with channels in
        canonical PS(r) layout. Folds upscale3_0 and the head through the
        pending shuffles (compose_pixel_shuffle_perm keeps the layout
        canonical), then emits the clipped fp32 SR image in one
        Pallas output-stage pass (or XLA shuffle+clip when disabled).
        ``vmask``: validity mask at z's resolution (exact bucketed eval).

        With r == 2 the folded upscale3_0 runs PHASE-SPLIT: a 3×3 conv
        folded through PS(2) has 75% structural zeros (output phase (a,b)
        only reads taps u ∈ {a, a+1}, v ∈ {b, b+1} of the 3×3 window), so
        the one dense [3,3,C,4M] conv becomes four [2,2,C,M] convs with
        per-phase asymmetric padding — 2.25× fewer MACs, identical math
        (the dense kernel's zero slices are dropped, nothing else). The
        head then reads the four phase tensors as an input-channel split
        of its folded conv (exact). Measured on v5e at the ×8 flagship
        shape: upscale3_0 3.20 → ~1.3 ms.
        """
        cc = bool(self.centered_convs) and self.scale >= 4
        cc_dt = jnp.bfloat16 if cc else self.dtype

        def _m(t):
            # cast the mask: bf16 * f32 would silently promote the stream
            # (and crash the raw convs in _phase_split_head on mixed dtypes)
            return t if vmask is None else t * vmask.astype(t.dtype)

        cin30 = z.shape[-1] // (r * r)
        p30 = self.param(
            "upscale3_0",
            WNConvParams(cin30 * 9, (3, 3, cin30, 32 * final_scale ** 2),
                         self.param_dtype),
        )
        w30, b30 = _fold_wb(*wn_effective_kernel(p30), r)
        # defer upscale3's shuffle too: permute the conv's folded output
        # channels into canonical PS(r·fs) layout (zero runtime cost)
        perm = compose_pixel_shuffle_perm(
            r, final_scale, 32 * final_scale ** 2 * r * r
        )
        w30, b30 = w30[..., perm], b30[perm]
        head = self.param("conv_output", self._init_head)
        if r == 2 and not cc:
            return self._phase_split_head(
                _m(z), w30, b30, head, final_scale, cc_dt, _m)
        z = _conv_dt(_m(z), w30, b30, cc_dt, centered=cc)
        r *= final_scale
        wh, bh = _fold_wb(
            head["kernel"].astype(jnp.float32),
            head["bias"].astype(jnp.float32), r,
        )
        pre = _conv_dt(_m(leaky_relu(z)), wh, bh, cc_dt, centered=cc)
        # clip commutes with the shuffle and with the fp32 convert
        # (0/1 exact in bf16); see the pallas_output flag for the measured
        # per-scale split between the fused kernel and the XLA lowering
        use_pallas = (self.pallas_output if isinstance(self.pallas_output, bool)
                      else True)
        if use_pallas:
            from endosr.kernels.output_stage import output_stage

            flat = output_stage(pre, r, self.clamp_min, self.clamp_max)
            b_, hr = flat.shape[0], flat.shape[1]
            return flat.reshape(b_, hr, -1, self.out_nc)
        out = pixel_shuffle(
            jnp.clip(pre, self.clamp_min, self.clamp_max), r
        )
        return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Named serving/training presets — the knob combinations actually MEASURED on
# TPU v5e (BASELINE.md ladder). The DepthNet flag surface above is wide
# (packed/pallas/lazy/centered knobs) and only these combinations carry
# committed numbers; select one via ``network_G.preset`` in the YAML
# (endosr/nn/networks.py) instead of hand-picking flags. Pair with the
# top-level ``precision`` key as documented per preset.
DEPTHNET_PRESETS = {
    # ×8/×4 serving (pair with ``precision: bf16``): phase-packed ×8 tail,
    # tap-stacked head + v3 output stage auto-enabled on qualifying shapes.
    "serve": dict(packed_tail=True, packed_up1=True, pallas_tail=False,
                  pallas_head="auto", pallas_output="auto",
                  pallas_style="auto", lazy_branches=True, style_chunk=5,
                  blend_fold=False, remat_blocks=False),
    # ×2/×3 serving (pair with ``precision: bf16c3`` — ≥50 dB certified
    # where plain bf16 fails the 0.05 dB budget, tests/test_bf16_quality.py).
    # Same graph knobs; the centered-conv mode is set by ``precision``.
    "serve_bf16c3": dict(packed_tail=True, packed_up1=True,
                         pallas_tail=False, pallas_head="auto",
                         pallas_output="auto", pallas_style="auto",
                         lazy_branches=True, style_chunk=5,
                         blend_fold=False, remat_blocks=False),
    # flagship training (the measured train-step config; the model layer
    # additionally forces pallas_output=True inside its train-step clone —
    # endosr/models/f_depthcond.py:_build_train_step).
    "train": dict(packed_tail=True, packed_up1=True, pallas_tail=False,
                  pallas_head="auto", pallas_output="auto",
                  pallas_style="auto", lazy_branches=True, style_chunk=5,
                  blend_fold=False, remat_blocks=False),
    # reference-faithful debugging: every fast path off (dense folds,
    # XLA-only epilogues) — the slowest, most transparent graph.
    "plain": dict(packed_tail=False, packed_up1=False, pallas_tail=False,
                  pallas_head=False, pallas_output=False,
                  pallas_style=False, lazy_branches=False, style_chunk=1,
                  blend_fold=False, remat_blocks=False,
                  fold_tail=False, fold_output_conv=False),
}
