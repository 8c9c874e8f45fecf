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

The depth-map branch (o) takes the identical ``depth_map`` input in every
SEAN instance, and in the flagship ×8 config all 26 trunk instances run at
the same resolution — so :class:`~endosr.nn.depthnet.DepthNet` hoists it out
of the block loop: each instance's branch weights are exposed through
:meth:`SEAN.depth_branch_weights`, stacked, and evaluated once per forward
as one wide conv + one grouped conv (see ``hoisted_o_branch``). The math is
identical (same parameters, same per-instance convolutions — only batched);
``__call__`` accepts the precomputed ``ob=(γ_o, β_o)`` and skips its own
branch. Reference math being batched: ``normalization.py:37-42,61,73-74``.

Layout is NHWC; the style matrix is [B, K, L] (K depth bins, L latent).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from endosr.nn.layers import Conv, ConvTranspose, instance_norm, torch_conv_init
from endosr.ops.resize import interpolate_nearest

__all__ = ["SEAN", "hoisted_o_branch", "hoisted_style_branch",
           "pallas_o_branch", "shifted_mask_stack", "precompute_o_actv",
           "o_branch_from_actv", "precompute_style_v", "style_from_shifted",
           "style_chunk_dot"]


class _ConvParams:
    """Initializer producing a {'kernel','bias'} subtree with torch init —
    shaped exactly like a ``Conv`` module's params for porter compatibility."""

    def __init__(self, fan_in, shape, param_dtype):
        self.fan_in = fan_in
        self.shape = shape
        self.param_dtype = param_dtype

    def __call__(self, rng):
        k1, k2 = jax.random.split(rng)
        init = torch_conv_init(self.fan_in)
        return {
            "kernel": init(k1, self.shape, self.param_dtype),
            "bias": init(k2, (self.shape[-1],), self.param_dtype),
        }


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _split_channels(x, n, c):
    """Split x's last dim into n·(x.shape[-1]//n)… n equal chunks of c.

    Identical primal to n static slices, but with the adjoint XLA cannot
    derive on its own: the chunks exactly tile the tensor, so the cotangent
    of x is ONE concatenate of the chunk cotangents — not the chain of n
    pad+adds the generic slice adjoint builds (measured 19.5 ms/step of
    ``pad_add_fusion`` in the fp32 flagship train step before this).
    """
    return tuple(x[..., i * c:(i + 1) * c] for i in range(n))


def _split_channels_fwd(x, n, c):
    return _split_channels(x, n, c), None


def _split_channels_bwd(n, c, _, g):
    return (jnp.concatenate(list(g), axis=-1),)


_split_channels.defvjp(_split_channels_fwd, _split_channels_bwd)

def _resolve_obranch_body(body):
    """o-branch conv1 lowering choice: the ``ENDOSR_OBRANCH_BODY`` env var
    is an *override only* (read at trace time); otherwise the caller's
    ``body`` (the ``DepthNet.obranch_body`` field) decides, default "conv".

    "dot" = 3×3 taps of the 1-channel depth map stacked on the contraction
    axis, one [H·W·B,9]×[9,M] matmul — bias+ReLU fuse into the dot epilogue
    and the wide activation writes HBM once. "conv" = the plain NHWC conv
    lowering. Round-5 bench.py A/B at the ×8 bs8 flagship shape: conv
    328.7 fps/chip vs dot 285.1 (the round-4 regression) — "conv" is the
    default; "dot" is kept for study (bench_logs/bench_runs.jsonl).
    """
    env = os.environ.get("ENDOSR_OBRANCH_BODY")
    if env:
        return env
    return body or "conv"


def _mask_conv_relu(d, w_mask, b_mask, dtype, body=None):
    """relu(conv3×3(d [B,h,w,1]) + bias) for the stacked o-branch first
    stage, emitted [B,h,w,M] in the consumer conv's natural layout.

    Dot lowering: the nine taps of the one-channel input become the
    contraction axis of a single matmul over the [h,w,B] logical order —
    the transpose back to BHWC is a layout bitcast (same contract as
    ``style_dot``), and XLA fuses bias+ReLU into the dot's epilogue so
    the M-wide activation is written exactly once.
    """
    if _resolve_obranch_body(body) != "dot":
        return jax.nn.relu(
            jax.lax.conv_general_dilated(
                d.astype(dtype), w_mask.astype(dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b_mask.astype(dtype))
    b, h, w, _ = d.shape
    dp = jnp.pad(jnp.transpose(d[..., 0], (1, 2, 0)),
                 ((1, 1), (1, 1), (0, 0)))               # [h+2, w+2, B]
    patches = jnp.stack(
        [dp[dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-1).astype(dtype)                            # [h, w, B, 9]
    wt = jnp.reshape(w_mask.astype(dtype), (9, -1))       # [9, M]
    y = jnp.einsum("hwbk,km->hwbm", patches, wt) + b_mask.astype(dtype)
    return jnp.transpose(jax.nn.relu(y), (2, 0, 1, 3))    # bitcast to BHWC


def hoisted_o_branch(weights, depth_map, dtype, vmask=None, body=None):
    """Evaluate many SEAN depth-map branches in one pass.

    ``weights``: list of ``(w_mask{kernel,bias}, w_ob, b_ob)`` per SEAN
    instance (all with the same channel count C), as returned by
    :meth:`SEAN.depth_branch_weights`. ``depth_map``: [B,h,w,1] already at
    the shared feature resolution. ``vmask``: validity mask for exact
    bucketed eval — the branch is a conv CHAIN, so the intermediate
    activation must be re-zeroed at the true image border (its pad region
    carries relu(bias) garbage that the second conv would smear one pixel
    into the valid region).

    Returns a list of ``(γ_o, β_o)`` per instance. Equivalent to each
    instance running ``relu(conv1(d))`` then its fused γ‖β conv, but batched:
    one 1→N·2C conv followed by one N-group 2C→2C conv — two large MXU ops
    instead of 2N medium ones, with the N·relu intermediates never re-read
    from HBM separately.
    """
    n = len(weights)
    if n == 0:
        return []
    c2 = weights[0][1].shape[-1]  # 2C per instance
    d = depth_map.astype(dtype)

    w_mask = jnp.concatenate([w["kernel"].astype(dtype) for (w, _, _) in weights],
                             axis=-1)  # [3,3,1,N·2C]
    b_mask = jnp.concatenate([w["bias"].astype(dtype) for (w, _, _) in weights])
    actv = _mask_conv_relu(d, w_mask, b_mask, dtype, body)  # [B,h,w,N·2C]
    if vmask is not None:
        actv = actv * vmask.astype(actv.dtype)

    w_ob = jnp.concatenate([w.astype(dtype) for (_, w, _) in weights], axis=-1)
    b_ob = jnp.concatenate([b.astype(dtype) for (_, _, b) in weights])
    ob = jax.lax.conv_general_dilated(
        actv, w_ob, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n,
    ) + b_ob  # [B,h,w,N·2C], instance-major

    c = c2 // 2
    chunks = _split_channels(ob, 2 * n, c)
    return [(chunks[2 * i], chunks[2 * i + 1]) for i in range(n)]


def precompute_o_actv(weights, depth_map, dtype, vmask=None, body=None):
    """Shared first stage of the lazy o-branch: one wide 1→N·2C conv + ReLU.

    ``vmask``: see :func:`hoisted_o_branch` — masks the chain intermediate
    for exact bucketed eval.

    The [B,h,w,N·2C] activation is instance-major (instance i owns channels
    [i·2C, (i+1)·2C)). Returned split into per-instance chunks (via the
    concat-adjoint :func:`_split_channels`) so each block's second conv can
    run adjacent to its consumer — XLA output-fuses the per-instance conv
    into the block's modulation epilogue, instead of materializing one
    [B,h,w,N·2C] γβ map for the whole trunk (measured 7.7 ms as a single
    ``feature_group_count=N`` conv vs ~4.7 ms as N separate convs at the
    flagship shape; see tools/sweep_hoist.py round-2 notes).
    """
    n = len(weights)
    if n == 0:
        return ()
    c2 = weights[0][1].shape[-1]
    d = depth_map.astype(dtype)
    w_mask = jnp.concatenate([w["kernel"].astype(dtype) for (w, _, _) in weights],
                             axis=-1)
    b_mask = jnp.concatenate([w["bias"].astype(dtype) for (w, _, _) in weights])
    actv = _mask_conv_relu(d, w_mask, b_mask, dtype, body)
    if vmask is not None:
        actv = actv * vmask.astype(actv.dtype)
    return _split_channels(actv, n, c2)


def alpha_vec(alphas, c, dtype):
    """Per-output-channel blend factors [2C] from a SEAN's (α_γ, α_β)."""
    ag, ab = alphas
    return jnp.concatenate([
        jnp.broadcast_to(ag.reshape(()).astype(dtype), (c,)),
        jnp.broadcast_to(ab.reshape(()).astype(dtype), (c,)),
    ])


def o_branch_from_actv(actv_i, weight, dtype, alphas=None):
    """Per-instance second o-branch conv: [B,h,w,2C] → (γ_o, β_o).

    ``weight``: the ``(w_mask, w_ob, b_ob)`` triple of ONE SEAN instance.
    Identical math to that instance's slice of :func:`hoisted_o_branch`.

    ``alphas``: blend-fold mode — scale the conv's output columns by
    (1−α) (folded into the weights) and SKIP the bias (it is blended into
    the style dot's bias by :func:`style_chunk_dot`); the caller adds the
    α-scaled style term to form the final blended (γ, β) directly, so only
    ONE modulation map per SEAN ever materializes (the epilogue previously
    read separate (γ_o,β_o) and (γ_s,β_s) maps — 2× the HBM traffic).
    """
    _, w_ob, b_ob = weight
    c = w_ob.shape[-1] // 2
    if alphas is not None:
        w_ob = w_ob * (1.0 - alpha_vec(alphas, c, w_ob.dtype))
        b_ob = jnp.zeros_like(b_ob)
    ob = jax.lax.conv_general_dilated(
        actv_i, w_ob.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_ob.astype(dtype)
    return ob[..., :c], ob[..., c:]


def o_branch_raw_hwnc(actv_i, weight, dtype, alphas):
    """(1−α)-scaled, bias-free second o-branch conv emitted HWNC.

    Producer half of the fused style+blend kernel
    (``endosr/kernels/style_dot.py::style_blend_dot``): the [H,W,B,2C]
    logical order's default layout equals the conv's natural bytes, so the
    kernel reads it with zero relayout; bias and α scaling are folded into
    the kernel's blended-bias operand / these weights.
    """
    _, w_ob, _ = weight
    c = w_ob.shape[-1] // 2
    w_ob = w_ob * (1.0 - alpha_vec(alphas, c, w_ob.dtype))
    return jax.lax.conv_general_dilated(
        actv_i, w_ob.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "HWNC"),
    )


def style_blend_chunk(shifted, v_list, weights, alphas, o_biases,
                      convs_raw, dtype, shifted_hwbc=False):
    """Fused group modulation: style dot + (1−α)-scaled o-conv adds +
    blended biases in ONE Pallas pass (``style_blend_dot``).

    Same math as :func:`style_chunk_dot` with ``alphas`` (blend-fold)
    followed by the per-instance ``+ conv2`` add, but the adds happen
    in-VMEM: the per-instance blended-map fusions XLA materializes
    (26 × ~208 µs at the ×8 flagship shape) disappear. Returns
    [(γ_i, β_i), ...] — the FINAL blended modulations.
    """
    from endosr.kernels.style_dot import style_blend_dot

    c = weights[0][2]["kernel"].shape[-1]
    avs = [alpha_vec(a, c, v.dtype) for a, v in zip(alphas, v_list)]
    v_list = [v * av[None, None, :] for v, av in zip(v_list, avs)]
    v = jnp.concatenate(v_list, axis=-1)  # [B, 9K, G·2C]
    biases = []
    for i, w in enumerate(weights):
        b_s = jnp.concatenate([w[2]["bias"].astype(dtype),
                               w[3]["bias"].astype(dtype)])
        biases.append(avs[i] * b_s + (1.0 - avs[i]) * o_biases[i].astype(dtype))
    bias = jnp.concatenate(biases)
    y = jnp.transpose(
        style_blend_dot(shifted, v, tuple(convs_raw), bias,
                        shifted_hwbc), (2, 0, 1, 3))
    halves = _split_channels(y, 2 * len(weights), c)
    return [(halves[2 * i], halves[2 * i + 1]) for i in range(len(weights))]


def precompute_style_v(weights, st, dtype):
    """Shared first stage of the lazy style branch.

    Contracts every instance's (A_i_j, γ/β conv) weights with the style
    matrix into per-instance per-tap per-bin kernels — the tiny-matmul half
    of the factored style modulation (see ``SEAN._style_modulation``).
    Returns per-instance [B, 9K, 2C] chunks (concat-adjoint split).
    """
    n = len(weights)
    if n == 0:
        return ()
    b, k, l = st.shape
    c = weights[0][2]["kernel"].shape[-1]
    st = st.astype(dtype)
    a_w = jnp.stack([w[0][0, 0].astype(dtype) for w in weights])    # [N,K,K]
    a_b = jnp.stack([w[1].astype(dtype) for w in weights])          # [N,K]
    st_mixed = (
        jnp.einsum("njk,bjl->nbkl", a_w, st) + a_b[:, None, :, None]
    )  # [N,B,K,L]
    w_cat = jnp.stack([
        jnp.concatenate([w[2]["kernel"].astype(dtype),
                         w[3]["kernel"].astype(dtype)], axis=-1)
        for w in weights
    ])  # [N,3,3,L,2C]
    v = jnp.einsum("nbkl,nxylc->bxyknc", st_mixed, w_cat)
    v = v.reshape(b, 9 * k, n * 2 * c)
    return _split_channels(v, n, 2 * c)


def style_from_shifted(shifted, v_i, weight, dtype):
    """Per-instance style matmul: [B,H,W,9K] × [B,9K,2C] → (γ_s, β_s).

    One small batched dot per block, scheduled (and output-fused) next to
    its consumer — avoids the monolithic [B,H,W,N·2C] style map whose
    conv-layout relayout alone measured 2.6 ms at the flagship shape.
    """
    c = weight[2]["kernel"].shape[-1]
    y = jnp.einsum("bhwj,bjm->bhwm", shifted, v_i)
    return (y[..., :c] + weight[2]["bias"].astype(dtype),
            y[..., c:] + weight[3]["bias"].astype(dtype))


def style_chunk_dot(shifted, v_list, weights, dtype, alphas=None,
                    o_biases=None, use_pallas=False):
    """One batched style matmul for a GROUP of SEAN instances.

    ``v_list``: per-instance [B,9K,2C] kernels (from
    :func:`precompute_style_v`); ``weights``: the matching style weight
    tuples. Same math per instance as :func:`style_from_shifted`, but one
    [B,HW,9K]×[B,9K,G·2C] dot reads ``shifted`` (≈24 MB at the flagship
    shape) once per group instead of once per instance — per-instance dots
    measured 2.18 ms/step for 52 reads; grouping by 4 blocks cuts that to
    7 reads. Returns [(γ_i, β_i), ...] in instance order.

    ``alphas``/``o_biases``: blend-fold mode — per-instance (α_γ, α_β) and
    o-branch biases. Each instance's v is scaled by α and its bias becomes
    the fully blended ``α·b_s + (1−α)·b_o``; adding the (1−α)-scaled
    o-branch conv output (:func:`o_branch_from_actv` with ``alphas``)
    then yields the final blended (γ, β) — identical math to SEAN's
    α-blend epilogue, reassociated so one map materializes per SEAN.
    """
    c = weights[0][2]["kernel"].shape[-1]
    if alphas is not None:
        avs = [alpha_vec(a, c, v.dtype) for a, v in zip(alphas, v_list)]
        v_list = [v * av[None, None, :] for v, av in zip(v_list, avs)]
    v = jnp.concatenate(v_list, axis=-1)  # [B, 9K, G·2C]
    if use_pallas:
        # conv-layout-emitting kernel: the transpose back is a bitcast
        # (see endosr/kernels/style_dot.py — kills the 0.8 ms/group
        # relayout copy XLA's dot lowering pays)
        from endosr.kernels.style_dot import style_dot_hwbm

        y = jnp.transpose(style_dot_hwbm(shifted, v), (2, 0, 1, 3))
    else:
        y = jnp.einsum("bhwj,bjm->bhwm", shifted, v)
    halves = _split_channels(y, 2 * len(weights), c)
    out = []
    for i, w in enumerate(weights):
        b_s = jnp.concatenate([w[2]["bias"].astype(dtype),
                               w[3]["bias"].astype(dtype)])
        if alphas is not None:
            bias = avs[i] * b_s + (1.0 - avs[i]) * o_biases[i].astype(dtype)
        else:
            bias = b_s
        out.append((halves[2 * i] + bias[:c], halves[2 * i + 1] + bias[c:]))
    return out


def pallas_o_branch(weights, depth_map, dtype):
    """Drop-in for :func:`hoisted_o_branch` using the fused Pallas kernel
    (``endosr/kernels/fused_obranch.py``): conv1+ReLU+conv2 per VMEM tile,
    no HBM round-trip for the [B,H,W,N·2C] intermediate activation.

    Same operands, same math, same return contract (list of (γ_o, β_o)).
    """
    from endosr.kernels.fused_obranch import fused_o_branch

    n = len(weights)
    if n == 0:
        return []
    c2 = weights[0][1].shape[-1]
    c = c2 // 2
    wm = jnp.stack([w["kernel"].reshape(9, c2).astype(dtype)
                    for (w, _, _) in weights])
    bm = jnp.stack([w["bias"].astype(dtype) for (w, _, _) in weights])
    w2 = jnp.stack([w.reshape(9, c2, c2).astype(dtype)
                    for (_, w, _) in weights])
    b2 = jnp.stack([b.astype(dtype) for (_, _, b) in weights])
    ob = fused_o_branch(depth_map, wm, bm, w2, b2, dtype)
    chunks = _split_channels(ob, 2 * n, c)
    return [(chunks[2 * i], chunks[2 * i + 1]) for i in range(n)]


def shifted_mask_stack(depth_mask, dtype, stack_conv=False, hwbc=False):
    """9 shifted copies of the K-channel mask stack → [B,H,W,9K].

    Channel order is τ-major then k, matching the weight layout produced in
    ``_style_modulation``/``hoisted_style_branch``. ``stack_conv`` selects
    the one-conv build (see ``DepthNet.mask_stack_conv``); the
    ENDOSR_STACK_CONV env var overrides it (dev A/Bs only). ``hwbc``
    (conv build only) emits the HWNC logical order [H,W,B,9K] — the conv's
    natural bytes, which ``style_blend_dot(..., hwbc=True)`` reads with
    zero relayout (the default-layout form cost one 23.6 MB copy per
    style-group kernel at the flagship shape).
    """
    h, w = depth_mask.shape[1], depth_mask.shape[2]
    m = depth_mask.astype(dtype)
    k = m.shape[-1]
    if os.environ.get("ENDOSR_STACK_CONV") or stack_conv:
        # one 0/1 conv instead of 9 pad/slice fusions + a lane-unaligned
        # concat (the K=10 channel offsets defeat lane tiling — the
        # pad/slice+concat build measured 0.66 ms at the flagship shape)
        eye = np.zeros((3, 3, k, 9 * k), np.float32)
        for dy in range(3):
            for dx in range(3):
                for kk in range(k):
                    eye[dy, dx, kk, (dy * 3 + dx) * k + kk] = 1.0
        return jax.lax.conv_general_dilated(
            m, jnp.asarray(eye, dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "HWNC" if hwbc else "NHWC"))
    assert not hwbc, "hwbc requires the conv build"
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [mp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )


def hoisted_style_branch(weights, depth_mask, st, dtype):
    """Evaluate many SEAN depth-matrix branches in one batched matmul.

    ``weights``: list of ``(a_w, a_b, w_gs{kernel,bias}, w_bs{kernel,bias})``
    per SEAN instance (same C), from :meth:`SEAN.style_branch_weights`.
    ``depth_mask``: [B,H,W,K] at the shared feature resolution; ``st``:
    [B,K,L] style matrix. Returns a list of (γ_s, β_s) per instance.

    Identical math to each instance's factored style modulation (see
    ``SEAN._style_modulation``); the N per-instance [B,HW,9K]×[B,9K,2C]
    matmuls — K≈90 contractions that run the MXU at <20% — become one
    [B,HW,9K]×[B,9K,N·2C] matmul.
    """
    n = len(weights)
    if n == 0:
        return []
    b, k, l = st.shape
    c = weights[0][2]["kernel"].shape[-1]
    st = st.astype(dtype)

    a_w = jnp.stack([w[0][0, 0].astype(dtype) for w in weights])    # [N,K,K]
    a_b = jnp.stack([w[1].astype(dtype) for w in weights])          # [N,K]
    st_mixed = (
        jnp.einsum("njk,bjl->nbkl", a_w, st) + a_b[:, None, :, None]
    )  # [N,B,K,L]
    w_cat = jnp.stack([
        jnp.concatenate([w[2]["kernel"].astype(dtype),
                         w[3]["kernel"].astype(dtype)], axis=-1)
        for w in weights
    ])  # [N,3,3,L,2C]
    v = jnp.einsum("nbkl,nxylc->bxyknc", st_mixed, w_cat)
    v = v.reshape(b, 9 * k, n * 2 * c)

    shifted = shifted_mask_stack(depth_mask, dtype)
    y = jnp.einsum("bhwj,bjm->bhwm", shifted, v)

    # per-instance bias adds fuse into each block's modulation epilogue —
    # a single monolithic bias add would materialize the full [B,H,W,N·2C]
    # tensor a second time (measured +2.7 ms at the flagship shape)
    chunks = _split_channels(y, 2 * n, c)
    return [
        (chunks[2 * i] + weights[i][2]["bias"].astype(dtype),
         chunks[2 * i + 1] + weights[i][3]["bias"].astype(dtype))
        for i in range(n)
    ]


def hoisted_blended_mods(o_weights, s_weights, alphas, depth_map, depth_mask,
                         st, dtype, use_pallas=True):
    """Fully-fused trunk modulation: one kernel produces the final blended
    (γ, β) for every SEAN instance (see ``endosr/kernels/fused_mod.py``).

    The α blend and all bias terms are folded into the operands:
    out = shifted@(α·v) + conv2(relu(conv1(d)); (1−α)·w2) + [α·b_s+(1−α)·b_o]
    — algebraically identical to the two-branch path. Returns per-instance
    (γ, β) slices of the blended map.
    """
    from endosr.kernels.fused_mod import (
        fused_modulation,
        fused_modulation_reference,
        fused_modulation_supported,
    )

    n = len(o_weights)
    if n == 0:
        return []
    b, k, l = st.shape
    c2 = o_weights[0][1].shape[-1]
    c = c2 // 2
    st = st.astype(dtype)

    alpha_vec = jnp.stack([
        jnp.concatenate([jnp.broadcast_to(ag.reshape(()), (c,)),
                         jnp.broadcast_to(ab.reshape(()), (c,))])
        for ag, ab in alphas
    ]).astype(dtype)  # [N, 2C]

    wm = jnp.stack([w[0]["kernel"].reshape(9, c2).astype(dtype)
                    for w in o_weights])
    bm = jnp.stack([w[0]["bias"].astype(dtype) for w in o_weights])
    w2 = jnp.stack([w[1].reshape(9 * c2, c2).astype(dtype)
                    for w in o_weights]) * (1.0 - alpha_vec)[:, None, :]

    a_w = jnp.stack([w[0][0, 0].astype(dtype) for w in s_weights])  # [N,K,K]
    a_b = jnp.stack([w[1].astype(dtype) for w in s_weights])
    st_mixed = jnp.einsum("njk,bjl->nbkl", a_w, st) + a_b[:, None, :, None]
    w_cat = jnp.stack([
        jnp.concatenate([w[2]["kernel"].astype(dtype),
                         w[3]["kernel"].astype(dtype)], axis=-1)
        for w in s_weights
    ])  # [N,3,3,L,2C]
    v = jnp.einsum("nbkl,nxylc->bnxykc", st_mixed, w_cat)
    v = v.reshape(b, n, 9 * k, c2) * alpha_vec[None, :, None, :]

    b_s = jnp.stack([
        jnp.concatenate([w[2]["bias"].astype(dtype),
                         w[3]["bias"].astype(dtype)]) for w in s_weights
    ])
    b_o = jnp.stack([w[2].astype(dtype) for w in o_weights])
    bias = alpha_vec * b_s + (1.0 - alpha_vec) * b_o

    h, w_ = depth_mask.shape[1], depth_mask.shape[2]
    fn = (fused_modulation if use_pallas and fused_modulation_supported(h, w_)
          else fused_modulation_reference)
    out = fn(depth_map.astype(dtype), depth_mask.astype(dtype),
             wm, bm, w2, v, bias, dtype)

    chunks = _split_channels(out, 2 * n, c)
    return [(chunks[2 * i], chunks[2 * i + 1]) for i in range(n)]


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

    def setup(self):
        c = self.norm_nc
        nhidden = c * 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # mlp_mask_0: registered as a raw {kernel,bias} subtree (identical
        # tree path/layout to a Conv child) so the parent can stack it.
        self.w_mask = self.param(
            "mlp_mask_0", _ConvParams(9, (3, 3, 1, nhidden), self.param_dtype)
        )
        if self.ablate_depth_block:
            self.mlp_depthMatrix = ConvTranspose(self.label_nc, 3, 2, 1, **kw)
            self.mlp_before_all = Conv(c, 3, 1, 1, **kw)
            self.mlp_gamma_all = Conv(c, 3, 1, 1, **kw)
            self.mlp_beta_all = Conv(c, 3, 1, 1, **kw)
            return
        # one full-width conv for both modulation heads: 2C output lanes
        # instead of two half-width convs (params identical to the reference's
        # separate mlp_gamma_o/mlp_beta_o convs)
        self.w_bo = self.param(
            "mlp_beta_o", _ConvParams(nhidden * 9, (3, 3, nhidden, c), self.param_dtype)
        )
        self.w_go = self.param(
            "mlp_gamma_o", _ConvParams(nhidden * 9, (3, 3, nhidden, c), self.param_dtype)
        )
        if not self.inject_st:
            return
        if self.ablate_depth_matrix:
            self.mlp_beta_s = Conv(c, 3, 1, 1, **kw)
            self.mlp_gamma_s = Conv(c, 3, 1, 1, **kw)
        else:
            k, l = self.label_nc, self.len_latent
            self.a_w = self.param(
                "A_i_j_kernel", torch_conv_init(k), (1, 1, k, k), self.param_dtype
            )
            self.a_b = self.param(
                "A_i_j_bias", torch_conv_init(k), (k,), self.param_dtype
            )
            self.w_gs = self.param(
                "mlp_gamma_s", _ConvParams(l * 9, (3, 3, l, c), self.param_dtype)
            )
            self.w_bs = self.param(
                "mlp_beta_s", _ConvParams(l * 9, (3, 3, l, c), self.param_dtype)
            )
        if self.use_trainable_params:
            # torch init: Parameter(torch.rand(1)) — uniform [0,1)
            self.alpha_gamma = self.param(
                "alpha_gamma",
                lambda rng: jax.random.uniform(rng, (1,), self.param_dtype),
            )
            self.alpha_beta = self.param(
                "alpha_beta",
                lambda rng: jax.random.uniform(rng, (1,), self.param_dtype),
            )

    def depth_branch_weights(self):
        """(w_mask{kernel,bias}, w_ob, b_ob) for :func:`hoisted_o_branch`.

        ``w_ob``/``b_ob`` are the γ‖β-concatenated modulation conv weights
        (γ first — the order ``__call__`` splits them back in).
        """
        w_ob = jnp.concatenate([self.w_go["kernel"], self.w_bo["kernel"]], axis=-1)
        b_ob = jnp.concatenate([self.w_go["bias"], self.w_bo["bias"]])
        return self.w_mask, w_ob, b_ob

    def style_branch_weights(self):
        """(A_i_j kernel, bias, mlp_gamma_s, mlp_beta_s) for
        :func:`hoisted_style_branch`."""
        return self.a_w, self.a_b, self.w_gs, self.w_bs

    def blend_alphas(self):
        """(α_γ, α_β) blend factors as arrays (trainable or fixed)."""
        if self.use_trainable_params:
            return self.alpha_gamma, self.alpha_beta
        return (jnp.asarray([self.norm_gamma], self.param_dtype),
                jnp.asarray([self.norm_beta], self.param_dtype))

    def __call__(self, x, depth_map, depth_mask, st, ob=None, sb=None,
                 mod=None, pre_normalized=False, vmask=None):
        """x: [B,h,w,C]; depth_map: [B,H,W,1]; depth_mask: [B,H,W,K]; st: [B,K,L].

        ``ob``/``sb``: optional precomputed (γ_o, β_o) / (γ_s, β_s) at x's
        resolution — the hoisted depth-map / depth-matrix branches (see
        module docstring). ``mod``: fully blended (γ, β) from the fused
        kernel — short-circuits both branches and the α blend.
        ``pre_normalized``: the caller already folded this SEAN's param-free
        norm into its own preceding InstanceNorm (chained_instance_norm) —
        skip the internal normalization and modulate x directly.
        ``vmask``: [B|1,h,w,1] validity mask for exact bucketed eval — the
        norm uses valid-region statistics and the modulated output is
        re-zeroed outside the valid region (β would otherwise leak garbage
        into the padding that feeds the next conv).
        """
        c = self.norm_nc
        size = (x.shape[1], x.shape[2])

        def epilogue(gamma, beta):
            if pre_normalized:
                y = x * (1 + gamma) + beta
                return y if vmask is None else y * vmask.astype(y.dtype)
            if self.fused_epilogue and vmask is None:
                from endosr.kernels.fused_in_mod import (
                    fused_instance_norm_modulate,
                )

                return fused_instance_norm_modulate(
                    x, gamma.astype(jnp.float32), beta.astype(jnp.float32)
                )
            if vmask is not None:
                from endosr.nn.layers import masked_instance_norm

                y = masked_instance_norm(x, vmask) * (1 + gamma) + beta
                return y * vmask.astype(y.dtype)
            return instance_norm(x) * (1 + gamma) + beta

        if mod is not None:
            return epilogue(mod[0], mod[1])

        depth_mask = interpolate_nearest(depth_mask, size).astype(self.dtype)

        if self.ablate_depth_block:
            depth_map = interpolate_nearest(depth_map, size).astype(self.dtype)
            actv = jax.nn.relu(self._conv(depth_map, self.w_mask))
            # ablation: concatenate a duplicated/downscaled style matrix
            dup = jnp.broadcast_to(
                st[:, :, :, None], (*st.shape, st.shape[2])
            )  # [B,K,L,L]
            dup = dup.transpose(0, 2, 3, 1)  # NHWC with K channels
            down = self.mlp_depthMatrix(dup)
            down = interpolate_nearest(down, size)
            cat = jnp.concatenate([down, actv], axis=-1)
            cat = self.mlp_before_all(cat)
            return epilogue(self.mlp_gamma_all(cat), self.mlp_beta_all(cat))

        if ob is not None:
            gamma_o, beta_o = ob
        else:
            depth_map = interpolate_nearest(depth_map, size).astype(self.dtype)
            actv = jax.nn.relu(self._conv(depth_map, self.w_mask))
            if vmask is not None:
                # conv chain: re-zero the intermediate at the image border
                actv = actv * vmask.astype(actv.dtype)
            w_ob = jnp.concatenate(
                [self.w_go["kernel"].astype(self.dtype),
                 self.w_bo["kernel"].astype(self.dtype)], axis=-1,
            )
            b_ob = jnp.concatenate(
                [self.w_go["bias"].astype(self.dtype),
                 self.w_bo["bias"].astype(self.dtype)]
            )
            y_ob = jax.lax.conv_general_dilated(
                actv, w_ob, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b_ob
            gamma_o = y_ob[..., :c]
            beta_o = y_ob[..., c:]

        if not self.inject_st:
            return epilogue(gamma_o, beta_o)

        if sb is not None:
            gamma_s, beta_s = sb
        elif self.ablate_depth_matrix:
            # st is a spatial latent [B,h,w,L]
            beta_s = self.mlp_beta_s(st)
            gamma_s = self.mlp_gamma_s(st)
        else:
            # A_i_j: 1×1 conv over the bin axis (torch applies it to the
            # [B,K,L,1] "image"; algebraically a K×K mix of style rows).
            st = st.astype(self.dtype)
            st_mixed = (
                jnp.einsum("jk,bjl->bkl", self.a_w[0, 0].astype(self.dtype), st)
                + self.a_b.astype(self.dtype)[None, :, None]
            )
            gamma_s, beta_s = self._style_modulation(st_mixed, depth_mask, c)

        if self.use_trainable_params:
            ag = self.alpha_gamma.astype(self.dtype)
            ab = self.alpha_beta.astype(self.dtype)
        else:
            ag = jnp.asarray(self.norm_gamma, self.dtype)
            ab = jnp.asarray(self.norm_beta, self.dtype)

        gamma = ag * gamma_s + (1.0 - ag) * gamma_o
        beta = ab * beta_s + (1.0 - ab) * beta_o
        return epilogue(gamma, beta)

    # ------------------------------------------------------------------
    def _conv(self, x, w):
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w["kernel"].astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + w["bias"].astype(self.dtype)

    def _style_modulation(self, st_mixed, depth_mask, c):
        """γ_s, β_s from the factored style-map convolution.

        The reference broadcasts per-bin styles to a [B,H,W,L] style map and
        runs two L→C 3×3 convs over it. The style map is piecewise-constant
        over the K binary masks, so
          conv(Σ_k st'_k ⊗ mask_k) = Σ_k (W·st'_k) ⊛ mask_k :
        contract the conv weights with the K style vectors first (tiny
        matmul), then convolve the K-channel mask stack with the resulting
        per-sample kernels — L/K ≈ 25× fewer conv MACs for the hottest op in
        the network, bit-identical math (same parameters; only the summation
        order changes).
        """
        dtype = self.dtype
        l = st_mixed.shape[-1]
        b = st_mixed.shape[0]
        k = depth_mask.shape[-1]
        h, w = depth_mask.shape[1], depth_mask.shape[2]

        w_cat = jnp.concatenate(
            [self.w_gs["kernel"].astype(dtype), self.w_bs["kernel"].astype(dtype)],
            axis=-1,
        )  # [3,3,L,2C]
        # per-sample, per-bin, per-tap weights [B, 9·K, 2C] (τ-major then k —
        # must match the shifted-mask channel order below)
        v = jnp.einsum("bkl,xylc->bxykc", st_mixed, w_cat)
        v = v.reshape(b, 9 * k, 2 * c)

        # 9 shifted copies of the K-channel binary mask stack: a batched matmul
        # with K≈90 contraction replaces a feature_group conv whose 10-channel
        # groups waste >90% of the MXU lanes. XLA CSEs this shift stack across
        # all SEAN instances (identical subgraph on the same mask input).
        shifted = shifted_mask_stack(depth_mask, dtype)  # [B, H, W, 9K]
        y = jnp.einsum("bhwj,bjm->bhwm", shifted, v)
        gamma_s = y[..., :c] + self.w_gs["bias"].astype(dtype)
        beta_s = y[..., c:] + self.w_bs["bias"].astype(dtype)
        return gamma_s, beta_s
