"""Pallas style-map dot emitting conv-layout bytes (TPU).

The lazy SEAN depth-matrix branch evaluates, per group of trunk blocks, one
batched matmul ``y[b,h,w,m] = Σ_j shifted[b,h,w,j] · v[b,j,m]`` (see
``endosr/nn/sean.py::style_chunk_dot``; reference math being factored:
``codes/models/modules/normalization.py:80-85``). XLA lowers this as a
base-dilated convolution whose output comes out row-major ({3,2,1,0}) and
then pays a full relayout copy to the conv activation layout ({3,0,2,1})
its consumers need — measured 0.82 ms per group output ([8,128,128,1024]
bf16), 2.45 ms/step total at the ×8 flagship shape, ~10× its bandwidth
roofline.

This kernel removes the copy by construction: it emits the LOGICAL shape
[H, W, B, M] in Pallas's default {3,2,1,0} layout, whose physical bytes —
(h, w, (b-sublane, m-lane) tiles) — are exactly the conv layout of the
[B, H, W, M] tensor. The caller transposes back with ``jnp.transpose(y,
(2, 0, 1, 3))``, which XLA's layout assignment turns into a pure bitcast
(verified in compiled HLO: the consumer reads a ``bitcast_*_fusion``, no
copy). Per-instance bias adds and the α blend stay outside, fusing into
the block epilogues as before.

Gradients flow through the jnp twin's VJP (dots only — the forward is not
recomputed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["style_dot_hwbm", "style_dot_reference", "style_dot_supported"]

TH = 8  # rows per program

# Kernel body strategy: "loop" = per-batch-item dot + sublane-masked store
# (measured 890 µs/call at [8,128,128,90]×[8,90,1024] — 27% of the write
# roofline; the masked stores serialize); "batched" = one batched dot +
# in-VMEM [B,TH,W,M]→[TH,W,B,M] transpose (8×8 sublane-block shuffles),
# measured 567 µs/call at the same shape with MBLK=512
# (tools/exp_styledot.py, v5e). ENDOSR_STYLE_BODY overrides for A/B runs.
import os as _os

BODY = _os.environ.get("ENDOSR_STYLE_BODY", "batched")


def style_dot_reference(shifted, v):
    """jnp twin: [B,H,W,J]×[B,J,M] → [H,W,B,M] (einsum + transpose)."""
    y = jnp.einsum("bhwj,bjm->bhwm", shifted, v)
    return jnp.transpose(y, (1, 2, 0, 3))


def style_dot_supported(shape, m, itemsize=2) -> bool:
    b, h, w, j = shape
    # output [H,W,B,M] puts b on the second-minor (sublane) dim; bf16's
    # (2,1) packing rejects odd-b slices in Mosaic (e.g. the b=1 dummy init)
    return (h % TH == 0 and m % 128 == 0 and w % 8 == 0
            and (itemsize != 2 or b % 2 == 0))


def _kernel(s_ref, v_ref, o_ref):
    b, th, w = s_ref.shape[0], s_ref.shape[1], s_ref.shape[2]
    mblk = v_ref.shape[2]
    if BODY == "batched":
        y = jax.lax.dot_general(
            s_ref[...].reshape(b, th * w, s_ref.shape[3]), v_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = jnp.transpose(
            y.reshape(b, th, w, mblk).astype(o_ref.dtype), (1, 2, 0, 3))
        return
    for bb in range(b):
        flat = s_ref[bb].reshape(th * w, s_ref.shape[3])
        y = jax.lax.dot_general(
            flat, v_ref[bb],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        o_ref[:, :, bb, :] = y.reshape(th, w, mblk)


@jax.custom_vjp
def style_dot_hwbm(shifted, v):
    """[B,H,W,J] × [B,J,M] → [H,W,B,M]; transpose back is a free bitcast.

    Uses the Pallas kernel on TPU for supported shapes, the jnp twin
    otherwise.
    """
    return _forward(shifted, v)


def _forward(shifted, v, interpret=False):
    b, h, w, j = shifted.shape
    m = v.shape[2]
    if not interpret and (jax.default_backend() != "tpu"
                          or not style_dot_supported(
                              shifted.shape, m,
                              jnp.dtype(shifted.dtype).itemsize)):
        return style_dot_reference(shifted, v)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if BODY == "batched":
        # measured: 0.567 ms at MBLK=512 (wider blocks amortize the
        # in-VMEM transpose)
        mblk = 512 if m % 512 == 0 else (256 if m % 256 == 0 else 128)
    else:
        mblk = 256 if m % 256 == 0 else 128
    return pl.pallas_call(
        _kernel,
        grid=(h // TH, m // mblk),
        in_specs=[
            pl.BlockSpec((b, TH, w, j), lambda hh, mm: (0, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, j, mblk), lambda hh, mm: (0, 0, mm),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, w, b, mblk),
                               lambda hh, mm: (hh, 0, 0, mm),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, b, m), shifted.dtype),
        # the batched body's f32 dot result + transpose temp exceed the
        # 16 MB scoped-VMEM default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shifted, v)


def _fwd(shifted, v):
    return _forward(shifted, v), (shifted, v)


def _bwd(res, g):
    shifted, v = res
    gt = jnp.transpose(g, (2, 0, 1, 3))  # [B,H,W,M]
    gs = jnp.einsum("bhwm,bjm->bhwj", gt, v).astype(shifted.dtype)
    gv = jnp.einsum("bhwj,bhwm->bjm", shifted, gt).astype(v.dtype)
    return gs, gv


style_dot_hwbm.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused style + o-branch blend: the group style dot PLUS the per-instance
# blended-modulation add in one pass.
#
# With blend-fold operands (α-scaled v, (1−α)-scaled o-branch conv2 outputs,
# fully blended biases — see ``endosr/nn/sean.py``), the final (γ, β) map of
# each SEAN instance is  style_dot + conv2_raw + bias.  XLA materializes that
# add as one [B,H,W,2C] fusion per instance (26 × ~208 µs at the ×8 flagship
# shape — reading the style slice AND the conv output, writing the map).
# Here the adds happen in-VMEM: the kernel reads the shifted mask stack once
# per row-block, the G conv2 outputs once, and writes the blended maps once —
# the separate per-instance map round-trips disappear.
#
# Input contract: conv2 outputs are emitted HWNC ([H, W, B, 2C] logical,
# default {3,2,1,0} layout = the conv's natural bytes — same trick as
# ``head_dot``), so no relayout feeds the kernel and the output transposes
# back to BHWC as a bitcast.

MCHUNK = int(__import__("os").environ.get("ENDOSR_STYLE_MCHUNK", "512"))  # lanes per in-kernel m-slice
BTH = 4       # rows per program (smaller than style_dot's TH: the G conv
              # operands + full-M output block all live in VMEM at once)


def _pick_mchunk(m):
    for c in (MCHUNK, 256, 128):
        if m % c == 0:
            return c
    return None


def style_blend_supported(shape, m, n_conv, itemsize=2) -> bool:
    b, h, w, j = shape
    c2 = m // n_conv
    mc = _pick_mchunk(m)
    if mc is None or mc % c2 != 0:
        return False
    # VMEM budget model (double-buffered operand/output blocks + the f32
    # dot slice and its transpose temp), matching vmem_limit_bytes below
    vmem = (2 * b * BTH * w * j * itemsize          # shifted block
            + 2 * b * j * m * itemsize              # v (constant index)
            + 2 * n_conv * BTH * w * b * c2 * itemsize   # conv blocks
            + 2 * BTH * w * b * m * itemsize        # out block
            + 2 * b * BTH * w * mc * 4 * 2)         # f32 dot + transpose
    return (h % BTH == 0 and w % 8 == 0 and b <= 8
            # bf16 (2,1) sublane packing: odd-b blocks misalign in Mosaic
            and (itemsize != 2 or b % 2 == 0)
            and vmem <= 95 * 1024 * 1024)


def style_blend_reference(shifted, v, convs, bias, hwbc=False):
    """jnp twin: dot + concat(convs) + bias → [H,W,B,M].

    shifted [B,H,W,J] (``hwbc``: [H,W,B,J]); v [B,J,M]; convs: tuple of
    [H,W,B,2C] (HWNC) raw conv outputs, Σ2C = M; bias [M] fp32.
    """
    if hwbc:
        shifted = jnp.transpose(shifted, (2, 0, 1, 3))
    y = jnp.einsum("bhwj,bjm->bhwm", shifted, v)
    y = jnp.transpose(y, (1, 2, 0, 3)).astype(shifted.dtype)
    return (y + jnp.concatenate(convs, axis=-1)
            + bias.astype(shifted.dtype))


def _blend_kernel(s_ref, v_ref, b_ref, *rest, hwbc=False):
    conv_refs, o_ref = rest[:-1], rest[-1]
    if hwbc:
        # s block [BTH, W, B, J] — the mask-conv producer's natural bytes;
        # moving B from the sublane dim to the batch dim is an in-VMEM
        # 8×8 sublane-block shuffle on the (small, J=90-lane) input rather
        # than a 23.6 MB HBM relayout copy per style-group kernel
        th, w, b = s_ref.shape[0], s_ref.shape[1], s_ref.shape[2]
        flat = jnp.transpose(s_ref[...], (2, 0, 1, 3)).reshape(
            b, th * w, s_ref.shape[3])
    else:
        b, th, w = s_ref.shape[0], s_ref.shape[1], s_ref.shape[2]
        flat = s_ref[...].reshape(b, th * w, s_ref.shape[3])
    m = o_ref.shape[3]
    c2 = conv_refs[0].shape[3]
    mc = _pick_mchunk(m)
    per = mc // c2
    for k in range(m // mc):
        y = jax.lax.dot_general(
            flat, v_ref[:, :, k * mc:(k + 1) * mc],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                   # [B, TH·W, mc]
        yt = jnp.transpose(
            y.reshape(b, th, w, mc).astype(o_ref.dtype), (1, 2, 0, 3))
        cs = jnp.concatenate(
            [conv_refs[k * per + i][...] for i in range(per)], axis=-1)
        o_ref[:, :, :, k * mc:(k + 1) * mc] = (
            yt + cs + b_ref[0, k * mc:(k + 1) * mc]
            .astype(o_ref.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def style_blend_dot(shifted, v, convs, bias, hwbc=False):
    """[B,H,W,J] × [B,J,M] + concat [H,W,B,2C] convs + bias → [H,W,B,M].

    Uses the Pallas kernel on TPU for supported shapes, the jnp twin
    otherwise. ``convs`` is a tuple; gradients flow to every operand.
    ``hwbc``: ``shifted`` is [H,W,B,J] logical (the mask-conv producer's
    natural bytes — read with zero relayout).
    """
    return _blend_forward(shifted, v, convs, bias, hwbc)


def _blend_forward(shifted, v, convs, bias, hwbc=False, interpret=False):
    if hwbc:
        h, w, b, j = shifted.shape
    else:
        b, h, w, j = shifted.shape
    m = v.shape[2]
    if not interpret and (jax.default_backend() != "tpu"
                          or not style_blend_supported(
                              (b, h, w, j), m, len(convs),
                              itemsize=jnp.dtype(shifted.dtype).itemsize)):
        return style_blend_reference(shifted, v, convs, bias, hwbc)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = m // len(convs)
    in_specs = [
        pl.BlockSpec((BTH, w, b, j), lambda hh: (hh, 0, 0, 0),
                     memory_space=pltpu.VMEM) if hwbc else
        pl.BlockSpec((b, BTH, w, j), lambda hh: (0, hh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, j, m), lambda hh: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m), lambda hh: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((BTH, w, b, c2), lambda hh: (hh, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in convs
    ]
    return pl.pallas_call(
        functools.partial(_blend_kernel, hwbc=hwbc),
        grid=(h // BTH,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BTH, w, b, m), lambda hh: (hh, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, b, m), shifted.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shifted, v, bias.reshape(1, m).astype(jnp.float32), *convs)


def _blend_fwd(shifted, v, convs, bias, hwbc=False):
    # zero-size carriers: static conv count (shape) + operand dtypes
    cmeta = jnp.zeros((len(convs), 0), convs[0].dtype)
    bmeta = jnp.zeros((0,), bias.dtype)
    return (_blend_forward(shifted, v, convs, bias, hwbc),
            (shifted, v, cmeta, bmeta))


def _blend_bwd(hwbc, res, g):
    shifted, v, cmeta, bmeta = res
    n_conv, cdt, bdt = cmeta.shape[0], cmeta.dtype, bmeta.dtype
    m = g.shape[3]
    c2 = m // n_conv
    sh_bhwc = (jnp.transpose(shifted, (2, 0, 1, 3)) if hwbc else shifted)
    gt = jnp.transpose(g, (2, 0, 1, 3))  # [B,H,W,M]
    gs = jnp.einsum("bhwm,bjm->bhwj", gt, v).astype(shifted.dtype)
    if hwbc:
        gs = jnp.transpose(gs, (1, 2, 0, 3))
    gv = jnp.einsum("bhwj,bhwm->bjm", sh_bhwc, gt).astype(v.dtype)
    gconvs = tuple(
        g[..., i * c2:(i + 1) * c2].astype(cdt) for i in range(n_conv))
    gbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(bdt)
    return gs, gv, gconvs, gbias


style_blend_dot.defvjp(_blend_fwd, _blend_bwd)
