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


def style_dot_supported(shape, m) -> bool:
    b, h, w, j = shape
    return h % TH == 0 and m % 128 == 0 and w % 8 == 0


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
                          or not style_dot_supported(shifted.shape, m)):
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
