"""Fused output stage: clamp → pixel_shuffle(r) → fp32 (Pallas, TPU).

The flagship tail ends with ``clip(pre) → pixel_shuffle(r) → astype(f32)``
on a [B,H,W,C·r²] tensor. XLA lowers this as an early fp32 convert followed
by two large layout copies (5.2 ms of device time in the traced ×8 forward
at bs8 — pure data movement worth ~0.25 ms of HBM traffic). This kernel
emits the shuffled fp32 rows directly, one VMEM tile at a time: measured
end-to-end with forced output materialization on v5e, the ×8 forward drops
41.4 → 39.7 ms at bs8 with bit-identical output vs the jnp twin.

The output is laid out as [B, H·r, W, r·C] — byte-identical to row-major
NHWC [B, H·r, W·r, C] — so the trailing reshape is layout-free; writing
NHWC directly would put C (=3) on the lane dimension and crawl.

Shuffle math per output row band (y, i): out[y·r+i, (x·r+j)·C+c] =
pre[y, x, c·r²+i·r+j] — Mosaic cannot split the minor (channel) axis, so
the (i,j,c) reorder runs as r tiny 0/1 selection matmuls on the MXU.
Reference op being replaced: torch ``nn.PixelShuffle`` + ``clamp``
(``codes/models/modules/sftmd_arch.py:946-950``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["output_stage", "output_stage_reference", "output_stage_supported"]

TH = 8  # input rows per program


def output_stage_reference(pre, r, clamp_min=0.0, clamp_max=1.0):
    """jnp twin: clip → pixel_shuffle(r) → fp32, flattened to [B,H·r,W·r·C]."""
    from endosr.nn.layers import pixel_shuffle

    out = pixel_shuffle(jnp.clip(pre, clamp_min, clamp_max), r)
    b, hh, ww, c = out.shape
    return out.astype(jnp.float32).reshape(b, hh, ww * c)


def output_stage_supported(h, w, c_rr, r) -> bool:
    c = c_rr // (r * r)
    return h % TH == 0 and (w * r * c) % 128 == 0 and c * r * r == c_rr


def _selector(r, c, dtype):
    """0/1 matrices S[i] mapping channel c·r²+i·r+j → column j·C+c."""
    s = np.zeros((r, c * r * r, r * c), np.float32)
    for i in range(r):
        for j in range(r):
            for cc in range(c):
                s[i, cc * r * r + i * r + j, j * c + cc] = 1.0
    return jnp.asarray(s, dtype)


def _scatter_onehot(w, rc, dtype):
    """0/1 [W, W·rc]: contracting x spreads row x to columns [x·rc, x·rc+rc)."""
    sc = np.zeros((w, w * rc), np.float32)
    for x in range(w):
        sc[x, x * rc:(x + 1) * rc] = 1.0
    return jnp.asarray(sc, dtype)


def _lane_mask(rc, w):
    """0/1 [rc, W·rc] picking row n%rc at column n (the m-diagonal)."""
    m = np.zeros((rc, w * rc), np.float32)
    for n in range(w * rc):
        m[n % rc, n] = 1.0
    return jnp.asarray(m, jnp.float32)


def _kernel(pre_ref, s_ref, out_ref, *, r, c, clamp_min, clamp_max):
    th, w = pre_ref.shape[1], pre_ref.shape[2]
    tile = jnp.clip(pre_ref[0], clamp_min, clamp_max)      # [TH, W, C·r²]
    flat = tile.reshape(th * w, c * r * r)
    # per output phase i, a 0/1 selection matmul reorders channels to (j, c)
    bands = []
    for i in range(r):
        g = jax.lax.dot_general(
            flat, s_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [TH·W, r·C]
        bands.append(g.reshape(th, 1, w, r * c))
    out = jnp.concatenate(bands, axis=1)                    # [TH, r, W, r·C]
    out_ref[0] = out.reshape(th * r, w, r * c)


def _kernel_v2(pre_ref, s_ref, sc_ref, m_ref, out_ref, *, r, c,
               clamp_min, clamp_max):
    """Dense-row variant: writes [TH·r, W·r·C] rows directly.

    The [W, rc]→[W·rc] lane interleave Mosaic cannot shape-cast runs as a
    one-hot scatter matmul on the MXU (exact: 0/1 weights, f32 accumulate):
    D = g_tᵀ-contract-x → [rc, W·rc], then a lane mask picks the m-diagonal
    and a sublane reduce collapses it to the dense output row. The padded
    4D intermediate of the v1 kernel (minor dim r·C lane-pads ~10× in HBM,
    then a real reshape copy) never exists.
    """
    th, w = pre_ref.shape[1], pre_ref.shape[2]
    rc = r * c
    tile = jnp.clip(pre_ref[0], clamp_min, clamp_max)
    flat = tile.reshape(th * w, c * r * r)
    sc = sc_ref[...]
    lm = m_ref[...]
    for i in range(r):
        g = jax.lax.dot_general(
            flat, s_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(pre_ref.dtype)                             # exact (0/1 sel)
        g3 = g.reshape(th, w, rc)
        for t in range(th):
            d = jax.lax.dot_general(
                g3[t], sc,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [rc, W·rc]
            out_ref[0, t * r + i] = jnp.sum(d * lm, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def output_stage(pre, r, clamp_min=0.0, clamp_max=1.0):
    """clip→shuffle→fp32 as one pass; [B,H,W,C·r²] → [B,H·r,W·r·C] fp32.

    Uses the Pallas kernel on TPU for supported shapes, the jnp twin
    otherwise. Gradients always flow through the twin's VJP.
    """
    return _forward(pre, r, clamp_min, clamp_max)


def _forward_v2(pre, r, clamp_min, clamp_max):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c_rr = pre.shape
    c = c_rr // (r * r)
    rc = r * c
    return pl.pallas_call(
        functools.partial(_kernel_v2, r=r, c=c,
                          clamp_min=clamp_min, clamp_max=clamp_max),
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec((1, TH, w, c_rr), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c_rr, rc), lambda bb, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w * rc), lambda bb, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, w * rc), lambda bb, hh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH * r, w * rc),
                               lambda bb, hh: (bb, hh, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w * rc), jnp.float32),
    )(pre, _selector(r, c, pre.dtype), _scatter_onehot(w, rc, pre.dtype),
      _lane_mask(rc, w))


def _forward(pre, r, clamp_min, clamp_max):
    b, h, w, c_rr = pre.shape
    if (jax.default_backend() != "tpu"
            or not output_stage_supported(h, w, c_rr, r)):
        return output_stage_reference(pre, r, clamp_min, clamp_max)
    c = c_rr // (r * r)
    # v2 (dense rows, no padded intermediate) when the row width tiles the
    # lane dim and the scatter one-hot fits VMEM comfortably
    if (w * r * c) % 128 == 0 and w * w * r * c * pre.dtype.itemsize <= 2 ** 23:
        return _forward_v2(pre, r, clamp_min, clamp_max)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    out = pl.pallas_call(
        functools.partial(_kernel, r=r, c=c,
                          clamp_min=clamp_min, clamp_max=clamp_max),
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec((1, TH, w, c_rr), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c_rr, r * c), lambda bb, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH * r, w, r * c),
                               lambda bb, hh: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w, r * c), jnp.float32),
    )(pre, _selector(r, c, pre.dtype))
    # [B, H·r, W, r·C] is byte-identical to row-major NHWC [B, H·r, W·r, C]
    return out.reshape(b, h * r, w * r * c)


def _fwd(pre, r, clamp_min, clamp_max):
    return _forward(pre, r, clamp_min, clamp_max), pre


def _bwd(r, clamp_min, clamp_max, pre, g):
    _, vjp = jax.vjp(
        lambda p: output_stage_reference(p, r, clamp_min, clamp_max), pre)
    return vjp(g)


output_stage.defvjp(_fwd, _bwd)
