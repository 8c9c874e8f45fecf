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

__all__ = ["output_stage", "output_stage_reference", "output_stage_supported",
           "output_stage_x8", "output_stage_x8_reference",
           "output_stage_x8_supported", "embed_head_channels"]

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


# ---------------------------------------------------------------------------
# v3: embedded-channel variant for r=4, C=3 (the ×8/×4 serving tails).
#
# The v2 scatter matmul contracts with M=12 output rows — 9% MXU sublane
# utilization — and costs 2.9 ms at the flagship shape (bandwidth roofline
# ~0.2 ms). v3 restructures the interleave so the one-hot contraction runs
# with M=TH·64=512 (all row-band phases stacked on the M axis):
#
#   1. the PRODUCER conv emits 64 channels instead of 48, reordered to
#      i·16 + (j·3 + c) with 4 zero channels after each 12
#      (``embed_head_channels``) — free: XLA pads a 48-lane conv to 128
#      lanes either way, and zero kernel columns cost nothing;
#   2. the kernel clamps, transposes each row band to [64, W] (XLU) and
#      stacks them → C [TH·64, W] with rows (y, i, m′);
#   3. per 128-column chunk, ONE dot C_k [TH·64, 128] × SC [128, 1536]
#      spreads x to stride-12 lane positions (one-hot, exact in bf16);
#   4. a lane mask picks m′ = n%12 and an aligned [TH·4, 16, 1536]
#      reshape + sum collapses the 16-row phase groups (the 4 pad rows
#      are structurally zero) → dense fp32 rows.
#
# No halo → BlockSpec auto-pipelining; no manual DMA.
# ---------------------------------------------------------------------------

_V3_R, _V3_C = 4, 3
_V3_RC = _V3_R * _V3_C          # 12 row-phase channels
_V3_CP = 16                     # padded per-phase channel group
_V3_XC = 128                    # x columns per chunk (lane-slice granularity)


def embed_head_channels(w, b):
    """Reorder+pad a [..., 48] head conv (canonical PS(4) output order
    c·16+i·4+j) to 64 channels in i·16+(j·3+c) order, zeros at m′≥12.

    Apply to the producer's folded kernel/bias so its conv output feeds
    :func:`output_stage_x8` directly. Exact: adds zero output channels and
    permutes the rest (same MXU time — the 48-lane conv already padded to
    128 lanes).
    """
    m = np.arange(48)
    i, j, c = m // 12, (m % 12) // 3, m % 3
    src = c * 16 + i * 4 + j          # canonical channel for (i, j, c)
    dst = i * _V3_CP + (j * 3 + c)    # embedded slot
    wp = jnp.zeros(w.shape[:-1] + (64,), w.dtype)
    bp = jnp.zeros((64,), b.dtype)
    wp = wp.at[..., dst].set(w[..., src])
    bp = bp.at[dst].set(b[src])
    return wp, bp


def output_stage_x8_reference(pre64, clamp_min=0.0, clamp_max=1.0,
                              order="bhwc"):
    """jnp twin of :func:`output_stage_x8` (un-embeds, then v2 reference)."""
    if order == "hbwc":
        pre64 = jnp.transpose(pre64, (1, 0, 2, 3))
    m = np.arange(48)
    i, j, c = m // 12, (m % 12) // 3, m % 3
    # canonical channel c·16+i·4+j ← embedded slot i·16+(j·3+c)
    gather = np.empty(48, np.int64)
    gather[c * 16 + i * 4 + j] = i * _V3_CP + j * 3 + c
    return output_stage_reference(pre64[..., gather], _V3_R,
                                  clamp_min, clamp_max)


def output_stage_x8_supported(shape, order="bhwc") -> bool:
    if order == "hbwc":
        h, b, w, c64 = shape
    else:
        b, h, w, c64 = shape
    return c64 == 64 and h % TH == 0 and w % _V3_XC == 0


def _v3_scatter(dtype):
    """0/1 [XC, XC·12]: column n takes x-row n//12."""
    sc = np.zeros((_V3_XC, _V3_XC * _V3_RC), np.float32)
    for n in range(_V3_XC * _V3_RC):
        sc[n // _V3_RC, n] = 1.0
    return jnp.asarray(sc, dtype)


def _v3_lane_mask():
    """0/1 [16, XC·12]: column n keeps phase row n%12 (pad rows zero)."""
    m = np.zeros((_V3_CP, _V3_XC * _V3_RC), np.float32)
    for n in range(_V3_XC * _V3_RC):
        m[n % _V3_RC, n] = 1.0
    return jnp.asarray(m, jnp.float32)


def _kernel_v3(pre_ref, sc_ref, m_ref, out_ref, *, clamp_min, clamp_max,
               hbwc=False):
    # bhwc blocks are [1, TH, W, 64]; hbwc blocks [TH, 1, W, 64]
    tile = pre_ref[:, 0] if hbwc else pre_ref[0]
    th, w = tile.shape[0], tile.shape[1]
    tile = jnp.clip(tile, clamp_min, clamp_max)             # [TH, W, 64]
    ct = jnp.swapaxes(tile, 1, 2).reshape(th * 64, w)       # rows (y,i,m')
    sc = sc_ref[...]
    lm = m_ref[...]
    for k in range(w // _V3_XC):
        d = jax.lax.dot_general(
            ct[:, k * _V3_XC:(k + 1) * _V3_XC], sc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [TH·64, 1536]
        r = jnp.sum(
            d.reshape(th * _V3_R, _V3_CP, _V3_XC * _V3_RC) * lm[None],
            axis=1,
        )                                                   # [TH·4, 1536]
        out_ref[0, :, k * _V3_XC * _V3_RC:(k + 1) * _V3_XC * _V3_RC] = r


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def output_stage_x8(pre64, clamp_min=0.0, clamp_max=1.0, order="bhwc"):
    """clip→PS(4)→fp32 from an embedded-channel head ([B,H,W,64] via
    :func:`embed_head_channels`; ``order="hbwc"`` accepts the
    [H,B,W,64] layout ``head_dot`` emits) → [B,H·4,W·12] dense fp32
    rows.

    Falls back to the jnp twin off-TPU / on unsupported shapes. Gradients
    flow through the twin's VJP.
    """
    return _forward_x8(pre64, clamp_min, clamp_max, order)


def _forward_x8(pre64, clamp_min, clamp_max, order="bhwc",
                interpret=False):
    hbwc = order == "hbwc"
    if not interpret and (jax.default_backend() != "tpu"
                          or not output_stage_x8_supported(pre64.shape,
                                                           order)):
        return output_stage_x8_reference(pre64, clamp_min, clamp_max, order)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if hbwc:
        h, b, w, _ = pre64.shape
        in_block, in_idx = (TH, 1, w, 64), lambda bb, hh: (hh, bb, 0, 0)
    else:
        b, h, w, _ = pre64.shape
        in_block, in_idx = (1, TH, w, 64), lambda bb, hh: (bb, hh, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_v3, clamp_min=clamp_min,
                          clamp_max=clamp_max, hbwc=hbwc),
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec(in_block, in_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_V3_XC, _V3_XC * _V3_RC), lambda bb, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_V3_CP, _V3_XC * _V3_RC), lambda bb, hh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH * _V3_R, w * _V3_RC),
                               lambda bb, hh: (bb, hh, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * _V3_R, w * _V3_RC),
                                       jnp.float32),
        interpret=interpret,
    )(pre64, _v3_scatter(pre64.dtype), _v3_lane_mask())


def _fwd_x8(pre64, clamp_min, clamp_max, order):
    return _forward_x8(pre64, clamp_min, clamp_max, order), pre64


def _bwd_x8(clamp_min, clamp_max, order, pre64, g):
    _, vjp = jax.vjp(
        lambda p: output_stage_x8_reference(p, clamp_min, clamp_max, order),
        pre64)
    return vjp(g)


output_stage_x8.defvjp(_fwd_x8, _bwd_x8)


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
