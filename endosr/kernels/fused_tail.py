"""Fused ×8 tail head: folded 9×9 conv → clamp → shuffle → dense f32 rows.

One Pallas kernel replaces the last three stages of the phase-packed ×8
tail (``DepthNet._packed_tail``): the folded head conv [3,3,512,48], the
layout copy between it and the output stage, and the output-stage kernel
itself. Reference ops being replaced: the 9×9 ``conv_output`` +
``nn.PixelShuffle`` + ``clamp`` chain (``codes/models/modules/
sftmd_arch.py:898-908,946-950``).

Why a kernel — measured inefficiencies of the split lowering (v5e,
flagship ×8, bs8, profile_fusions):

* the head conv has only 48 output channels, so XLA's MXU schedule caps at
  48/128 = 37.5% lane utilization (3.2 ms ≈ its exact roofline at 37.5%).
  Here the conv runs as one [M,512]×[512,432] row-strip matmul — all nine
  taps' outputs side by side on the lane axis (432/512 = 84% utilization)
  — followed by a cheap in-VMEM shift-add over the taps.
* the output-stage interleave cost 2.9 ms as XLA scatter-matmuls plus a
  0.4 ms layout copy. Here the scatter contracts 32-column chunks in
  bfloat16 (exact: a one-hot contraction selects single bf16 values), and
  the clamp/convert rides along for free.

Layout reality (why this defaults OFF — see ``DepthNet.pallas_tail``):
TPU convs emit [B,H,W,C] as physical (h, w, [tile: b-sublanes ×
c-lanes]) — batch lives in sublanes INSIDE each c-tile. Every default-
layout logical form a Pallas kernel could consume either (a) cannot be
batch-sliced by the DMA (the 4D form's batch dim is sublane-tiled,
granularity-8), or (b) requires a retile ((b,c)→lanes merge: 2.07 ms
measured), or (c) needs the whole batch resident per program (21.6 MB
strip > default scoped-VMEM budget, and the (w,b)-paired scatter dot
takes ~160 s of Mosaic compile). The shipped kernel uses form (b): the
kernel itself measures 4.55 ms vs 6.5 ms for XLA's split lowering, but
the retile eats the win — end-to-end a wash (34.1 vs 33.9 ms). Kept as
a correct, tested A/B knob; flips on automatically only when forced.

The input row strips overlap by two rows (the 3×3 halo), which BlockSpec
pipelines cannot express, so the tensor stays in HBM (`pl.ANY`) and each
program DMAs its (TH+2)-row strip into VMEM scratch.

Output is [B, H·4, W·12] f32 — byte-identical to row-major NHWC
[B, H·4, W·4, 3] — written as dense rows. The clamped values are
quantized to bfloat16 by the interleave (one-hot bf16 contraction); the
whole surrounding forward already runs in bfloat16, and bench.py's
bf16-vs-fp32 PSNR certification covers this quantization.

Gradients fall back to the jnp twin's VJP, so the kernel is usable in
training as well as inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_tail", "fused_tail_reference", "fused_tail_supported",
           "fold_head_operands"]

TH = 8      # input rows per program (output rows per program = TH·rt)
XCHUNK = 32  # x columns per interleave scatter (32·12 = 384 = 3 lanes)

_RT = 4      # fine pixels per packed cell edge (PS(2) pending × fs=2)
_C = 3       # RGB
_RC = _RT * _C

def fused_tail_supported(g4_shape, rt, out_nc) -> bool:
    """g4 may carry zero-gated extra columns beyond hp (DMA slices need the
    trailing dims 8-sublane aligned, so the producer right-pads to wc)."""
    b, hp, wc, c4 = g4_shape
    w = hp - 1
    return (rt == _RT and out_nc == _C and wc >= hp and wc % 8 == 0
            and c4 % 128 == 0 and w % TH == 0 and w % XCHUNK == 0)


def fold_head_operands(wh, bh):
    """Reorder the folded head conv [3,3,C4,48]+[48] for the kernel.

    Output lane order per tap t=3·dy+dx is m' = i·12 + j·3 + c (phase-major)
    versus the fold's canonical c·16 + i·4 + j, so each phase's 12 channels
    are a contiguous lane slice. Returns (wflat [C4, 9·48], b48 [48]).
    """
    c4 = wh.shape[2]
    m = np.arange(48)
    i, j, c = m // 12, (m % 12) // 3, m % 3
    out_perm = c * 16 + i * 4 + j
    wflat = (wh.transpose(2, 0, 1, 3)
             .reshape(c4, 9, 48)[:, :, out_perm]
             .reshape(c4, 9 * 48))
    return wflat, bh[out_perm]


def fused_tail_reference(g4, wh, bh, clamp_min=0.0, clamp_max=1.0):
    """jnp twin: head conv (pad [(1,0),(1,0)]) → clip → shuffle → f32 rows.

    Output is square (hp-1)²·rt² regardless of g4's zero-gated column pad.
    """
    from endosr.kernels.output_stage import output_stage_reference

    w = g4.shape[1] - 1
    pre = jax.lax.conv_general_dilated(
        g4, wh.astype(g4.dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, :, :w] + bh.astype(g4.dtype)
    return output_stage_reference(pre, _RT, clamp_min, clamp_max)


def _scatter_onehot(dtype):
    """0/1 [XCHUNK, XCHUNK·12]: column n takes row n//12."""
    sc = np.zeros((XCHUNK, XCHUNK * _RC), np.float32)
    for n in range(XCHUNK * _RC):
        sc[n // _RC, n] = 1.0
    return jnp.asarray(sc, dtype)


def _lane_mask(dtype):
    """0/1 [12, XCHUNK·12]: column n keeps row n%12."""
    m = np.zeros((_RC, XCHUNK * _RC), np.float32)
    for n in range(XCHUNK * _RC):
        m[n % _RC, n] = 1.0
    return jnp.asarray(m, dtype)


def _kernel(g4_hbm, wf_ref, b_ref, sc_ref, m_ref, out_ref, scratch, sem, *,
            hp, wc, c4, clamp_min, clamp_max):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = hp - 1
    bb = pl.program_id(0)
    tt = pl.program_id(1)
    y0 = tt * TH

    # DMA the (TH+2)-row halo strip for one batch. The HWBC tensor arrives
    # flattened to [Hp, Wc, B·C4] so the per-batch pick is a 512-aligned
    # lane slice (the batch dim itself sits in sublane-tile position and
    # cannot be sliced at granularity 1). The top block zero-pads its
    # first row.
    @pl.when(tt == 0)
    def _top():
        cp = pltpu.make_async_copy(
            g4_hbm.at[pl.ds(0, TH + 1), :, pl.ds(bb * c4, c4)],
            scratch.at[pl.ds(1, TH + 1)], sem)
        cp.start()
        cp.wait()
        scratch[0] = jnp.zeros((wc, c4), scratch.dtype)

    @pl.when(tt != 0)
    def _body():
        cp = pltpu.make_async_copy(
            g4_hbm.at[pl.ds(y0 - 1, TH + 2), :, pl.ds(bb * c4, c4)],
            scratch, sem)
        cp.start()
        cp.wait()

    # head conv as row matmuls: all 9 taps side by side on the lane axis
    # (432/512 utilization vs 48/128 for the direct conv). Per-row dots —
    # Mosaic cannot split the merged dot output back to 3D.
    wf = wf_ref[...]
    p = [jax.lax.dot_general(
        scratch[r], wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(scratch.dtype) for r in range(TH + 2)]

    bias = b_ref[...].astype(jnp.float32)
    zrow = jnp.zeros((1, 48), jnp.float32)
    rows = []
    for y in range(TH):
        # dy-combine first (free row-slab indexing), then the two x shifts
        tdx = []
        for dx in range(3):
            acc = (p[y][:, dx * 48:dx * 48 + 48].astype(jnp.float32)
                   + p[y + 1][:, (3 + dx) * 48:(3 + dx) * 48 + 48]
                   + p[y + 2][:, (6 + dx) * 48:(6 + dx) * 48 + 48])
            tdx.append(acc)
        pre = (jnp.concatenate([zrow, tdx[0][:w - 1]], axis=0)
               + tdx[1][:w] + tdx[2][1:w + 1]) + bias
        rows.append(jnp.clip(pre, clamp_min, clamp_max))
    pre_all = jnp.stack(rows).astype(scratch.dtype)  # [TH, W, 48]

    # interleave: per phase i a one-hot contraction over the x chunk
    # (exact: selects single values) + lane mask
    sc = sc_ref[...]
    lm = m_ref[...].astype(jnp.float32)
    nck = w // XCHUNK
    for i in range(_RT):
        g = pre_all[:, :, i * _RC:(i + 1) * _RC]    # [TH, W, 12]
        gc = g.reshape(TH, nck, XCHUNK, _RC)
        d = jax.lax.dot_general(
            gc, sc, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [TH, nck, 12, 384]
        r = jnp.sum(d * lm, axis=2)                 # [TH, nck, 384] (exact)
        for y in range(TH):
            for k in range(nck):
                out_ref[0, y * _RT + i,
                        k * XCHUNK * _RC:(k + 1) * XCHUNK * _RC] = r[y, k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_tail(g4, wh, bh, clamp_min=0.0, clamp_max=1.0, layout="bhwc"):
    """Folded head conv + clamp + PS(4) + f32 as one pass.

    g4: [B, Hp, Wp, C4] packed tensor (``layout="bhwc"``) or the same data
    as [Hp, Wp, B, C4] (``layout="hwbc"`` — the physical order TPU convs
    emit, which the producer can create for free via an HWNC conv output
    spec; a logical BHWC operand would cost a 2×556 MB relayout copy,
    measured 2.07 ms at the flagship shape). wh: [3,3,C4,48] folded head
    kernel in canonical PS(4) output order; bh: [48]. Returns
    [B,(Hp-1)·4,(Hp-1)·12] f32, byte-identical to row-major NHWC
    [B,(Hp-1)·4,(Hp-1)·4,3].
    """
    return _forward(g4, wh, bh, clamp_min, clamp_max, layout)


def _forward(g4, wh, bh, clamp_min, clamp_max, layout="bhwc",
             interpret=False):
    shape = g4.shape if layout == "bhwc" else (
        g4.shape[2], g4.shape[0], g4.shape[1], g4.shape[3])
    if not interpret and (jax.default_backend() != "tpu"
                          or not fused_tail_supported(shape, _RT, _C)):
        if layout == "hwbc":
            g4 = jnp.transpose(g4, (2, 0, 1, 3))
        return fused_tail_reference(g4, wh, bh, clamp_min, clamp_max)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hp, wc, c4 = shape
    w = hp - 1
    wflat, b48 = fold_head_operands(wh, bh)
    if layout == "hwbc":
        g4t = g4.reshape(hp, wc, b * c4)
    else:
        g4t = jnp.transpose(g4, (1, 2, 0, 3)).reshape(hp, wc, b * c4)
    return pl.pallas_call(
        functools.partial(_kernel, hp=hp, wc=wc, c4=c4,
                          clamp_min=clamp_min, clamp_max=clamp_max),
        grid=(b, (hp - 1) // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c4, 9 * 48), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XCHUNK, XCHUNK * _RC), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RC, XCHUNK * _RC), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH * _RT, w * _RC),
                               lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w * _RT, w * _RC),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, wc, c4), g4.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g4t, wflat.astype(g4.dtype), b48.reshape(1, 48).astype(jnp.float32),
      _scatter_onehot(g4.dtype), _lane_mask(g4.dtype))


def _fwd(g4, wh, bh, clamp_min, clamp_max, layout):
    return _forward(g4, wh, bh, clamp_min, clamp_max, layout), (g4, wh, bh)


def _bwd(clamp_min, clamp_max, layout, res, g):
    g4, wh, bh = res

    def ref(a, w_, b_):
        if layout == "hwbc":
            a = jnp.transpose(a, (2, 0, 1, 3))
        return fused_tail_reference(a, w_, b_, clamp_min, clamp_max)

    _, vjp = jax.vjp(ref, g4, wh, bh)
    return vjp(g)


fused_tail.defvjp(_fwd, _bwd)
