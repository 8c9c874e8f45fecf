"""Tap-stacked ×8 head conv: [3,3,512,64-embedded] at 64 lanes → 576 lanes.

The folded+embedded head conv of the phase-packed ×8 tail
(``DepthNet._packed_tail``: ``g4 [B,257,Wc,512] ⊛ w64 [3,3,512,64] →
pre64 [B,256,256,64]``, reference ops ``sftmd_arch.py:898-908,946-950``)
runs in XLA at exactly its output-lane roofline: 64 of 128 MXU lanes →
309 GFLOP in 3.21 ms (96 TFLOP/s on a 197-peak v5e), plus a 0.41 ms
relayout copy to hand the result to the output-stage kernel.

This kernel restores full lanes by stacking all nine taps on the lane
axis: one [rows, 512] × [512, 9·64] matmul per halo strip (576/640 =
90 % lane utilization after tile padding), then a cheap in-VMEM
shift-add combines the taps (dy via row-slab offsets, dx via sublane
shifts). Per (batch, row-block) program:

* DMA a (TH+2)-row halo strip of ONE batch item from the HWBC-flattened
  g4 (the producer emits the conv with an ``HWNC`` output spec — its
  physical bytes are the conv-natural layout, so this costs nothing) —
  double-buffered: program i starts program i+1's strip before
  computing, hiding the HBM read under the MXU.
* the strip's top row is zeroed for the first block (the conv's
  pad=(1,0)); g4's zero-gated row/column 256 supplies the other edges.
* output block [1, TH, 256, 64] of a logical [B,256,256,64] tensor in
  Pallas's default {3,2,1,0} layout — exactly the operand layout
  ``output_stage_x8`` constrains, so the hand-off is copy-free.

Gradients flow through the jnp twin's VJP. Falls back to the twin
off-TPU / on unsupported shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["head_dot", "head_dot_reference", "head_dot_supported",
           "stack_head_taps"]

TH = 16  # output rows per program


def head_dot_supported(g4_shape, cout) -> bool:
    """g4 is [Hp, Wc, B, C4] (HWNC logical). Wc may carry zero-gated pad
    columns; the head window never reads past column Hp-1."""
    hp, wc, b, c4 = g4_shape
    w = hp - 1
    # w >= 2·TH: a single-block grid's halo strip (TH+2 rows) would not
    # fit the Hp = TH+1 tensor
    return (w % TH == 0 and w >= 2 * TH and wc >= hp and wc % 8 == 0
            and c4 % 128 == 0 and cout % 64 == 0 and b <= 8)


def stack_head_taps(w64):
    """[3,3,C4,Cout] → [C4, 9·Cout], taps on lanes in (dy,dx)-major order."""
    c4, cout = w64.shape[2], w64.shape[3]
    return jnp.transpose(w64, (2, 0, 1, 3)).reshape(c4, 9 * cout)


def head_dot_reference(g4_hwbc, w64, b64):
    """jnp twin: conv(pad (1,0)) + bias on the BHWC view, BHWC output."""
    g4 = jnp.transpose(g4_hwbc, (2, 0, 1, 3))
    w = g4.shape[1] - 1
    pre = jax.lax.conv_general_dilated(
        g4, w64.astype(g4.dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, :, :w] + b64.astype(g4.dtype)
    return pre


def _kernel(g4_hbm, wf_ref, b_ref, out_ref, scratch, sems, *,
            hp, wc, c4, cout, nblk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = hp - 1
    bb = pl.program_id(0)
    tt = pl.program_id(1)
    nb = pl.num_programs(0)

    def start(step, slot):
        """DMA the halo strip for flat program index ``step`` into ``slot``.

        Strips are [y0-1, y0+TH+1) ∩ [0, hp); the first block's missing
        top row is DMA'd one short and zeroed in compute.
        """
        # clamped like y1 below: the final start(step+1) call traces its
        # (guarded-off) copy with step == nb·nblk
        sb = jnp.minimum(step // nblk, nb - 1)
        st = step % nblk
        # y0-1 clamped: pl.when traces both branches, and the first block's
        # (unused) body branch would otherwise slice at a static -1
        y1 = jnp.maximum(st * TH - 1, 0)
        first = st == 0

        @pl.when(jnp.logical_and(step < nb * nblk, first))
        def _first():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(0, TH + 1), :, pl.ds(sb * c4, c4)],
                scratch.at[slot, pl.ds(1, TH + 1)], sems.at[slot]).start()

        @pl.when(jnp.logical_and(step < nb * nblk, jnp.logical_not(first)))
        def _body():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(y1, TH + 2), :, pl.ds(sb * c4, c4)],
                scratch.at[slot], sems.at[slot]).start()

    step = bb * nblk + tt
    slot = step % 2

    @pl.when(step == 0)
    def _prologue():
        start(0, 0)

    start(step + 1, (step + 1) % 2)

    def wait(slot_, st):
        first = st == 0

        @pl.when(first)
        def _wf():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(0, TH + 1), :, pl.ds(0, c4)],
                scratch.at[slot_, pl.ds(1, TH + 1)], sems.at[slot_]).wait()

        @pl.when(jnp.logical_not(first))
        def _wb():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(0, TH + 2), :, pl.ds(0, c4)],
                scratch.at[slot_], sems.at[slot_]).wait()

    wait(slot, tt)

    strip = scratch[slot]                       # [TH+2, Wc, C4]
    # first block: the DMA left row 0 untouched (uninitialized) — select,
    # don't scale (NaN·0 = NaN)
    top = jnp.where(tt == 0, jnp.zeros_like(strip[0]), strip[0])
    strip = jnp.concatenate([top[None], strip[1:]], axis=0)

    # one tap-stacked matmul per strip row (Mosaic keeps row dots cheap;
    # a merged [rows·Wc, C4] dot would need a 3D re-split it can't do)
    wf = wf_ref[...]
    p = [jax.lax.dot_general(
        strip[r], wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) for r in range(TH + 2)]

    bias = b_ref[...].astype(jnp.float32)
    zrow = jnp.zeros((1, cout), jnp.float32)
    rows = []
    for y in range(TH):
        tdx = []
        for dx in range(3):
            acc = (p[y][:, dx * cout:(dx + 1) * cout]
                   + p[y + 1][:, (3 + dx) * cout:(4 + dx) * cout]
                   + p[y + 2][:, (6 + dx) * cout:(7 + dx) * cout])
            tdx.append(acc)
        pre = (jnp.concatenate([zrow, tdx[0][:w - 1]], axis=0)
               + tdx[1][:w] + tdx[2][1:w + 1]) + bias
        rows.append(pre)
    out_ref[0] = jnp.stack(rows).astype(out_ref.dtype)  # [TH, W, Cout]


@jax.custom_vjp
def head_dot(g4_hwbc, w64, b64):
    """Folded+embedded head conv from an HWNC-emitted g4.

    g4_hwbc: [Hp, Wc, B, C4] (the packed tensor in conv-natural bytes);
    w64: [3,3,C4,Cout]; b64: [Cout]. Returns [B, Hp-1, Hp-1, Cout] in the
    default layout (what ``output_stage_x8`` consumes). Uses the Pallas
    kernel on TPU for supported shapes, the jnp twin otherwise.
    """
    return _forward(g4_hwbc, w64, b64)


def _forward(g4_hwbc, w64, b64, interpret=False):
    hp, wc, b, c4 = g4_hwbc.shape
    cout = w64.shape[3]
    if not interpret and (jax.default_backend() != "tpu"
                          or not head_dot_supported(g4_hwbc.shape, cout)):
        return head_dot_reference(g4_hwbc, w64, b64)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = hp - 1
    nblk = w // TH
    flat = g4_hwbc.reshape(hp, wc, b * c4)
    wf = stack_head_taps(w64).astype(g4_hwbc.dtype)
    grid = (b, nblk)
    return pl.pallas_call(
        functools.partial(_kernel, hp=hp, wc=wc, c4=c4, cout=cout,
                          nblk=nblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c4, 9 * cout), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, w, cout), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w, w, cout), g4_hwbc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, wc, c4), g4_hwbc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # double-buffered halo scratch (9.7 MB) + per-row f32 tap
            # slabs (~11 MB) exceed the 16 MB scoped-VMEM default
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flat, wf, b64.reshape(1, cout).astype(jnp.float32))


def _fwd(g4_hwbc, w64, b64):
    return _forward(g4_hwbc, w64, b64), (g4_hwbc, w64, b64)


def _bwd(res, g):
    g4_hwbc, w64, b64 = res
    _, vjp = jax.vjp(lambda a, w, c: head_dot_reference(a, w, c),
                     g4_hwbc, w64, b64)
    return vjp(g)


head_dot.defvjp(_fwd, _bwd)
