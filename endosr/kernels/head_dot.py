"""Tap-stacked ×8 head conv: [3,3,512,64-embedded] at 64 lanes → 576 lanes.

The folded+embedded head conv of the phase-packed ×8 tail
(``DepthNet._packed_tail``: ``g4 [B,257,Wc,512] ⊛ w64 [3,3,512,64] →
pre64 [B,256,256,64]``, reference ops ``sftmd_arch.py:898-908,946-950``)
runs in XLA at exactly its output-lane roofline: 64 of 128 MXU lanes →
309 GFLOP in 3.21 ms (96 TFLOP/s on a 197-peak v5e), plus a 0.41 ms
relayout copy to hand the result to the output-stage kernel.

This kernel restores full lanes by stacking all nine taps on the lane
axis: one [rows·B, 512] × [512, 9·64] matmul per halo strip (576/640 =
90 % lane utilization after tile padding), then a cheap in-VMEM
shift-add combines the taps (dy via row-slab offsets, dx via row-dim
shifts).

Input contract — the producer conv emits ``HWNC`` logical order
(``g4 [Hp, Wc, B, C4]``). Its default {3,2,1,0} layout IS the conv's
natural byte order on TPU (H, W, B, C with (B, C) tiled), so XLA fuses
bias+leaky_relu into the conv epilogue and hands the bytes over with
zero relayout. Three round-1/2 versions paid real costs here: flattening
to [Hp,Wc,B·C4] retiled sublanes B→W (2.07 ms at the flagship shape), a
batch-merged [1,B·Hp,·,·] producer conv slowed XLA's conv strategy by
8 ms, and an HNWC emission moved the same retile into a 1.65 ms
lrelu+copy fusion. Per-batch strips can't be DMA'd from these bytes
(B is the sublane dim), so each program processes ALL batches: strips
slice only the untiled H dim. The s=0 packed gate (row n and column n
dead, ``layers.packed_gate``) is applied in-kernel — the full-tensor
gating multiply it replaces measured 1.51 ms.

Per row-block program:

* DMA the (TH+2)-row all-batch halo strip ``g4[y0-1 : y0+TH+1]`` —
  double-buffered: program i starts program i+1's strip before
  computing, hiding the HBM read under the MXU.
* the strip's top row is zeroed for the first block (the conv's
  pad=(1,0)); the last block zeroes its bottom halo row (packed dead
  row n); dead column n is masked out of the dx=2 tap.
* tap dots run as [Wc·B, C4] × [C4, 9·cout] (B rides the sublane dim
  through the matmul); slabs are produced in a rolling 3-row window to
  bound VMEM.
* output rows are written batch-major: pre64 is [Hp-1, B, Hp-1, cout]
  (HBWC) — H and B are untiled there, so ``output_stage_x8`` consumes
  it with plain BlockSpec slices (``order="hbwc"``); the [W,B]→[B,W]
  swap happens once in-VMEM on the bf16 row.

Gradients flow through the jnp twin's VJP. Falls back to the twin
off-TPU / on unsupported shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["head_dot", "head_dot_reference", "head_dot_supported",
           "stack_head_taps"]

TH = 8  # output rows per program


def head_dot_supported(g4_shape, cout, wout=None, itemsize=2) -> bool:
    """g4 is [Hp, Wc, B, C4] (HWNC logical). ``wout`` is the logical
    output width (defaults to Hp-1, the square case); Wc may carry pad
    columns beyond it. Row nh, column nw and the pads are dead slots,
    gated in-kernel (the packed s=0 gate). ``itemsize``: bytes per g4
    element (2 = bf16 serving; the fp32 certification path doubles the
    halo scratch and must fall back when it exceeds the VMEM budget —
    round-2's bench died compiling exactly that)."""
    hp, wc, b, c4 = g4_shape
    h = hp - 1
    if wout is None:
        wout = h
    # VMEM budget model, matching vmem_limit_bytes below: double-buffered
    # halo scratch + 4 live f32 tap slabs + weights + output block
    vmem = (2 * (TH + 2) * wc * b * c4 * itemsize      # halo scratch
            + 4 * wc * b * 9 * cout * 4                # rolling tap slabs
            + c4 * 9 * cout * itemsize                 # stacked weights
            + TH * b * wout * cout * itemsize)         # out block
    # h >= 2·TH: a single-block grid's halo strip (TH+2 rows) would not
    # fit the Hp = TH+1 tensor
    return (h % TH == 0 and h >= 2 * TH and wc >= wout + 1 and wc % 8 == 0
            and c4 % 128 == 0 and cout % 64 == 0 and b <= 8
            # bf16 (2,1) sublane packing: odd-b strips misalign in Mosaic
            and (itemsize != 2 or b % 2 == 0)
            and vmem <= 95 * 1024 * 1024)


def stack_head_taps(w64):
    """[3,3,C4,Cout] → [C4, 9·Cout], taps on lanes in (dy,dx)-major order."""
    c4, cout = w64.shape[2], w64.shape[3]
    return jnp.transpose(w64, (2, 0, 1, 3)).reshape(c4, 9 * cout)


def head_dot_reference(g4_hwnc, w64, b64, wout=None, pre_bias=None,
                       slope=0.2):
    """jnp twin: optional producer epilogue (bias + leaky_relu on the raw
    conv output), then the s=0 edge gate (row ≥ nh / col ≥ nw dead), conv
    (pad (1,0)) + bias on the BHWC view, HBWC output."""
    if pre_bias is not None:
        y = g4_hwnc + pre_bias.reshape(1, 1, 1, -1).astype(g4_hwnc.dtype)
        g4_hwnc = jnp.maximum(y, y * jnp.asarray(slope, g4_hwnc.dtype))
    g4 = jnp.transpose(g4_hwnc, (2, 0, 1, 3))
    hp, wc = g4.shape[1], g4.shape[2]
    h = hp - 1
    if wout is None:
        wout = h
    mr = (jnp.arange(hp) < h).astype(g4.dtype)
    mc = (jnp.arange(wc) < wout).astype(g4.dtype)
    g4 = g4 * mr[None, :, None, None] * mc[None, None, :, None]
    pre = jax.lax.conv_general_dilated(
        g4, w64.astype(g4.dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, :, :wout] + b64.astype(g4.dtype)
    return jnp.transpose(pre, (1, 0, 2, 3))


def _kernel(g4_hbm, wf_ref, b_ref, *rest, hp, wc, b, c4, cout, nblk, wout,
            slope=0.2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if len(rest) == 4:           # producer epilogue fused in
        pb_ref, out_ref, scratch, sems = rest
    else:
        pb_ref, (out_ref, scratch, sems) = None, rest

    tt = pl.program_id(0)

    def start(st, slot):
        """DMA the all-batch halo strip for row-block ``st`` into ``slot``.

        Strips are ``g4[y0-1 : y0+TH+1]``; the first block's missing top
        row is DMA'd one short and zeroed in compute.
        """
        # y0-1 clamped: pl.when traces both branches, and the first block's
        # (unused) body branch would otherwise slice at a static -1
        y1 = jnp.maximum(st * TH - 1, 0)
        first = st == 0

        @pl.when(jnp.logical_and(st < nblk, first))
        def _first():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(0, TH + 1)],
                scratch.at[slot, pl.ds(1, TH + 1)], sems.at[slot]).start()

        @pl.when(jnp.logical_and(st < nblk, jnp.logical_not(first)))
        def _body():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(y1, TH + 2)],
                scratch.at[slot], sems.at[slot]).start()

    slot = tt % 2

    @pl.when(tt == 0)
    def _prologue():
        start(0, 0)

    start(tt + 1, (tt + 1) % 2)

    def wait(slot_, st):
        first = st == 0

        @pl.when(first)
        def _wf():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(0, TH + 1)],
                scratch.at[slot_, pl.ds(1, TH + 1)], sems.at[slot_]).wait()

        @pl.when(jnp.logical_not(first))
        def _wb():
            pltpu.make_async_copy(
                g4_hbm.at[pl.ds(0, TH + 2)],
                scratch.at[slot_], sems.at[slot_]).wait()

    wait(slot, tt)

    strip = scratch[slot]                       # [TH+2, Wc, B, C4]
    if pb_ref is not None:
        # producer epilogue: the g4 conv emits RAW output and its
        # bias + leaky_relu run here in-VMEM (same dtype, bit-identical)
        # instead of as a separate whole-tensor XLA pass (556 MB RW,
        # measured 1.5 ms at the flagship shape). Must run BEFORE the
        # zero substitutions below: those rows represent conv padding /
        # the dead-slot gate, both of which apply AFTER the epilogue.
        y = strip + pb_ref[...].reshape(1, 1, 1, c4)
        strip = jnp.maximum(y, y * jnp.asarray(slope, y.dtype))
    # first block: the DMA left row 0 untouched (uninitialized) — select,
    # don't scale (NaN·0 = NaN). Last block: its bottom halo row is the
    # packed grid's dead row n (holds leaky_relu(conv) of out-of-range
    # slots) — gate it. Both are the s=0 packed row gate, applied here
    # instead of as an XLA multiply on the full tensor.
    top = jnp.where(tt == 0, jnp.zeros_like(strip[0]), strip[0])
    bot = jnp.where(tt == nblk - 1, jnp.zeros_like(strip[TH + 1]),
                    strip[TH + 1])
    strip = jnp.concatenate([top[None], strip[1:TH + 1], bot[None]], axis=0)

    wf = wf_ref[...]

    def dot_row(r):
        # [Wc, B, C4] · [C4, 9·cout] → [Wc, B, 9·cout] f32 — Mosaic runs
        # this as a [Wc·B, C4] matmul (B is the sublane dim; merging the
        # leading dims is layout-free)
        return jax.lax.dot_general(
            strip[r], wf,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    bias = b_ref[...].astype(jnp.float32)       # [1, cout]
    zrow = jnp.zeros((1, b, cout), jnp.float32)
    # dead column nw reaches output column wout-1 through its dx=2 tap —
    # the s=0 packed column gate, as one [W,1,1] mask on the f32 tap slab
    mcol = (jax.lax.broadcasted_iota(jnp.int32, (wout, 1, 1), 0)
            != wout - 1).astype(jnp.float32)
    # rolling 3-slab window: slab y is dead after output row y, keeping
    # ≤4 of the [Wc, B, 9·cout] f32 slabs (4.9 MB each) live at once
    p0, p1 = dot_row(0), dot_row(1)
    for y in range(TH):
        p2 = dot_row(y + 2)
        tdx = []
        for dx in range(3):
            acc = (p0[:, :, dx * cout:(dx + 1) * cout]
                   + p1[:, :, (3 + dx) * cout:(4 + dx) * cout]
                   + p2[:, :, (6 + dx) * cout:(7 + dx) * cout])
            tdx.append(acc)
        pre = (jnp.concatenate([zrow, tdx[0][:wout - 1]], axis=0)
               + tdx[1][:wout] + tdx[2][1:wout + 1] * mcol) + bias[None]
        # [W, B, cout] → [B, W, cout]: the only relayout in the chain,
        # done in-VMEM on the bf16 row (0.26 MB)
        out_ref[y] = jnp.swapaxes(pre.astype(out_ref.dtype), 0, 1)
        p0, p1 = p1, p2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5))
def head_dot(g4_hwnc, w64, b64, wout=None, pre_bias=None, slope=0.2):
    """Folded+embedded head conv from an HWNC-emitted g4.

    g4_hwnc: [Hp, Wc, B, C4] (the packed tensor in conv-natural bytes,
    UNGATED — the s=0 edge gate is applied inside); w64: [3,3,C4,Cout];
    b64: [Cout]; ``wout``: logical output width (defaults to Hp-1, the
    square case). ``pre_bias`` [C4]: when given, g4 is the producer
    conv's RAW output and its bias + leaky_relu(``slope``) epilogue runs
    inside the kernel (bit-identical same-dtype math) instead of as a
    separate whole-tensor XLA pass. Returns [Hp-1, B, wout, Cout] (HBWC —
    what ``output_stage_x8(order="hbwc")`` consumes with untiled-dim
    block slices). Uses the Pallas kernel on TPU for supported shapes,
    the jnp twin otherwise.
    """
    return _forward(g4_hwnc, w64, b64, pre_bias, wout, slope)


def _forward(g4_hwnc, w64, b64, pre_bias=None, wout=None, slope=0.2,
             interpret=False):
    hp, wc, b, c4 = g4_hwnc.shape
    cout = w64.shape[3]
    h = hp - 1
    if wout is None:
        wout = h
    if not interpret and (jax.default_backend() != "tpu"
                          or not head_dot_supported(
                              g4_hwnc.shape, cout, wout,
                              jnp.dtype(g4_hwnc.dtype).itemsize)):
        return head_dot_reference(g4_hwnc, w64, b64, wout, pre_bias, slope)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nblk = h // TH
    wf = stack_head_taps(w64).astype(g4_hwnc.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((c4, 9 * cout), lambda tt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda tt: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [g4_hwnc, wf, b64.reshape(1, cout).astype(jnp.float32)]
    if pre_bias is not None:
        in_specs.append(pl.BlockSpec((1, c4), lambda tt: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(pre_bias.reshape(1, c4).astype(g4_hwnc.dtype))
    return pl.pallas_call(
        functools.partial(_kernel, hp=hp, wc=wc, b=b, c4=c4, cout=cout,
                          nblk=nblk, wout=wout, slope=slope),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TH, b, wout, cout), lambda tt: (tt, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, b, wout, cout), g4_hwnc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, wc, b, c4), g4_hwnc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # double-buffered all-batch halo scratch (43 MB at the
            # flagship shape) + the rolling f32 tap slabs (~20 MB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _fwd(g4_hwnc, w64, b64, wout=None, pre_bias=None, slope=0.2):
    return (_forward(g4_hwnc, w64, b64, pre_bias, wout, slope),
            (g4_hwnc, w64, b64, pre_bias))


def _bwd(wout, slope, res, g):
    g4_hwnc, w64, b64, pre_bias = res
    if pre_bias is None:
        _, vjp = jax.vjp(
            lambda a, w, c: head_dot_reference(a, w, c, wout),
            g4_hwnc, w64, b64)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda a, w, c, p: head_dot_reference(a, w, c, wout, p, slope),
        g4_hwnc, w64, b64, pre_bias)
    return vjp(g)


head_dot.defvjp(_fwd, _bwd)
