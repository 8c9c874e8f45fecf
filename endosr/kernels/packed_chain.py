"""Fused packed-grid stage chain g1→g2→g3 (Pallas, TPU).

Both phase-packed chains of the ×8 tail run the same 3-stage prefix
(``DepthNet._packed_tail`` and the packed up1 chain — reference fine-grid
ops ``sftmd_arch.py:891-908,941-944``):

    g1 = gate₁(lrelu(x ⊛ K1 + b1))          pads (1,1)(1,1), s=1
    g2 = gate₀(relu(g1 ⊛ K2 + b2))          pads (0,1)(0,1), s=0
    g3 = gate₁(relu(g1 + g2 ⊛ K3 + b3))     pads (1,0)(1,0), s=1

with [2,2,4C,4C'] packed convs (``layers.packed_stage_kernel``) and
dead-slot border gates (``layers.packed_gate``). XLA runs each conv as a
separate op and each gate/activation as a whole-tensor fusion — at the ×8
flagship shapes the gates alone measured 0.4–0.8 ms each, several times
their bandwidth roofline, plus two full HBM round-trips for g1 and g2
(round-3 profile).

This kernel computes all three stages per row-block with g1/g2 living in
VMEM: one read of x, one write of g3, gates applied in-register.

Layout contract (the head_dot/style_blend trick): ``x`` and ``g3`` are
HWNC-logical ([H, W, B, C]) whose default {3,2,1,0} layout equals the
BHWC conv activation layout — producers/consumers convert with
``jnp.transpose`` that XLA turns into a bitcast, so no relayout copies
surround the kernel.

Numerics match the unfused stages bit-for-bit: per stage the four tap
dots accumulate in f32 (the MXU conv's internal accumulator), the sum is
cast to the storage dtype, then bias add, activation, and 0/1 gates run
in that dtype — the same op/dtype sequence XLA executes.

Gradients flow through the jnp twin's VJP. Falls back to the twin
off-TPU / on unsupported shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["packed_g123", "packed_g123_reference", "packed_g123_supported",
           "unfold_g4_phases"]

TH = 8  # g3 output rows per program


def unfold_g4_phases(g4_hwnc):
    """Interleave a phase-packed [Hg, Wg, B, 4C] HWNC tensor to the fine
    [2(Hg−1), 2(Wg−1), B, C] grid: z[2Y+a, 2X+b, :, o] = g4[Y, X, :,
    (2a+b)·C + o] (the packed-up1 dead row/col Hg−1/Wg−1 is dropped).
    The jnp twin of the kernel's in-VMEM phase read (``phases=True``)."""
    hg, wg, b, c4g = g4_hwnc.shape
    c = c4g // 4
    gv = g4_hwnc[:hg - 1, :wg - 1].reshape(hg - 1, wg - 1, b, 2, 2, c)
    return jnp.transpose(gv, (0, 3, 1, 4, 2, 5)).reshape(
        2 * (hg - 1), 2 * (wg - 1), b, c)


def _gate_vectors(n, m, c4, dtype):
    """Constant gate operands: column masks [Mp, C4] for s=1/s=0 and the
    three special row vectors [C4] (s=1 row 0, s=1 row N, ones)."""
    from endosr.nn.layers import packed_gate

    c = c4 // 4
    row1, _ = packed_gate(n, c, 1, jnp.float32)
    _, col1 = packed_gate(m, c, 1, jnp.float32)
    _, col0 = packed_gate(m, c, 0, jnp.float32)
    # row1 is [N+1, C4]: row 0 kills a=1 groups, row N kills a=0 groups
    return (jnp.asarray(col1, dtype), jnp.asarray(col0, dtype),
            jnp.asarray(row1[0], dtype).reshape(1, c4),
            jnp.asarray(row1[n], dtype).reshape(1, c4))


def packed_g123_supported(x_shape, c4, itemsize=2, c4out=None) -> bool:
    nx, mx, b, cin4 = x_shape
    mp = mx + 1
    e = 0 if c4out is None else 1          # stage-4 absorbed
    co = c4 if c4out is None else c4out
    # VMEM model: x strip (manual DMA, double-buffered) + g1/g2(/g3) row
    # buffers + out block + the f32 tap accumulators
    vmem = (2 * (TH + 3 + e) * mx * b * cin4 * itemsize   # x strips
            + (TH + 2 + e) * mp * b * c4 * itemsize       # g1 rows
            + (TH + 1 + e) * mp * b * c4 * itemsize       # g2 rows
            + e * (TH + 1) * mp * b * c4 * itemsize       # g3 rows
            + 2 * TH * mp * b * co * itemsize             # out block
            + 4 * mp * b * max(c4, co) * 4)               # f32 accum rows
    # itemsize-2 (bf16) memrefs carry a (2,1) sublane packing on the last
    # two dims — an odd b makes every b-extent strip DMA misaligned and
    # Mosaic refuses the kernel ("Slice shape ... must be aligned to
    # tiling (2)"); b=1 is exactly the model layer's dummy-init batch
    return (b <= 8 and (itemsize != 2 or b % 2 == 0)
            and cin4 % 128 == 0 and c4 % 128 == 0
            and (c4out is None or c4out % 128 == 0)
            and nx >= TH + 4 and vmem <= 90 * 1024 * 1024)


def packed_g123_reference(x_hwnc, k1, b1, k2, b2, k3, b3, k4=None,
                          b4=None, pre_act=False, pre_bias=None):
    """jnp twin: the exact unfused stages on the BHWC view. ``pre_act``:
    apply leaky_relu(0.2) to x first (the producer conv's deferred
    activation). ``pre_bias`` [C]: add the producer conv's deferred bias
    before the activation (requires ``pre_act``) — with the packed bias
    tiled identically across phase slots, the interleaved-space bias is
    phase-independent, so one per-channel vector is exact. ``k4``/``b4``:
    absorbed UNGATED stage 4 (its s=0 gate zeroes exactly the row/col the
    downstream interleave slice drops)."""
    dt = x_hwnc.dtype
    x = jnp.transpose(x_hwnc, (2, 0, 1, 3))
    if pre_bias is not None:
        x = x + pre_bias.reshape(1, 1, 1, -1).astype(dt)
    nx, mx = x.shape[1], x.shape[2]
    c4 = k1.shape[3]

    def pconv(a, k, pad, b_):
        return jax.lax.conv_general_dilated(
            a, k.astype(dt), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_.astype(dt)

    def gate(g, s):
        from endosr.nn.layers import packed_gate

        c = c4 // 4
        row, _ = packed_gate(g.shape[1] - 1, c, s, g.dtype)
        _, col = packed_gate(g.shape[2] - 1, c, s, g.dtype)
        m = row[:, None, :] * col[None, :, :]
        return g * m[None]

    lr = lambda v: jnp.maximum(v, v * jnp.asarray(0.2, dt))  # noqa: E731
    if pre_act:
        x = lr(x)
    g1 = gate(lr(pconv(x, k1, [(1, 1), (1, 1)], b1)), 1)
    g2 = gate(jax.nn.relu(pconv(g1, k2, [(0, 1), (0, 1)], b2)), 0)
    g3 = gate(jax.nn.relu(g1 + pconv(g2, k3, [(1, 0), (1, 0)], b3)), 1)
    if k4 is not None:
        g4 = lr(pconv(g3, k4, [(0, 1), (0, 1)], b4))
        return jnp.transpose(g4, (1, 2, 0, 3))
    return jnp.transpose(g3, (1, 2, 0, 3))


def _kernel(x_hbm, k1_ref, b1_ref, k2_ref, b2_ref, k3_ref, b3_ref,
            cm1_ref, cm0_ref, r10_ref, r1n_ref, *rest, nx, mx, b, cin4,
            c4, nblk, pre_act=False, has_k4=False, has_pb=False,
            phases=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    k4_ref, b4_ref = (rest.pop(0), rest.pop(0)) if has_k4 else (None, None)
    pb_ref = rest.pop(0) if has_pb else None
    if has_k4:                   # stage-4 absorbed
        out_ref, xs, g1s, g2s, g3s, sems = rest
    else:
        g3s = None
        out_ref, xs, g1s, g2s, sems = rest
    e = 0 if k4_ref is None else 1

    tt = pl.program_id(0)
    mp = mx + 1
    strip = TH + 3 + e
    # phases mode: x_hbm is the phase-packed g4 [Hg, Wg, B, 4·cin4]; the
    # strip DMA moves g4 rows (each carrying TWO fine rows in its phase
    # lanes) and xrow() interleaves in-VMEM — the XLA transpose copy this
    # replaces measured 410 µs on the 134 MB flagship tensor (copy.112,
    # round-5 profile)
    gstrip = strip // 2 + 1

    def src(st):
        return jnp.clip(st * TH - 2, 0, nx - strip)

    def start(st, slot):
        @pl.when(st < nblk)
        def _():
            if phases:
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src(st) // 2, gstrip)], xs.at[slot],
                    sems.at[slot]).start()
            else:
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src(st), strip)], xs.at[slot],
                    sems.at[slot]).start()

    slot = tt % 2

    @pl.when(tt == 0)
    def _prologue():
        start(0, 0)

    start(tt + 1, (tt + 1) % 2)
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, gstrip if phases else strip)], xs.at[slot],
        sems.at[slot]).wait()

    y0 = tt * TH
    base = src(tt)
    dt = out_ref.dtype

    k1 = k1_ref[...]
    k2 = k2_ref[...]
    k3 = k3_ref[...]
    cm1 = cm1_ref[...]          # [Mp, C4]
    cm0 = cm0_ref[...]
    ones_c = jnp.ones((c4,), dt)

    def rowmask(r, s):
        """[C4] row-gate factor for global packed row ``r``."""
        if s == 0:
            return jnp.where(r == nx, jnp.zeros((c4,), dt), ones_c)
        v = jnp.where(r == 0, r10_ref[0], ones_c)
        return jnp.where(r == nx, r1n_ref[0], v)

    def xrow(t):
        """x row ``t`` (global), zeros outside [0, nx)."""
        if phases:
            # fine row t lives in g4 row t//2, phase pair a = t mod 2:
            # z[t, 2X+bb, o] = g4[t//2, X, (2a+bb)·cin4 + o]. Assemble by
            # lane-slicing the two bb chunks for this row parity and
            # interleaving along the (untiled) column dim — stack then
            # merge of untiled leading dims is layout-free in Mosaic.
            ig = jnp.clip(t // 2 - base // 2, 0, gstrip - 1)
            grow = xs[slot, pl.ds(ig, 1)][0][:mx // 2]    # [Wg-1, B, 4C]
            a0 = (t % 2) == 0
            h0 = jnp.where(a0, grow[:, :, :cin4],
                           grow[:, :, 2 * cin4:3 * cin4])
            h1 = jnp.where(a0, grow[:, :, cin4:2 * cin4],
                           grow[:, :, 3 * cin4:])
            row = jnp.stack([h0, h1], axis=1).reshape(mx, b, cin4)
        else:
            i = jnp.clip(t - base, 0, strip - 1)
            row = xs[slot, pl.ds(i, 1)][0]
        if pb_ref is not None:  # producer conv's deferred bias
            row = row + pb_ref[...].reshape(1, 1, cin4)
        if pre_act:  # producer conv's deferred leaky_relu (lrelu(0) = 0)
            row = jnp.maximum(row, row * jnp.asarray(0.2, row.dtype))
        ok = jnp.logical_and(t >= 0, t < nx)
        return jnp.where(ok, row, jnp.zeros_like(row))

    def tapdot(row, k, pet=jnp.float32):
        # [Mx|Mp, B, Cin] · [Cin, 2·Cout] (both v-taps stacked on lanes)
        return jax.lax.dot_general(
            row, k, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=pet)

    zc = jnp.zeros((1, b, c4), jnp.float32)

    def stage1_row(r):
        """g1 global row r: taps x[r-1], x[r]; pads (1,1) on W."""
        acc = None
        for u in range(2):
            p = tapdot(xrow(r - 1 + u),
                       jnp.concatenate([k1[u, 0], k1[u, 1]], axis=1))
            pv0, pv1 = p[:, :, :c4], p[:, :, c4:]
            # out col c ← src col c-1 (v=0) and c (v=1); out width Mp
            t = (jnp.concatenate([zc, pv0], axis=0)
                 + jnp.concatenate([pv1, zc], axis=0))
            acc = t if acc is None else acc + t
        g = acc.astype(dt) + b1_ref[...]
        g = jnp.maximum(g, g * jnp.asarray(0.2, dt))
        return g * cm1[:, None, :] * rowmask(r, 1)[None, None, :]

    # g1 rows [y0-1, y0+T+1+e) into g1s (local j = r - (y0-1))
    for j in range(TH + 2 + e):
        r = y0 - 1 + j
        row = stage1_row(r)
        row = jnp.where(jnp.logical_and(r >= 0, r <= nx), row,
                        jnp.zeros_like(row))
        g1s[pl.ds(j, 1)] = row[None]

    def stage2_row(r):
        """g2 global row r: taps g1[r], g1[r+1]; pads (0,1) on W."""
        acc = None
        for u in range(2):
            j = r - (y0 - 1) + u
            src_row = g1s[pl.ds(j, 1)][0]
            # g1 row nx+1 doesn't exist: local j may exceed — guarded by
            # caller range (r ≤ y0+T-1 ⇒ j+1 ≤ T+1 in-bounds)
            p = tapdot(src_row,
                       jnp.concatenate([k2[u, 0], k2[u, 1]], axis=1))
            pv0, pv1 = p[:, :, :c4], p[:, :, c4:]
            # out col c ← src cols c (v=0), c+1 (v=1); src width Mp
            t = pv0 + jnp.concatenate([pv1[1:], zc], axis=0)
            acc = t if acc is None else acc + t
        g = jax.nn.relu(acc.astype(dt) + b2_ref[...])
        return g * cm0[:, None, :] * rowmask(r, 0)[None, None, :]

    # g2 rows [y0-1, y0+T+e) into g2s (local j = r - (y0-1))
    for j in range(TH + 1 + e):
        r = y0 - 1 + j
        row = stage2_row(r)
        row = jnp.where(jnp.logical_and(r >= 0, r <= nx), row,
                        jnp.zeros_like(row))
        g2s[pl.ds(j, 1)] = row[None]

    def stage3_row(r):
        """g3 global row r: taps g2[r-1], g2[r]; pads (1,0) on W; +g1[r]."""
        acc = None
        for u in range(2):
            j = r - 1 + u - (y0 - 1)
            p = tapdot(g2s[pl.ds(j, 1)][0],
                       jnp.concatenate([k3[u, 0], k3[u, 1]], axis=1))
            pv0, pv1 = p[:, :, :c4], p[:, :, c4:]
            # out col c ← src cols c-1 (v=0), c (v=1)
            t = jnp.concatenate([zc, pv0[:mp - 1]], axis=0) + pv1
            acc = t if acc is None else acc + t
        g1row = g1s[pl.ds(r - (y0 - 1), 1)][0]
        g = jax.nn.relu(g1row + (acc.astype(dt) + b3_ref[...]))
        return g * cm1[:, None, :] * rowmask(r, 1)[None, None, :]

    if k4_ref is None:
        # g3 rows [y0, y0+T) straight to the output
        for i in range(TH):
            out_ref[i] = stage3_row(y0 + i)
        return

    # stage-4 absorbed: g3 rows [y0, y0+T] into g3s, then the UNGATED
    # stage-4 conv + leaky_relu (pads (0,1) on W — its s=0 gate zeroes
    # exactly the slots the downstream interleave slice drops)
    for j in range(TH + 1):
        r = y0 + j
        row = stage3_row(r)
        row = jnp.where(r <= nx, row, jnp.zeros_like(row))
        g3s[pl.ds(j, 1)] = row[None]

    k4 = k4_ref[...]
    c4o = k4.shape[3]
    zco = jnp.zeros((1, b, c4o), jnp.float32)
    for i in range(TH):
        acc = None
        for u in range(2):
            p = tapdot(g3s[pl.ds(i + u, 1)][0],
                       jnp.concatenate([k4[u, 0], k4[u, 1]], axis=1))
            pv0, pv1 = p[:, :, :c4o], p[:, :, c4o:]
            # out col c ← src cols c (v=0), c+1 (v=1)
            t = pv0 + jnp.concatenate([pv1[1:], zco], axis=0)
            acc = t if acc is None else acc + t
        g = acc.astype(dt) + b4_ref[...]
        out_ref[i] = jnp.maximum(g, g * jnp.asarray(0.2, dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 11))
def packed_g123(x_hwnc, k1, b1, k2, b2, k3, b3, k4=None, b4=None,
                pre_act=False, pre_bias=None, phases=False):
    """Fused 3(+1)-stage packed chain.

    x_hwnc: [Nx, Mx, B, Cin4] (HWNC logical — the producer's conv-natural
    bytes); k1 [2,2,Cin4,C4] (stage-1 packed kernel, may be the
    ``in_interleaved`` lowering), k2/k3 [2,2,C4,C4]; b* are the
    group-tiled biases [C4]. ``pre_act``: x is the producer conv's RAW
    output and its leaky_relu(0.2) runs in-kernel. ``pre_bias`` [Cin4]:
    the producer conv's BIAS is deferred too (added before the in-kernel
    leaky_relu) — XLA ran the bias add + slice of the 134 MB producer
    output as its own 406 µs pass at the flagship shape. ``k4``/``b4``
    [2,2,C4,C4out]: absorb the UNGATED stage-4 conv + leaky_relu (its
    s=0 gate zeroes exactly the slots the downstream interleave slice
    drops). ``phases``: x_hwnc is the phase-packed PRODUCER tensor
    [Hg, Wg, B, 4·Cin] and the fine-grid interleave
    (:func:`unfold_g4_phases`) happens in-VMEM during row assembly —
    no materialized transpose copy. Returns g3 (or g4)
    [Nx+1, Mx+1, B, C4|C4out] (HWNC).
    """
    return _forward(x_hwnc, k1, b1, k2, b2, k3, b3, k4, b4, pre_act,
                    pre_bias, phases)


def _forward(x_hwnc, k1, b1, k2, b2, k3, b3, k4=None, b4=None,
             pre_act=False, pre_bias=None, phases=False, interpret=False):
    if phases:
        hg, wg, b, c4g = x_hwnc.shape
        nx, mx, cin4 = 2 * (hg - 1), 2 * (wg - 1), c4g // 4
    else:
        nx, mx, b, cin4 = x_hwnc.shape
    c4 = k1.shape[3]
    c4o = None if k4 is None else k4.shape[3]
    if not interpret and (jax.default_backend() != "tpu"
                          or not packed_g123_supported(
                              (nx, mx, b, cin4), c4,
                              jnp.dtype(x_hwnc.dtype).itemsize, c4o)):
        if not interpret and jax.default_backend() == "tpu":
            from endosr.kernels.warn import warn_kernel_drop

            warn_kernel_drop(
                "packed_g123",
                f"x shape {tuple(x_hwnc.shape)} "
                f"dtype={jnp.dtype(x_hwnc.dtype).name} fails the support "
                "gate (batch>8, channel alignment or VMEM budget): packed "
                "chain runs as unfused XLA stages")
        if phases:
            x_hwnc = unfold_g4_phases(x_hwnc)
        return packed_g123_reference(x_hwnc, k1, b1, k2, b2, k3, b3,
                                     k4, b4, pre_act, pre_bias)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = x_hwnc.dtype
    mp = mx + 1
    npk = nx + 1
    e = 0 if k4 is None else 1
    co = c4 if k4 is None else c4o
    nblk = -(-npk // TH)  # ragged: pallas masks the last block's stores
    cm1, cm0, r10, r1n = _gate_vectors(nx, mx, c4, dt)
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda tt: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        const_spec((2, 2, cin4, c4)),
        const_spec((1, c4)),
        const_spec((2, 2, c4, c4)),
        const_spec((1, c4)),
        const_spec((2, 2, c4, c4)),
        const_spec((1, c4)),
        const_spec((mp, c4)),
        const_spec((mp, c4)),
        const_spec((1, c4)),
        const_spec((1, c4)),
    ]
    args = [x_hwnc, k1.astype(dt), b1.reshape(1, c4).astype(dt),
            k2.astype(dt), b2.reshape(1, c4).astype(dt),
            k3.astype(dt), b3.reshape(1, c4).astype(dt), cm1, cm0,
            r10, r1n]
    scratch = [
        pltpu.VMEM((2, (TH + 3 + e) // 2 + 1, x_hwnc.shape[1], b, 4 * cin4)
                   if phases else (2, TH + 3 + e, mx, b, cin4), dt),
        pltpu.VMEM((TH + 2 + e, mp, b, c4), dt),
        pltpu.VMEM((TH + 1 + e, mp, b, c4), dt),
    ]
    if k4 is not None:
        in_specs += [const_spec((2, 2, c4, c4o)), const_spec((1, c4o))]
        args += [k4.astype(dt), b4.reshape(1, c4o).astype(dt)]
    if pre_bias is not None:
        in_specs.append(const_spec((1, cin4)))
        args.append(pre_bias.reshape(1, cin4).astype(dt))
    if k4 is not None:
        scratch.append(pltpu.VMEM((TH + 1, mp, b, c4), dt))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        functools.partial(_kernel, nx=nx, mx=mx, b=b, cin4=cin4, c4=c4,
                          nblk=nblk, pre_act=pre_act,
                          has_k4=k4 is not None,
                          has_pb=pre_bias is not None, phases=phases),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TH, mp, b, co), lambda tt: (tt, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npk, mp, b, co), dt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _fwd(x_hwnc, k1, b1, k2, b2, k3, b3, k4=None, b4=None, pre_act=False,
         pre_bias=None, phases=False):
    return (_forward(x_hwnc, k1, b1, k2, b2, k3, b3, k4, b4, pre_act,
                     pre_bias, phases),
            (x_hwnc, k1, b1, k2, b2, k3, b3, k4, b4, pre_bias))


def _bwd(pre_act, phases, res, g):
    x_hwnc, k1, b1, k2, b2, k3, b3, k4, b4, pre_bias = res

    def ref(x, *a, **kw):
        if phases:
            x = unfold_g4_phases(x)
        return packed_g123_reference(x, *a, **kw)

    if k4 is None and pre_bias is None:
        _, vjp = jax.vjp(
            lambda x, a1, c1, a2, c2, a3, c3: ref(
                x, a1, c1, a2, c2, a3, c3, pre_act=pre_act),
            x_hwnc, k1, b1, k2, b2, k3, b3)
        return (*vjp(g), None, None, None)
    if k4 is None:
        _, vjp = jax.vjp(
            lambda x, a1, c1, a2, c2, a3, c3, pb: ref(
                x, a1, c1, a2, c2, a3, c3, pre_act=pre_act, pre_bias=pb),
            x_hwnc, k1, b1, k2, b2, k3, b3, pre_bias)
        grads = vjp(g)
        return (*grads[:7], None, None, grads[7])
    assert pre_bias is None, "pre_bias with absorbed stage 4 is unused"
    _, vjp = jax.vjp(
        lambda x, a1, c1, a2, c2, a3, c3, a4, c4_: ref(
            x, a1, c1, a2, c2, a3, c3, a4, c4_, pre_act),
        x_hwnc, k1, b1, k2, b2, k3, b3, k4, b4)
    return (*vjp(g), None)


packed_g123.defvjp(_fwd, _bwd)
