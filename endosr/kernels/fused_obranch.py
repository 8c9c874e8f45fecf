"""Fused SEAN depth-map branch (o-branch) kernel — Pallas, TPU.

Evaluates every trunk SEAN instance's depth-map modulation branch

    ob[b,h,w, n·2C+c] = conv3x3(relu(conv3x3(d; wm_n) + bm_n); w2_n)[c] + b2_n[c]

in one pass over the depth map (reference math being batched:
``codes/models/modules/normalization.py:37-42,61,73-74``).

Why a kernel: the XLA lowering (``endosr/nn/sean.py::hoisted_o_branch``)
materializes the intermediate activation ``relu(conv1(d))`` —
[B,H,W,N·2C] ≈ 870 MB at the flagship shape — and writes it to HBM before
the grouped conv2 reads it back. Here conv1, the ReLU and conv2 happen per
VMEM tile: only the final modulation map touches HBM, and conv2 runs as 9
accumulating [TH·W,2C]×[2C,2C] MXU dots with fp32 accumulation.

MEASURED OUTCOME (v5e, flagship ×8 shape, bs8): 15.3 ms vs 6.3 ms for the
XLA lowering — XLA's grouped-conv schedule runs ~80% of MXU peak and hides
the intermediate's round-trip behind compute, while this kernel pays a
vector relayout for every sublane-shifted activation slice feeding the 9
tap dots. Kept (off by default, see ``DepthNet.pallas_obranch``) as a
tested, gradient-capable alternative for shapes/hardware where XLA's
grouped conv underperforms.

Unlike the retired whole-blend kernel (``fused_mod.py``), no im2col scratch
is assembled — the 9 conv2 taps are consumed as shifted slices of the
VMEM-resident activation tile, so there are no unaligned scratch writes.

Grid: (B, H/TH, N), instance innermost — the depth-map tap stack for a row
tile stays VMEM-resident across all N instances. Weight blocks are keyed by
the instance index and double-buffered by the Pallas pipeline (294 KB vs
~6 µs of MXU work per program: fully overlapped).

Gradients fall back to the jnp twin's VJP, so the kernel is usable in
training as well as inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_o_branch", "fused_o_branch_reference",
           "fused_o_branch_supported"]

TH = 32  # output rows per program


def fused_o_branch_reference(d, wm, bm, w2, b2, out_dtype=None):
    """jnp twin of the kernel (same operands, same math, XLA lowering).

    d: [B,H,W,1]; wm: [N,9,2C]; bm: [N,2C]; w2: [N,9,2C,2C]; b2: [N,2C]
    → [B,H,W,N·2C] (instance-major channel order).
    """
    n, _, c2 = wm.shape
    b, h, w = d.shape[:3]
    dt = out_dtype or d.dtype

    dp = jnp.pad(d[..., 0], ((0, 0), (1, 1), (1, 1)))
    d9 = jnp.stack(
        [dp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-1)  # [B,H,W,9]
    actv = jax.nn.relu(
        jnp.einsum("bhwt,ntc->bhwnc", d9, wm) + bm[None, None, None]
    ).astype(dt)
    ap = jnp.pad(actv, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    a9 = jnp.stack(
        [ap[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-2)  # [B,H,W,N,9,2C]
    ob = jnp.einsum("bhwntj,ntjc->bhwnc", a9, w2) + b2[None, None, None]
    return ob.reshape(b, h, w, n * c2).astype(dt)


def fused_o_branch_supported(h, w, dtype) -> bool:
    # bf16 keeps the per-program VMEM footprint inside budget; W must be a
    # sublane multiple so the row-tile reshape/slices stay layout-free
    return dtype == jnp.bfloat16 and h % TH == 0 and w % 16 == 0 and w >= 128


def _kernel(d9_ref, wm_ref, bm_ref, w2_ref, b2_ref, out_ref):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    th = out_ref.shape[1]
    w = out_ref.shape[2]
    c2 = out_ref.shape[3]
    hh = th * pl.num_programs(1)
    y0 = pl.program_id(1) * th

    win9 = d9_ref[0, 0]  # [th+2, W+2, 9] — actv-grid rows y0 .. y0+th+2
    acc1 = lax.dot_general(
        win9, wm_ref[0],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [th+2, W+2, 2C]
    actv = jnp.maximum(acc1 + bm_ref[0, 0].astype(jnp.float32), 0.0)
    # halo positions outside the image are conv2 zero padding, not relu(bm)
    rows = y0 - 1 + lax.broadcasted_iota(jnp.int32, actv.shape, 0)
    cols = lax.broadcasted_iota(jnp.int32, actv.shape, 1) - 1
    valid = (rows >= 0) & (rows < hh) & (cols >= 0) & (cols < w)
    actv = jnp.where(valid, actv, 0.0).astype(win9.dtype)

    acc = None
    for t, (dy, dx) in enumerate(
            (a, b) for a in range(3) for b in range(3)):
        part = lax.dot_general(
            actv[dy:dy + th, dx:dx + w, :], w2_ref[0, t],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [th, W, 2C]
        acc = part if acc is None else acc + part
    acc = acc + b2_ref[0, 0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_o_branch(d, wm, bm, w2, b2, out_dtype=None):
    """Pallas forward; gradients fall back to the jnp twin's VJP."""
    return _pallas_forward(d, wm, bm, w2, b2, out_dtype)


def _pallas_forward(d, wm, bm, w2, b2, out_dtype=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = d.shape[:3]
    n, _, c2 = wm.shape
    dt = out_dtype or d.dtype
    assert fused_o_branch_supported(h, w, wm.dtype), (h, w, wm.dtype)

    # 9-tap shift stack of the depth map on the actv halo grid, pre-cut into
    # overlapping row tiles (Pallas blocks cannot overlap):
    # d9[r,c,(dy,dx)] = d[(r-1)+(dy-1), (c-1)+(dx-1)], zero outside.
    dp = jnp.pad(d[..., 0].astype(wm.dtype), ((0, 0), (2, 2), (2, 2)))
    d9 = jnp.stack(
        [dp[:, dy:dy + h + 2, dx:dx + w + 2] for dy in range(3)
         for dx in range(3)], axis=-1)  # [B, H+2, W+2, 9]
    tiles = h // TH
    d9t = jnp.stack(
        [d9[:, i * TH:i * TH + TH + 2] for i in range(tiles)], axis=1
    )  # [B, T, TH+2, W+2, 9]

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        _kernel,
        grid=(b, tiles, n),
        in_specs=[
            pl.BlockSpec((1, 1, TH + 2, w + 2, 9),
                         lambda bb, tt, g: (bb, tt, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, c2), lambda bb, tt, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bb, tt, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, c2, c2), lambda bb, tt, g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bb, tt, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, w, c2),
                               lambda bb, tt, g: (bb, tt, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n * c2), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call(d9t, wm, bm[:, None], w2, b2[:, None])


def _fwd(d, wm, bm, w2, b2, out_dtype):
    out = _pallas_forward(d, wm, bm, w2, b2, out_dtype)
    return out, (d, wm, bm, w2, b2)


def _bwd(out_dtype, res, g):
    _, vjp = jax.vjp(
        lambda *a: fused_o_branch_reference(*a, out_dtype=out_dtype), *res)
    return vjp(g)


fused_o_branch.defvjp(_fwd, _bwd)
