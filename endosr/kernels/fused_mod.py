"""Fused SEAN modulation kernel (Pallas, TPU).

Computes the final blended modulation map for all N trunk SEAN instances in
one pass over the depth map and mask stack:

    out[b,h,w, n·2C+c] = α_n[c]·(shifted_mask @ v'_n)           (style branch)
                       + conv3x3(relu(conv3x3(d; wm_n)+bm_n); w2'_n)  (o-branch)
                       + bias_n[c]

where the α blend and all four bias terms are pre-folded into the operands
(see ``endosr/nn/sean.py::hoisted_blended_mods``): v' = α·v, w2' = (1−α)·w2,
bias = α·b_s + (1−α)·b_o. Reference math being fused:
``codes/models/modules/normalization.py:37-42,61,73-92``.

Why a kernel: XLA evaluates the two branches as separate whole-tensor ops —
the o-branch activation (conv1 output) and the style product each make a
full [B,H,W,N·2C] HBM round-trip before the blend. Here conv1, relu, conv2,
the style matmul, the blend and the biases all happen per VMEM tile; only
the blended output touches HBM (≈3× less traffic at the flagship shape).

Grid: (N, B, H/TH). Per program the whole depth map / mask image sits in
VMEM (≈0.4 MB at 128²); conv2 runs as 9 shifted [TH·W,2C]×[2C,2C] MXU
matmuls with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_modulation", "fused_modulation_reference",
           "fused_modulation_supported"]

TH = 16  # output rows per program


def fused_modulation_reference(d, mask, wm, bm, w2, v, bias, out_dtype=None):
    """jnp twin of the kernel (same operands, same math, XLA lowering).

    d: [B,H,W,1]; mask: [B,H,W,K]; wm: [N,9,2C]; bm: [N,2C];
    w2: [N,9·2C,2C]; v: [B,N,9K,2C]; bias: [N,2C] → [B,H,W,N·2C].
    """
    n, _, c2 = wm.shape
    b, h, w, k = mask.shape
    dt = out_dtype or d.dtype

    dp = jnp.pad(d[..., 0], ((0, 0), (1, 1), (1, 1)))
    d9 = jnp.stack(
        [dp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-1)  # [B,H,W,9]
    actv = jax.nn.relu(
        jnp.einsum("bhwt,ntc->bhwnc", d9, wm) + bm[None, None, None])
    ap = jnp.pad(actv, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    a9 = jnp.concatenate(
        [ap[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-1)  # [B,H,W,N,9·2C]
    o_branch = jnp.einsum("bhwnj,njc->bhwnc", a9, w2)

    mp = jnp.pad(mask, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifted = jnp.concatenate(
        [mp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)],
        axis=-1)  # [B,H,W,9K]
    style = jnp.einsum("bhwj,bnjc->bhwnc", shifted, v)

    out = o_branch + style + bias[None, None, None]
    return out.reshape(b, h, w, n * c2).astype(dt)


def fused_modulation_supported(h, w) -> bool:
    # host-side padding supplies the halo, so any TH-multiple height works
    return h % TH == 0 and w % 8 == 0


def _kernel(d_ref, mask_ref, wm_ref, bm_ref, wv_ref, bias_ref,
            out_ref, col_ref):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    th = out_ref.shape[1]
    wdt = wm_ref.dtype
    hh = d_ref.shape[1] - 2  # inputs are host-padded to the actv halo grid
    ww = out_ref.shape[2]
    k = mask_ref.shape[3]
    c2 = out_ref.shape[3]
    y0 = pl.program_id(2) * th

    taps = [(a, b) for a in range(3) for b in range(3)]

    # ---- o-branch conv1 on a (th+2)×(W+2) halo window -------------------
    # the host passes the 9-tap shift stack of the depth map (tiny), so
    # conv1 is one [M,9]×[9,2C] MXU matmul instead of 9 VPU outer products
    win9 = d_ref[0, pl.ds(y0, th + 2), :, :]  # [th+2, W+2, 9]
    acc1 = jax.lax.dot_general(
        win9.reshape((th + 2) * (ww + 2), 9).astype(wdt), wm_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(th + 2, ww + 2, c2)
    actv = jnp.maximum(acc1 + bm_ref[0, 0].astype(jnp.float32), 0.0)
    # positions outside the image are conv2's zero padding, not relu(bm)
    rows = y0 - 1 + lax.broadcasted_iota(jnp.int32, actv.shape, 0)
    cols = lax.broadcasted_iota(jnp.int32, actv.shape, 1) - 1
    valid = (rows >= 0) & (rows < hh) & (cols >= 0) & (cols < ww)
    actv = jnp.where(valid, actv, 0.0).astype(wdt)

    # ---- assemble the full im2col row block in VMEM scratch -------------
    # conv2's 9 activation taps and the 9 shifted mask slabs form ONE
    # [th·W, 9·2C+9K] operand, so the whole modulation is a single deep-K
    # MXU matmul per tile (9 separate K=128/K=10 dots run the MXU at half
    # throughput or worse)
    mwin = mask_ref[0, pl.ds(y0, th + 2), :, :]
    for t, (dy, dx) in enumerate(taps):
        slab = actv[dy:dy + th, dx:dx + ww, :]
        col_ref[:, t * c2:(t + 1) * c2] = slab.reshape(th * ww, c2)
        mslab = mwin[dy:dy + th, dx:dx + ww, :].astype(wdt)
        col_ref[:, 9 * c2 + t * k:9 * c2 + (t + 1) * k] = (
            mslab.reshape(th * ww, k))

    acc = jax.lax.dot_general(
        col_ref[:, :], wv_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += bias_ref[0, 0].astype(jnp.float32)
    out_ref[0, :, :, :] = acc.reshape(th, ww, c2).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_modulation(d, mask, wm, bm, w2, v, bias, out_dtype=None):
    """Pallas forward; gradients fall back to the jnp twin's VJP."""
    return _pallas_forward(d, mask, wm, bm, w2, v, bias, out_dtype)


def _pallas_forward(d, mask, wm, bm, w2, v, bias, out_dtype=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, k = mask.shape
    n, _, c2 = wm.shape
    dt = out_dtype or d.dtype
    assert fused_modulation_supported(h, w), (h, w)

    # concatenated deep-K weights: [B, N, 9·2C + 9K, 2C]
    wv = jnp.concatenate(
        [jnp.broadcast_to(w2[None], (b, n, 9 * c2, c2)), v], axis=2)

    interpret = jax.default_backend() != "tpu"
    grid = (n, b, h // TH)
    kd = 9 * c2 + 9 * k
    call = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, 9), lambda g, bb, hh: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2, w + 2, k), lambda g, bb, hh: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, c2), lambda g, bb, hh: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda g, bb, hh: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kd, c2), lambda g, bb, hh: (bb, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda g, bb, hh: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, w, c2),
                               lambda g, bb, hh: (bb, hh, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n * c2), dt),
        scratch_shapes=[pltpu.VMEM((TH * w, kd), wm.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    # 9-tap shift stack of the depth map on the actv halo grid:
    # d9[r, c, (dy,dx)] = d[(r-1)+dy-1, (c-1)+dx-1], zero outside
    dp = jnp.pad(d[..., 0], ((0, 0), (2, 2), (2, 2)))
    d9 = jnp.stack(
        [dp[:, dy:dy + h + 2, dx:dx + w + 2] for dy in range(3)
         for dx in range(3)], axis=-1)
    return call(
        d9,
        jnp.pad(mask, ((0, 0), (1, 1), (1, 1), (0, 0))),
        wm, bm[:, None, :], wv, bias[:, None, :])


def _fwd(d, mask, wm, bm, w2, v, bias, out_dtype):
    out = _pallas_forward(d, mask, wm, bm, w2, v, bias, out_dtype)
    return out, (d, mask, wm, bm, w2, v, bias)


def _bwd(out_dtype, res, g):
    _, vjp = jax.vjp(
        lambda *a: fused_modulation_reference(*a, out_dtype=out_dtype), *res)
    return vjp(g)


fused_modulation.defvjp(_fwd, _bwd)
