"""Mid-tail pixel_shuffle(2) as one Pallas pass (TPU).

The ×8 flagship tail applies one real PixelShuffle(2) between the folded
upscale stages ([B,128,128,512] → [B,256,256,128]; see
``endosr/nn/depthnet.py`` fold1 path — reference op: torch ``nn.PixelShuffle``
in ``codes/models/modules/sftmd_arch.py:891-903``). XLA lowers the shuffle
as two layout copies (measured 1.2 ms at the flagship shape for 67 MB of
traffic — ~8× over HBM bandwidth, because the transpose moves the j-phase
across the lane tiling).

This kernel emits the shuffled rows directly. The channel unpack
(in-channel = c·r² + i·r + j) runs as r² one-hot selection matmuls on the
MXU (exact 0/1 weights); the (x, j) and (t, i) interleaves are non-minor
reshapes Mosaic supports natively. Output channel count C must be a lane
multiple (128) so no padded intermediate exists anywhere.

STATUS: measured on v5e at the flagship shape — WINS in isolation
(1.96 ms vs 2.58 ms XLA, input already row-major) but LOSES in-net
(full ×8 forward 35.6 → 36.0 ms): Pallas custom calls force row-major
operand layouts (jax `tpu_custom_call._avals_to_layouts`), so feeding the
producing conv's {3,0,2,1} output into the kernel inserts exactly the
relayout copy the kernel was built to remove. Kept tested and off; a win
requires layout control on custom-call operands. Gradients flow through
an exact adjoint (the op is linear).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mid_shuffle", "mid_shuffle_supported"]

TH = 8


def _mid_selector(r, c, dtype):
    """0/1 [r², C·r², C]: S[(i,j)] picks in-channel c·r²+i·r+j → column c."""
    s = np.zeros((r * r, c * r * r, c), np.float32)
    for i in range(r):
        for j in range(r):
            for cc in range(c):
                s[i * r + j, cc * r * r + i * r + j, cc] = 1.0
    return jnp.asarray(s, dtype)


def mid_shuffle_supported(h, w, c_rr, r) -> bool:
    c = c_rr // (r * r)
    return (c * r * r == c_rr and c % 128 == 0 and h % TH == 0
            and r == 2 and jax.default_backend() == "tpu")


def _kernel(z_ref, s_ref, out_ref, *, r, c):
    th, w = z_ref.shape[1], z_ref.shape[2]
    tile = z_ref[0]                              # [TH, W, C·r²]
    flat = tile.reshape(th * w, c * r * r)
    bands = []
    for i in range(r):
        cols = []
        for j in range(r):
            g = jax.lax.dot_general(
                flat, s_ref[i * r + j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(tile.dtype)                 # exact (0/1 selection)
            cols.append(g.reshape(th, w, 1, c))
        # interleave j along x: [TH, W, r, C] → [TH, W·r, C]
        band = jnp.concatenate(cols, axis=2).reshape(th, 1, w * r, c)
        bands.append(band)
    # interleave i along y: [TH, r, W·r, C] → [TH·r, W·r, C]
    out_ref[0] = jnp.concatenate(bands, axis=1).reshape(th * r, w * r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def mid_shuffle(z, r):
    """pixel_shuffle(r) for lane-multiple output channels; Pallas on TPU."""
    return _forward(z, r)


def _forward(z, r):
    from endosr.nn.layers import pixel_shuffle

    b, h, w, c_rr = z.shape
    if not mid_shuffle_supported(h, w, c_rr, r):
        return pixel_shuffle(z, r)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = c_rr // (r * r)
    return pl.pallas_call(
        functools.partial(_kernel, r=r, c=c),
        grid=(b, h // TH),
        in_specs=[
            pl.BlockSpec((1, TH, w, c_rr), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r * r, c_rr, c), lambda bb, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH * r, w * r, c),
                               lambda bb, hh: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w * r, c), z.dtype),
    )(z, _mid_selector(r, c, z.dtype))


def _fwd(z, r):
    return _forward(z, r), z.shape


def _bwd(r, shape, g):
    # adjoint of pixel_shuffle = pixel_unshuffle with matching channel order
    b, h, w, c_rr = shape
    c = c_rr // (r * r)
    gz = g.reshape(b, h, r, w, r, c).transpose(0, 1, 3, 5, 2, 4)
    return (gz.reshape(b, h, w, c_rr),)


mid_shuffle.defvjp(_fwd, _bwd)
