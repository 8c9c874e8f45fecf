"""Pallas one-pass InstanceNorm statistics: (sum, sum-of-squares) per (B, C).

The flagship trunk's 26 InstanceNorms each reduce a [B,128,128,64] bf16
activation; XLA emits two separate ``convert_reduce`` passes per norm
(mean, then E[x²]) which together measured 6.1 ms/step at the flagship ×8
shape — the single largest non-matmul cost. This kernel accumulates both
moments in fp32 in one read of x.

Reference semantics: torch ``InstanceNorm2d`` biased statistics
(/root/reference/codes/models/modules/sftmd_arch.py SEAN/IN usage); the
caller (endosr.nn.layers.instance_norm) turns (sum, sumsq) into
mean / biased var exactly as before.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, s_ref, q_ref):
    i = pl.program_id(0)
    v = x_ref[...].astype(jnp.float32)  # [B, hblk, W, C]
    s = jnp.sum(v, axis=(1, 2))
    q = jnp.sum(v * v, axis=(1, 2))

    @pl.when(i == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    s_ref[...] += s
    q_ref[...] += q


def in_stats_pallas(x: jax.Array, hblk: int = 16) -> tuple[jax.Array, jax.Array]:
    """One-pass (sum, sumsq) over spatial dims of NHWC ``x``, fp32 accum.

    Falls back to XLA reductions when the shape doesn't tile (H % hblk != 0)
    or on non-TPU backends where the two-pass cost doesn't exist.
    """
    b, h, w, c = x.shape
    if h % hblk or jax.default_backend() not in ("tpu", "axon"):
        x32 = x.astype(jnp.float32)
        return jnp.sum(x32, axis=(1, 2)), jnp.sum(x32 * x32, axis=(1, 2))
    f = pl.pallas_call(
        _stats_kernel,
        grid=(h // hblk,),
        in_specs=[pl.BlockSpec((b, hblk, w, c), lambda i: (0, i, 0, 0))],
        out_specs=[
            pl.BlockSpec((b, c), lambda i: (0, 0)),
            pl.BlockSpec((b, c), lambda i: (0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32)] * 2,
    )
    return tuple(f(x))
