"""Core flax layers, NHWC / TPU-native.

Weight-normalized convolutions (``g · v/‖v‖`` per output channel, matching
torch ``nn.utils.weight_norm`` dim=0 semantics used throughout the reference
generator, ``sftmd_arch.py:740,851``), parameter-free instance norm with fp32
statistics, torch-exact pixel shuffle, and plain torch-initialized convs.

All modules carry a ``dtype`` compute type (bf16-friendly) while parameters
stay in ``param_dtype`` (fp32 by default) — normalization statistics are
always taken in fp32 to stay inside the 0.05 dB parity budget.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "Conv",
    "ConvTranspose",
    "WNConv",
    "WNConvTranspose",
    "WNConvParams",
    "wn_effective_kernel",
    "Dense",
    "instance_norm",
    "chained_instance_norm",
    "pixel_shuffle",
    "leaky_relu",
    "fold_kernel_through_pixel_shuffle",
    "compose_pixel_shuffle_perm",
    "packed_stage_kernel",
    "packed_gate",
    "centered_conv",
    "masked_instance_norm",
    "masked_chained_instance_norm",
    "valid_mask",
]

Dtype = Any


def _pair(v) -> tuple[int, int]:
    if isinstance(v, Sequence):
        return tuple(v)  # type: ignore[return-value]
    return (v, v)


def torch_conv_init(fan_in: int):
    """torch Conv2d default init: kaiming_uniform(a=√5) ≡ U(−1/√fan_in, 1/√fan_in)."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(x, w, strides, padding, dtype, lhs_dilation=None, groups=1):
    ph, pw = _pair(padding)
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=_pair(strides),
        padding=[(ph, ph), (pw, pw)],
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


class Conv(nn.Module):
    """Plain conv2d with torch-default init; NHWC, torch-style int padding.

    ``centered=True`` routes through :func:`centered_conv` (mean-compensated
    low-precision conv; requires stride 1, square SAME padding, no groups) —
    the bf16c serving mode for offset-carrying stream tensors.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 1
    use_bias: bool = True
    groups: int = 1
    centered: int = 0  # 0 = off; N = centered_conv passes (1 or 3)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * kh * kw
        w = self.param(
            "kernel", torch_conv_init(fan_in),
            (kh, kw, in_ch // self.groups, self.features), self.param_dtype,
        )
        b = (self.param("bias", torch_conv_init(fan_in), (self.features,),
                        self.param_dtype) if self.use_bias else None)
        if self.centered:
            assert self.groups == 1 and _pair(self.strides) == (1, 1)
            assert kh == kw and _pair(self.padding) == (kh // 2, kh // 2)
            return centered_conv(x, w, b, self.dtype,
                                 passes=int(self.centered))
        y = _conv(x, w, self.strides, self.padding, self.dtype, groups=self.groups)
        if b is not None:
            y = y + b.astype(self.dtype)
        return y


class WNConv(nn.Module):
    """Weight-normalized conv2d: w = g · v/‖v‖ (norm over kh,kw,in per out ch)."""

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw
        v = self.param(
            "v", torch_conv_init(fan_in), (kh, kw, in_ch, self.features), self.param_dtype
        )
        # g initialized to ‖v‖ so the initial effective weight equals v,
        # exactly like torch weight_norm wrapping a freshly-initialized conv.
        g = self.param(
            "g",
            lambda rng: jnp.sqrt(
                jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 1, 2))
            ).astype(self.param_dtype),
        )
        v32 = v.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v32), axis=(0, 1, 2), keepdims=True))
        w = v32 * (g.astype(jnp.float32) / norm)
        y = _conv(x, w, self.strides, self.padding, self.dtype)
        if self.use_bias:
            b = self.param("bias", torch_conv_init(fan_in), (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose(nn.Module):
    """torch-semantics ConvTranspose2d via lhs-dilated conv.

    out = (in−1)·stride − 2·padding + kernel  (output_padding = 0)

    Kernel is stored HWIO with I = input channels (torch layout transposed),
    spatially flipped at call time.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int | tuple[int, int] = 2
    padding: int | tuple[int, int] = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _kernel(self, in_ch):
        kh, kw = _pair(self.kernel_size)
        fan_in = self.features * kh * kw  # torch fan-in convention for ConvT
        return self.param(
            "kernel", torch_conv_init(fan_in), (kh, kw, in_ch, self.features), self.param_dtype
        ), fan_in

    def _apply(self, x, w, fan_in):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        sh, sw = _pair(self.strides)
        w = jnp.flip(w, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", torch_conv_init(fan_in), (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y

    @nn.compact
    def __call__(self, x):
        w, fan_in = self._kernel(x.shape[-1])
        return self._apply(x, w.astype(jnp.float32), fan_in)


class WNConvTranspose(ConvTranspose):
    """Weight-normalized ConvTranspose2d (torch dim=0 ⇒ per-INPUT-channel norm)."""

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = self.features * kh * kw
        v = self.param(
            "v", torch_conv_init(fan_in), (kh, kw, in_ch, self.features), self.param_dtype
        )
        g = self.param(
            "g",
            lambda rng: jnp.sqrt(
                jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 1, 3))
            ).astype(self.param_dtype),
        )
        v32 = v.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v32), axis=(0, 1, 3), keepdims=True))
        w = v32 * (g.astype(jnp.float32)[None, None, :, None] / norm)
        return self._apply(x, w, fan_in)


class WNConvParams:
    """Initializer producing a {'v','g','bias'} subtree identical in shape,
    layout and init distribution to a :class:`WNConv` child module's params —
    lets a parent register weight-normed conv params directly (so it can fold
    or stack the effective kernels) without changing the checkpoint tree."""

    def __init__(self, fan_in, shape, param_dtype):
        self.fan_in = fan_in
        self.shape = shape
        self.param_dtype = param_dtype

    def __call__(self, rng):
        k1, k2 = jax.random.split(rng)
        init = torch_conv_init(self.fan_in)
        v = init(k1, self.shape, self.param_dtype)
        g = jnp.sqrt(
            jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 1, 2))
        ).astype(self.param_dtype)
        return {"v": v, "g": g,
                "bias": init(k2, (self.shape[-1],), self.param_dtype)}


def wn_effective_kernel(p) -> tuple[jax.Array, jax.Array]:
    """fp32 effective kernel (g·v/‖v‖, torch dim=0) and bias from a
    {'v','g','bias'} subtree."""
    v32 = p["v"].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(v32), axis=(0, 1, 2), keepdims=True))
    return v32 * (p["g"].astype(jnp.float32) / norm), p["bias"].astype(jnp.float32)


class Dense(nn.Module):
    """torch nn.Linear-initialized dense layer."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("kernel", torch_conv_init(in_f), (in_f, self.features), self.param_dtype)
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", torch_conv_init(in_f), (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free InstanceNorm2d (NHWC): per-sample per-channel over H, W.

    Statistics in fp32 (biased variance, like torch); output in x.dtype.
    One-pass sum/sum-of-squares formulation (var = E[x²] − mean², the same
    quantity torch's native norm-stats kernels compute): a single read of x
    for the statistics instead of two — measured 39.5 → 38.1 ms on the
    flagship ×8 bf16 forward. fp32 accumulation keeps the cancellation error
    ≪ the 0.05 dB parity budget for activation-scale inputs.
    """
    import os as _os
    mode = _os.environ.get("ENDOSR_IN_STATS", "default")
    x32 = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    if mode == "variadic":
        zero = jnp.float32(0.0)
        s, sq = jax.lax.reduce(
            (x32, x32 * x32), (zero, zero),
            lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2))
        s = s[:, None, None, :]
        sq = sq[:, None, None, :]
    elif mode == "pallas":
        from endosr.kernels.in_stats import in_stats_pallas
        s, sq = in_stats_pallas(x)
        s = s[:, None, None, :]
        sq = sq[:, None, None, :]
    else:
        s = jnp.sum(x32, axis=(1, 2), keepdims=True)
        sq = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
    mean = s / n
    # clamp: cancellation can push a near-zero variance slightly negative
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def chained_instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """``instance_norm(instance_norm(x))`` with ONE statistics pass.

    The reference DGB normalizes twice back-to-back: the block applies
    ``InstanceNorm2d`` to the conv output and SEAN's param-free norm then
    re-normalizes that result (``sftmd_arch.py:808-834`` feeding the SEAN
    ``param_free_norm``). The second norm's statistics are analytic in the
    first's: mean₂ = 0 and var₂ = var/(var+eps), so

        out = (x − μ) · rsqrt(var+eps) · rsqrt(var/(var+eps) + eps)

    — identical math (fp32 agreement ~1e-6) at half the reduction traffic.
    The flagship trunk's 26 second-stats passes measured ~3 ms/step.
    """
    x32 = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    s = jnp.sum(x32, axis=(1, 2), keepdims=True)
    sq = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps) * jax.lax.rsqrt(var / (var + eps) + eps)
    return ((x32 - mean) * scale).astype(x.dtype)


def masked_instance_norm(x: jax.Array, vmask: jax.Array,
                         eps: float = 1e-5) -> jax.Array:
    """:func:`instance_norm` over the VALID region only (exact bucketed eval).

    ``vmask``: [B|1, H, W, 1] float 0/1 validity mask. Statistics use the
    masked count instead of H·W, and the output is re-zeroed outside the
    valid region (so downstream convs see exactly the zero padding the
    unpadded network would apply implicitly). With a full-ones mask this is
    :func:`instance_norm` up to fp32 reduction order.
    """
    x32 = x.astype(jnp.float32) * vmask
    n = jnp.sum(vmask, axis=(1, 2), keepdims=True)
    s = jnp.sum(x32, axis=(1, 2), keepdims=True)
    sq = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * vmask).astype(x.dtype)


def masked_chained_instance_norm(x: jax.Array, vmask: jax.Array,
                                 eps: float = 1e-5) -> jax.Array:
    """:func:`chained_instance_norm` with valid-region statistics (see
    :func:`masked_instance_norm`); output zeroed outside the valid region."""
    x32 = x.astype(jnp.float32) * vmask
    n = jnp.sum(vmask, axis=(1, 2), keepdims=True)
    s = jnp.sum(x32, axis=(1, 2), keepdims=True)
    sq = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps) * jax.lax.rsqrt(var / (var + eps) + eps)
    return ((x32 - mean) * scale * vmask).astype(x.dtype)


def valid_mask(shape_hw: tuple[int, int], hv, wv,
               dtype: Dtype = jnp.float32) -> jax.Array:
    """[1, H, W, 1] mask that is 1 on rows < ``hv`` and cols < ``wv``.

    ``hv``/``wv`` may be traced scalars — the bucketed-eval path passes the
    per-image valid extent dynamically so one compiled program serves every
    image in the bucket.
    """
    H, W = shape_hw
    r = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) < hv
    c = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) < wv
    return (r & c).astype(dtype)[None, :, :, None]


def centered_conv(x: jax.Array, w: jax.Array, b: jax.Array | None,
                  dtype: Dtype, passes: int = 1) -> jax.Array:
    """Mean-compensated low-precision conv: bf16 MXU work at fp32-centered
    accuracy. Stride 1, odd k×k kernel, SAME (k//2) zero padding, NHWC.

    The plain ``conv(x.astype(bf16), w)`` loses the small signal riding on a
    large per-channel offset: bf16 rounds x to ~2⁻⁹ RELATIVE error, so a
    channel at mean m with variation σ ≪ m keeps only σ/(m·2⁻⁹) of its
    signal — the regime that breaks the ×2/×3 full-bf16 serving path (see
    tests/test_bf16_quality.py). Here the conv is split linearly:

        conv(x) = conv(x − m) + conv(m·1)

    with m the per-(sample, in-channel) spatial mean. The first term is the
    bf16 conv of CENTERED data (rounding now relative to σ, fp32
    accumulation via preferred_element_type); the second is the conv of a
    spatially-constant image, computed EXACTLY in fp32 at O(k²·C_in·C_out):
    away from borders it is m·Σ_taps w, and within the p-pixel border ring
    only a contiguous tap range is valid, giving (2p+1)² distinct cases
    materialized from two cumulative sums of the kernel.

    ``passes`` raises the centered term's arithmetic accuracy by operand
    splitting (each extra pass is one more bf16 MXU dot, fp32-accumulated):
      1 — d_hi·w_hi                      (~2⁻⁹ per conv; ×2/×3 proxy 43.9 dB)
      2 — + d_lo·w_hi  (activation split; 46.3 dB)
      3 — + d_hi·w_lo  (both operands split, the bf16x3 / "HIGH" scheme
          with exact mean compensation on top; 55.9/53.7 dB at ×2/×3 —
          past the ≥50 dB certification bar, tests/test_bf16_quality.py)

    Returns fp32 (the callers feed InstanceNorm / residual streams that
    stay fp32 in this mode). Falls back to a plain fp32 conv when the
    spatial extent is too small for the border-case table (H or W < k).
    """
    k = int(w.shape[0])
    p = k // 2
    H, W = x.shape[1], x.shape[2]
    if dtype == jnp.float32 or H < k or W < k:
        y = _conv(x.astype(jnp.float32), w.astype(jnp.float32), 1, p,
                  jnp.float32)
        return y if b is None else y + b.astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=(1, 2))  # [B, Cin]
    d32 = x32 - m[:, None, None, :]

    def bconv(a, ww):
        return jax.lax.conv_general_dilated(
            a, ww, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    d_hi = d32.astype(dtype)
    w_hi = w.astype(dtype)
    y = bconv(d_hi, w_hi)
    if passes >= 2:
        d_lo = (d32 - d_hi.astype(jnp.float32)).astype(dtype)
        y = y + bconv(d_lo, w_hi)
    if passes >= 3:
        w_lo = (w.astype(jnp.float32) - w_hi.astype(jnp.float32)).astype(dtype)
        y = y + bconv(d_hi, w_lo)

    # exact fp32 conv of the constant image m·1: output row y uses tap rows
    # t with 0 ≤ y+t−p < H → a contiguous range; 2p+1 distinct row cases
    # (p top rows, interior, p bottom rows), same for columns.
    w32 = w.astype(jnp.float32)
    cs_r = jnp.cumsum(jnp.pad(w32, ((1, 0), (0, 0), (0, 0), (0, 0))), axis=0)
    # row-case c (0..2p): top rows use taps [p−c, k), interior all,
    # bottom row H−1−c' uses taps [0, 2p−c']
    rows = [cs_r[k] - cs_r[p - c] for c in range(p)]
    rows.append(cs_r[k] - cs_r[0])
    rows += [cs_r[2 * p - c] - cs_r[0] for c in range(p)]
    S_r = jnp.stack(rows)  # [2p+1, k, Cin, Cout] summed over rows
    cs_c = jnp.cumsum(jnp.pad(S_r, ((0, 0), (1, 0), (0, 0), (0, 0))), axis=1)
    cols = [cs_c[:, k] - cs_c[:, p - c] for c in range(p)]
    cols.append(cs_c[:, k] - cs_c[:, 0])
    cols += [cs_c[:, 2 * p - c] - cs_c[:, 0] for c in range(p)]
    S = jnp.stack(cols, axis=1)  # [2p+1, 2p+1, Cin, Cout]

    v = jnp.einsum("bi,rcio->brco", m, S)  # [B, 2p+1, 2p+1, Cout]
    ridx = np.full(H, p, np.int32)
    ridx[:p] = np.arange(p)
    ridx[H - p:] = np.arange(p + 1, 2 * p + 1)
    cidx = np.full(W, p, np.int32)
    cidx[:p] = np.arange(p)
    cidx[W - p:] = np.arange(p + 1, 2 * p + 1)
    corr = v[:, ridx][:, :, cidx]  # [B, H, W, Cout]

    y = y + corr
    return y if b is None else y + b.astype(jnp.float32)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch nn.PixelShuffle for NHWC: [B,H,W,C·r²] → [B,H·r,W·r,C].

    Channel unpacking order matches torch's NCHW semantics
    (in-channel index = c·r² + i·r + j) so ported checkpoints line up.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    # max(x, s·x) ≡ leaky-relu for 0 ≤ s < 1; a single VPU max fuses into
    # neighboring ops more readily than compare+select
    return jnp.maximum(x, x * negative_slope)


def fold_kernel_through_pixel_shuffle(w: jax.Array, r: int) -> jax.Array:
    """Rewrite a k×k conv that runs AFTER PixelShuffle(r) as an equivalent
    conv BEFORE the shuffle.

    For ``y = conv_k(pixel_shuffle(x, r))`` (SAME padding, odd k), returns
    ``w'`` with ``y = pixel_shuffle(conv(x, w', pad=t//2), r)`` where the
    new kernel has ``t = 2·ceil((k//2)/r) + 1`` taps, ``C_in·r²`` input and
    ``C_out·r²`` output channels. Exact math — only the summation order
    changes — but the conv now runs at 1/r² the positions with r²× the
    channels: dramatically better MXU utilization for few-channel heads
    (the flagship's 9×9 1024² output conv drops ~8× in wall time).

    w: [k, k, C_in, C_out] (HWIO); pixel_shuffle phase convention matches
    :func:`pixel_shuffle` (in-channel index = c·r² + i·r + j).
    """
    k = w.shape[0]
    assert w.shape[1] == k and k % 2 == 1
    c_in, c_out = w.shape[2], w.shape[3]
    pad = k // 2
    half = -(-pad // r)  # ceil
    t = 2 * half + 1

    # One vectorized scatter over all (phase, tap) combinations — the
    # index tuples are distinct, so a single .add carries no collisions.
    i, j, dy, dx = np.meshgrid(
        np.arange(r), np.arange(r),
        np.arange(-pad, pad + 1), np.arange(-pad, pad + 1), indexing="ij",
    )
    i, j, dy, dx = (a.ravel() for a in (i, j, dy, dx))
    u = (i + dy) // r + half
    v = (j + dx) // r + half
    pq = (i + dy) % r * r + (j + dx) % r
    ij = i * r + j
    # layout [t,t,C,r²,O,r²] so the reshape yields c·r²+pq / o·r²+ij
    w6 = jnp.zeros((t, t, c_in, r * r, c_out, r * r), w.dtype)
    w6 = w6.at[u, v, :, pq, :, ij].add(w[dy + pad, dx + pad])
    return w6.reshape(t, t, c_in * r * r, c_out * r * r)


def packed_stage_kernel(w: jax.Array, s_in: int, s_out: int,
                        in_interleaved: bool = False) -> jax.Array:
    """Phase-packed lowering of a 3×3 SAME conv on a PS(2)-pending grid.

    The fine grid (2N²) is represented as a PACKED tensor G[B, N+1, N+1, 4C]
    where channel group (a, b) holds the fine-phase-(a,b) map shifted by
    ``s``: ``G[Y, X, (a,b)] = fine[2(Y − s·a) + a, 2(X − s·b) + b]`` (s = 1:
    "shifted" packing — the convention of DepthNet's phase-split tail; s = 0:
    unshifted). A 3×3 conv on the fine grid then lowers to ONE [2,2,4C,4C']
    conv on the packed tensor: 4/9 of the dense fold's MACs (the r=2 fold of
    a 3×3 kernel is 75% structural zeros), full-width MXU shapes, and no
    shuffle ever materializes. The (s_in, s_out) pair fixes the window:
    (0,1)/(1,0) → taps {−1,0} (pad lo=1) / {0,+1} (pad hi=1) per axis.

    ``in_interleaved``: the input is a REAL-grid tensor with torch-PS
    channel order c·4 + a·2 + b (e.g. the mid-tail PS output) instead of
    group-major packing — stage 1 of a packed chain.

    Returns [2,2,4C,4C'] with group-major (a·2+b) channel order on both
    sides (output always group-major). Exact math; see
    tests/test_depthnet_parity.py::test_packed_tail_matches_dense.
    """
    k, c_in, c_out = w.shape[0], w.shape[2], w.shape[3]
    assert k == 3 and w.shape[1] == 3
    taps = []
    for alpha in (0, 1):
        for d in (-1, 0, 1):
            a = (alpha + d) % 2
            off = -s_out * alpha + (alpha + d - a) // 2 + s_in * a
            taps.append((alpha, d, a, off))
    lo = -min(t[3] for t in taps)
    assert all(0 <= t[3] + lo <= 1 for t in taps)

    # constant 0/1 mixing tensor [u, v, gi, go, ky, kx] + ONE einsum —
    # the previous per-tap ``.at[].add`` build lowered to 36 scatter ops
    # re-executed every step (36 × 36.5 µs = 1.3 ms/step for the ×8 head
    # stage alone, round-3 profile); the einsum is one tiny dense op and
    # constant-folds entirely under a fixed-weight serving jit
    m = np.zeros((2, 2, 4, 4, 3, 3), np.float32)
    for alpha, dy, a, offy in taps:
        for beta, dx, b, offx in taps:
            m[offy + lo, offx + lo, a * 2 + b, alpha * 2 + beta,
              dy + 1, dx + 1] += 1.0
    mm = jnp.asarray(m, w.dtype)
    if in_interleaved:
        # input channel order c·4 + (a·2+b)
        w4 = jnp.einsum("uvigyx,yxcd->uvcigd", mm, w)
    else:
        # group-major input order (a·2+b)·C + c
        w4 = jnp.einsum("uvigyx,yxcd->uvicgd", mm, w)
    return w4.reshape(2, 2, 4 * c_in, 4 * c_out)


def packed_gate(n: int, c_in: int, s: int, dtype) -> tuple[jax.Array, jax.Array]:
    """(row, col) gates zeroing a packed tensor's out-of-fine-range slots.

    ``n``: true grid size (packed size n+1). s = 1: group a = 0 is invalid
    at slot n, group a = 1 at slot 0. s = 0: slot n invalid for all groups.
    Returns ([n+1, 4C], [n+1, 4C]) multiplicative masks (row uses axis 1,
    col axis 2).
    """
    y = np.arange(n + 1)
    g0 = (y != n).astype(np.float32)
    g1 = (y != 0).astype(np.float32) if s else g0
    row = np.concatenate([
        np.tile((g0 if a == 0 else g1)[:, None], (1, c_in))
        for a in (0, 0, 1, 1)
    ], axis=1)
    col = np.concatenate([
        np.tile((g0 if b == 0 else g1)[:, None], (1, c_in))
        for b in (0, 1, 0, 1)
    ], axis=1)
    return jnp.asarray(row, dtype), jnp.asarray(col, dtype)


def compose_pixel_shuffle_perm(r: int, s: int, channels: int) -> np.ndarray:
    """Channel permutation turning nested shuffles into one canonical shuffle.

    If ``real = pixel_shuffle(v, r)`` and the network then applies
    ``pixel_shuffle(·, s)``, the result equals
    ``pixel_shuffle(v[..., perm], s·r)`` with the permutation returned here
    (``channels`` = v's channel count, a multiple of (s·r)²). With r == 1 it
    is the identity.
    """
    sr = s * r
    c_true = channels // (sr * sr)
    m = np.arange(channels)
    c = m // (sr * sr)
    rem = m % (sr * sr)
    alpha, beta = rem // sr, rem % sr
    a, p = alpha // s, alpha % s
    b, q = beta // s, beta % s
    return ((c * s * s + p * s + q) * r * r + a * r + b).astype(np.int32)
