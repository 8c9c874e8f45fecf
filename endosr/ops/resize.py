"""MATLAB-conformant bicubic resize, TPU-first.

Reproduces the numerics of MATLAB ``imresize`` (bicubic kernel with
antialiasing on downscale) as used by the reference data pipeline
(``/root/reference/codes/data/util.py:258-458``) — but instead of the
reference's per-row gather loops, the resample is expressed as two dense
matrix multiplies ``M_H @ img @ M_W.T`` so XLA maps it straight onto the MXU.
Symmetric boundary handling is folded into the matrices, so no physical
padding of the image is needed.

Also provides the interpolation modes the reference uses elsewhere:
  * ``interpolate_nearest``  — torch ``F.interpolate(mode='nearest')``
  * ``interpolate_bilinear`` — torch bilinear with ``align_corners`` both ways
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "imresize",
    "imresize_np",
    "resize_matrix",
    "interpolate_nearest",
    "interpolate_bilinear",
]


def _cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB's bicubic interpolation kernel (a = -0.5)."""
    absx = np.abs(x)
    absx2 = absx ** 2
    absx3 = absx ** 3
    f1 = (1.5 * absx3 - 2.5 * absx2 + 1.0) * (absx <= 1)
    f2 = (-0.5 * absx3 + 2.5 * absx2 - 4.0 * absx + 2.0) * ((absx > 1) & (absx <= 2))
    return f1 + f2


@functools.lru_cache(maxsize=256)
def resize_matrix(in_length: int, out_length: int, scale: float,
                  antialiasing: bool = True) -> np.ndarray:
    """Dense (out_length, in_length) resample matrix for one axis.

    Matches MATLAB/reference ``calculate_weights_indices`` semantics
    (including weight-row normalization, the zero-column trim, and symmetric
    boundary extension), with the boundary reflection folded into the matrix
    columns so that ``out = M @ in`` for a signal of length ``in_length``.
    """
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    # Trim all-zero first/last columns (mirrors the reference's narrow()).
    weights_zero_tmp = np.sum(weights == 0, axis=0)
    if not math.isclose(float(weights_zero_tmp[0]), 0, rel_tol=1e-6):
        indices = indices[:, 1:p - 1]
        weights = weights[:, 1:p - 1]
    if not math.isclose(float(weights_zero_tmp[-1]), 0, rel_tol=1e-6):
        indices = indices[:, 0:p - 2]
        weights = weights[:, 0:p - 2]

    # Fold symmetric boundary extension into a dense (out, in) matrix.
    idx = indices.astype(np.int64) - 1  # 0-based source index, may be out of range
    # Symmetric reflection (edge-inclusive): ..., 1, 0 | 0, 1, ..., n-1 | n-1, n-2, ...
    idx_reflected = idx.copy()
    neg = idx_reflected < 0
    idx_reflected[neg] = -idx_reflected[neg] - 1
    over = idx_reflected >= in_length
    idx_reflected[over] = 2 * in_length - 1 - idx_reflected[over]
    # One reflection is enough for every supported scale (kernel ≤ in_length);
    # clip defensively for degenerate tiny inputs.
    idx_reflected = np.clip(idx_reflected, 0, in_length - 1)

    mat = np.zeros((out_length, in_length), dtype=np.float64)
    rows = np.repeat(np.arange(out_length), idx_reflected.shape[1])
    np.add.at(mat, (rows, idx_reflected.ravel()), weights.ravel())
    return mat.astype(np.float32)


def _out_len(n: int, scale: float) -> int:
    return int(math.ceil(n * scale))


def imresize(img: jax.Array, scale: float, antialiasing: bool = True) -> jax.Array:
    """MATLAB-bicubic resize of an HWC (or HW) JAX array in [0, 1].

    Two MXU matmuls; differentiable and jittable for a fixed shape/scale.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    in_h, in_w = img.shape[0], img.shape[1]
    m_h = jnp.asarray(resize_matrix(in_h, _out_len(in_h, scale), scale, antialiasing))
    m_w = jnp.asarray(resize_matrix(in_w, _out_len(in_w, scale), scale, antialiasing))
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,hwc->owc", m_h, img.astype(jnp.float32), precision=hi)
    out = jnp.einsum("pw,owc->opc", m_w, out, precision=hi)
    return out[..., 0] if squeeze else out


def imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """Numpy twin of :func:`imresize` for the host-side data pipeline.

    Input/output: HWC (or HW) float array, same value convention as the
    reference ``imresize_np`` (``data/util.py:391-458``).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    in_h, in_w = img.shape[0], img.shape[1]
    m_h = resize_matrix(in_h, _out_len(in_h, scale), scale, antialiasing)
    m_w = resize_matrix(in_w, _out_len(in_w, scale), scale, antialiasing)
    out = np.einsum("oh,hwc->owc", m_h, img.astype(np.float32))
    out = np.einsum("pw,owc->opc", m_w, out)
    out = out.astype(np.float32)
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# torch-style interpolation (used by SEAN / mask losses / datasets)
# ---------------------------------------------------------------------------


def _nearest_index(out_len: int, in_len: int) -> np.ndarray:
    # torch F.interpolate(mode='nearest'): src = floor(dst * in/out)
    return np.minimum(
        (np.arange(out_len, dtype=np.float64) * (in_len / out_len)).astype(np.int64),
        in_len - 1,
    )


def interpolate_nearest(x: jax.Array, size: tuple[int, int],
                        channel_last: bool = True) -> jax.Array:
    """torch ``F.interpolate(x, size, mode='nearest')`` for NHWC (default) arrays."""
    h_axis, w_axis = (1, 2) if channel_last else (x.ndim - 2, x.ndim - 1)
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = size
    if (in_h, in_w) == (out_h, out_w):
        return x
    hi = jnp.asarray(_nearest_index(out_h, in_h))
    wi = jnp.asarray(_nearest_index(out_w, in_w))
    x = jnp.take(x, hi, axis=h_axis)
    x = jnp.take(x, wi, axis=w_axis)
    return x


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(in_len: int, out_len: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D torch-bilinear interpolation matrix (out_len, in_len)."""
    mat = np.zeros((out_len, in_len), dtype=np.float32)
    if out_len == 1:
        # torch: single output sample takes src coord 0 (align) / center (not align)
        if align_corners or in_len == 1:
            mat[0, 0] = 1.0
            return mat
        src = np.array([0.5 * in_len - 0.5])
    elif align_corners:
        src = np.arange(out_len, dtype=np.float64) * (in_len - 1) / (out_len - 1)
    else:
        src = (np.arange(out_len, dtype=np.float64) + 0.5) * (in_len / out_len) - 0.5
        src = np.clip(src, 0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_len)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat


def interpolate_bilinear(x: jax.Array, size: tuple[int, int],
                         align_corners: bool = False,
                         channel_last: bool = True) -> jax.Array:
    """torch ``F.interpolate(x, size, mode='bilinear')`` for NHWC (default) arrays."""
    h_axis, w_axis = (1, 2) if channel_last else (x.ndim - 2, x.ndim - 1)
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = size
    if (in_h, in_w) == (out_h, out_w):
        return x
    m_h = jnp.asarray(_bilinear_matrix(in_h, out_h, align_corners))
    m_w = jnp.asarray(_bilinear_matrix(in_w, out_w, align_corners))
    x = jnp.moveaxis(x, (h_axis, w_axis), (0, 1))
    orig_dtype = x.dtype
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,hw...->ow...", m_h, x.astype(jnp.float32), precision=hi)
    y = jnp.einsum("pw,ow...->op...", m_w, y, precision=hi)
    return jnp.moveaxis(y.astype(orig_dtype), (0, 1), (h_axis, w_axis))
