"""Geometry/loss toolkit for the monodepth2-equivalent sub-project.

Pure-JAX twins of ``codes/depth_estimation/layers.py``:
``disp_to_depth`` (:16-25), axis-angle→SE3 (:28-103), pixel→pointcloud
backprojection (:139-168), 3-D→pixel projection (:171-193), edge-aware
smoothness (:202-215), the monodepth SSIM form (:218-248) — plus a
differentiable bilinear ``grid_sample`` (torch semantics:
align_corners=False, border padding) which JAX has no builtin for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "disp_to_depth",
    "transformation_from_parameters",
    "rot_from_axisangle",
    "get_translation_matrix",
    "backproject_depth",
    "project_3d",
    "grid_sample",
    "get_smooth_loss",
    "ssim_monodepth",
]


def disp_to_depth(disp, min_depth: float = 0.1, max_depth: float = 100.0):
    """Sigmoid disparity → (scaled_disp, depth)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec: jax.Array) -> jax.Array:
    """Axis-angle [B,1,3] → rotation matrices [B,4,4] (Rodrigues)."""
    angle = jnp.linalg.norm(vec, axis=2, keepdims=True)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[:, 0, 0]
    sa = jnp.sin(angle)[:, 0, 0]
    c = 1 - ca
    x, y, z = axis[:, 0, 0], axis[:, 0, 1], axis[:, 0, 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xc, yc, zc = x * c, y * c, z * c
    xyc, yzc, zxc = x * yc, y * zc, z * xc

    b = vec.shape[0]
    zeros = jnp.zeros((b,), vec.dtype)
    ones = jnp.ones((b,), vec.dtype)
    rot = jnp.stack([
        x * xc + ca, xyc - zs, zxc + ys, zeros,
        xyc + zs, y * yc + ca, yzc - xs, zeros,
        zxc - ys, yzc + xs, z * zc + ca, zeros,
        zeros, zeros, zeros, ones,
    ], axis=-1).reshape(b, 4, 4)
    return rot


def get_translation_matrix(t: jax.Array) -> jax.Array:
    """[B,3] or [B,1,3] translation → [B,4,4]."""
    t = t.reshape(-1, 3)
    b = t.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (b, 4, 4))
    return eye.at[:, :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axis-angle, translation) → SE3 [B,4,4]; invert for source→target."""
    rot = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        rot = rot.transpose(0, 2, 1)
        t = -t
    trans = get_translation_matrix(t)
    return jnp.matmul(rot, trans) if invert else jnp.matmul(trans, rot)


def _pix_grid(height: int, width: int) -> np.ndarray:
    """Homogeneous pixel grid [3, H·W] (x, y, 1)."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    ones = np.ones_like(xx)
    return np.stack([xx.ravel(), yy.ravel(), ones.ravel()], 0).astype(np.float32)


def backproject_depth(depth: jax.Array, inv_k: jax.Array) -> jax.Array:
    """Depth [B,H,W,1] + K⁻¹ [B,4,4] → homogeneous cam points [B,4,H·W]."""
    b, h, w, _ = depth.shape
    pix = jnp.asarray(_pix_grid(h, w))  # [3, HW]
    cam = jnp.einsum("bij,jn->bin", inv_k[:, :3, :3], pix)
    cam = depth.reshape(b, 1, -1) * cam
    ones = jnp.ones((b, 1, h * w), depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points: jax.Array, k: jax.Array, t: jax.Array,
               height: int, width: int, eps: float = 1e-7) -> jax.Array:
    """Cam points [B,4,H·W] → normalized pixel coords [B,H,W,2] in [-1,1]."""
    p = jnp.matmul(k, t)[:, :3, :]
    cam = jnp.einsum("bij,bjn->bin", p, points)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    b = points.shape[0]
    pix = pix.reshape(b, 2, height, width).transpose(0, 2, 3, 1)
    pix = pix / jnp.asarray([width - 1, height - 1], pix.dtype)
    return (pix - 0.5) * 2.0


def grid_sample(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sampling, torch ``F.grid_sample(..., padding_mode='border',
    align_corners=False)`` semantics.

    img: [B,H,W,C] (NHWC); grid: [B,Ho,Wo,2] normalized (x, y) in [-1,1].
    """
    b, h, w, c = img.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5
    gx = jnp.clip(gx, 0.0, w - 1.0)  # border padding
    gy = jnp.clip(gy, 0.0, h - 1.0)

    # ONE gather of 2×2×C blocks instead of four per-tap scalar gathers
    # (TPU gathers are per-index latency-bound: bigger units, fewer indices
    # — measured 27.7 → 23.3 ms at [12,256,320,3], and the backward emits
    # one scatter instead of four). Border case folded into the weights:
    # the block start is clamped to w−2/h−2 and the fractional weight
    # shifts by the clamp amount, which reproduces the border-padding
    # value exactly (weight 1.0 lands on the edge texel).
    sx = jnp.minimum(jnp.floor(gx), w - 2.0)
    sy = jnp.minimum(jnp.floor(gy), h - 2.0)
    fx = (gx - sx)[..., None]
    fy = (gy - sy)[..., None]
    ho, wo = grid.shape[1], grid.shape[2]
    idx = jnp.stack(
        [sy.reshape(b, -1), sx.reshape(b, -1)], axis=-1
    ).astype(jnp.int32)

    def one(imgb, idxb):
        return jax.lax.gather(
            imgb, idxb,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [P, 2, 2, C]

    v = jax.vmap(one)(img, idx).reshape(b, ho, wo, 2, 2, c)
    v00, v01 = v[..., 0, 0, :], v[..., 0, 1, :]
    v10, v11 = v[..., 1, 0, :], v[..., 1, 1, :]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def get_smooth_loss(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware disparity smoothness; NHWC."""
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]),
                          axis=3, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]),
                          axis=3, keepdims=True)
    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def ssim_monodepth(x: jax.Array, y: jax.Array) -> jax.Array:
    """monodepth2's SSIM dissimilarity map: clamp((1−SSIM)/2, 0, 1); NHWC.

    3×3 average pooling over reflection-padded inputs.
    """

    def pool(t):
        t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.reduce_window(
            t, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x * x) - mu_x ** 2
    sigma_y = pool(y * y) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)
