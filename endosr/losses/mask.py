"""Depth-mask losses — including the paper's dynamic depth-aware loss.

Twins of ``codes/models/modules/mask_loss.py``:

* :func:`mask_loss` — one randomly chosen depth bin's mask, nearest-resized to
  SR resolution, masks both images; SmoothL1 summed and normalized by mask
  area (``mask_loss.py:22-41``).

* :func:`dynamic_weight_mask_loss` — per-bin masked SmoothL1 across all K
  bins, combined by softmax of a trainable K-vector that lives in the
  parameter pytree and is learned jointly with the generator
  (``mask_loss.py:44-90``; wiring at ``F_model_depthCond.py:82-98``).

The reference's K-iteration Python loop becomes a single vectorized pass:
masks broadcast over the batch in one [B,H,W,K] tensor, the K per-bin sums
are two reductions, and XLA fuses the whole thing into one HBM sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from endosr.losses.basic import charbonnier_loss, l1_loss, l2_loss, smooth_l1_loss
from endosr.ops.resize import interpolate_nearest

__all__ = ["mask_loss", "dynamic_weight_mask_loss", "per_bin_masked_loss"]


def _resize_masks(mask_list: jax.Array, size: tuple[int, int]) -> jax.Array:
    """[B,h,w,K] → [B,H,W,K] via nearest (torch semantics)."""
    return interpolate_nearest(mask_list, size)


def per_bin_masked_loss(sr, hr, mask_list, criterion: str = "smoothl1") -> jax.Array:
    """Per-depth-bin masked loss vector [K].

    For 'smoothl1': Σ(loss·mask) / Σ(mask·C) per bin — identical to the
    reference's sum-over-masked-image / sum-of-3-channel-mask normalization.
    For mean-reduction criteria the reference computes the plain mean over
    the masked (zeroed-elsewhere) images; reproduced exactly.
    """
    size = (sr.shape[1], sr.shape[2])
    masks = _resize_masks(mask_list, size)  # [B,H,W,K]
    c = sr.shape[-1]

    if criterion == "smoothl1":
        diff = jnp.abs(sr - hr)
        elem = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)  # [B,H,W,C]
        num = jnp.einsum("bhwc,bhwk->k", elem, masks)
        den = jnp.sum(masks, axis=(0, 1, 2)) * c
        return num / den
    # mean criteria over masked images (mask zeros elsewhere)
    n = sr.size
    masked_sr = sr[..., None, :] * masks[..., :, None]  # [B,H,W,K,C]
    masked_hr = hr[..., None, :] * masks[..., :, None]
    if criterion == "l1":
        return jnp.sum(jnp.abs(masked_sr - masked_hr), axis=(0, 1, 2, 4)) / n
    if criterion == "l2":
        return jnp.sum(jnp.square(masked_sr - masked_hr), axis=(0, 1, 2, 4)) / n
    if criterion == "cb":
        return jnp.sum(
            jnp.sqrt(jnp.square(masked_sr - masked_hr) + 1e-6), axis=(0, 1, 2, 4)
        )
    raise NotImplementedError(f"Loss type [{criterion}] for depth loss is not recognized.")


def mask_loss(sr, hr, mask_list, bin_index, criterion: str = "smoothl1",
              weight: float = 1.0) -> jax.Array:
    """Single random-bin mask loss. ``bin_index`` is chosen by the caller
    (host RNG in the reference, ``mask_loss.py:24``); pass a traced int32 to
    keep the train step jittable."""
    size = (sr.shape[1], sr.shape[2])
    masks = _resize_masks(mask_list, size)
    m = jnp.take(masks, bin_index, axis=-1)[..., None]  # [B,H,W,1]
    masked_sr = sr * m
    masked_hr = hr * m
    if criterion == "smoothl1":
        loss = smooth_l1_loss(masked_sr, masked_hr, reduction="sum")
        total = jnp.sum(m) * sr.shape[-1]
        return loss / total * weight
    crit = {"l1": l1_loss, "l2": l2_loss, "cb": charbonnier_loss}[criterion]
    return weight * crit(masked_sr, masked_hr)


def dynamic_weight_mask_loss(sr, hr, mask_list, trainable_weight,
                             criterion: str = "smoothl1", weight: float = 1.0):
    """Returns (per-bin losses [K], weighted per-bin [K], total, softmax weights).

    ``trainable_weight`` is the K-vector parameter (init ones) from the
    optimizer pytree, matching ``dynamic_weight_mask_loss.trainable_weight``.
    """
    losses = per_bin_masked_loss(sr, hr, mask_list, criterion)
    w = jax.nn.softmax(trainable_weight.astype(jnp.float32))
    weighted = w * losses
    total = jnp.sum(weighted) * weight
    return losses, weighted, total, w
