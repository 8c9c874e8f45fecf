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

    Nearest-upsampling a mask by an integer factor is block-constant, so for
    the usual LR-mask/SR-image case the K masked sums reduce to LR-resolution
    contractions over block-summed losses — exact math, without ever
    materializing the [B,H,W,K] upsampled mask stack (which made this loss
    cost ~1 s/step at GT 1024² before).
    """
    b, hh, ww, c = sr.shape
    hm, wm, k = mask_list.shape[1], mask_list.shape[2], mask_list.shape[3]
    block = (hh % hm == 0) and (ww % wm == 0)
    fh, fw = hh // hm if block else 1, ww // wm if block else 1

    def per_bin_sum(elem):
        """Σ elem·mask_k per bin, elem: [B,H,W] (already channel-reduced)."""
        if block:
            blk = elem.reshape(b, hm, fh, wm, fw).sum(axis=(2, 4))
            return jnp.einsum("bhw,bhwk->k", blk, mask_list)
        masks = _resize_masks(mask_list, (hh, ww))
        return jnp.einsum("bhw,bhwk->k", elem, masks)

    def mask_area():
        if block:
            return jnp.sum(mask_list, axis=(0, 1, 2)) * (fh * fw)
        return jnp.sum(_resize_masks(mask_list, (hh, ww)), axis=(0, 1, 2))

    diff = sr - hr
    if criterion == "smoothl1":
        ad = jnp.abs(diff)
        elem = jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5).sum(axis=-1)
        return per_bin_sum(elem) / (mask_area() * c)
    n = sr.size
    if criterion == "l1":
        # |m·a − m·b| = m·|a−b| for binary masks
        return per_bin_sum(jnp.abs(diff).sum(axis=-1)) / n
    if criterion == "l2":
        return per_bin_sum(jnp.square(diff).sum(axis=-1)) / n
    if criterion == "cb":
        # reference sums √((m·d)²+ε) over ALL pixels: √(d²+ε) where m=1
        # and √ε elsewhere
        eps = 1e-6
        inside = per_bin_sum((jnp.sqrt(jnp.square(diff) + eps)
                              - jnp.sqrt(eps)).sum(axis=-1))
        return inside + n * jnp.sqrt(eps)
    raise NotImplementedError(f"Loss type [{criterion}] for depth loss is not recognized.")


def mask_loss(sr, hr, mask_list, bin_index, criterion: str = "smoothl1",
              weight: float = 1.0) -> jax.Array:
    """Single random-bin mask loss. ``bin_index`` is chosen by the caller
    (host RNG in the reference, ``mask_loss.py:24``); pass a traced int32 to
    keep the train step jittable."""
    size = (sr.shape[1], sr.shape[2])
    # select the bin BEFORE upsampling (K× less resize work, same result)
    m = jnp.take(mask_list, bin_index, axis=-1)[..., None]  # [B,h,w,1]
    m = _resize_masks(m, size)  # [B,H,W,1]
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
