"""Pixel and adversarial losses.

Functional twins of the reference's loss zoo
(``codes/models/modules/loss.py``): L1/L2/Charbonnier pixel losses,
SmoothL1, GAN losses (vanilla/lsgan/ragan share the machinery; wgan-gp as
mean with sign), and the WGAN-GP gradient penalty.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "l1_loss",
    "l2_loss",
    "charbonnier_loss",
    "smooth_l1_loss",
    "pixel_loss",
    "gan_loss",
    "gradient_penalty",
]


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def charbonnier_loss(pred, target, eps: float = 1e-6):
    """CharbonnierLoss (``loss.py:5-16``): sum of sqrt(diff² + eps)."""
    return jnp.sum(jnp.sqrt(jnp.square(pred - target) + eps))


def smooth_l1_loss(pred, target, beta: float = 1.0, reduction: str = "mean"):
    """torch nn.SmoothL1Loss semantics."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


_PIXEL = {"l1": l1_loss, "l2": l2_loss, "cb": charbonnier_loss}


def pixel_loss(kind: str):
    """Criterion factory mirroring ``F_model_depthCond.py:50-59``."""
    try:
        return _PIXEL[kind]
    except KeyError:
        raise NotImplementedError(f"Loss type [{kind}] is not recognized.")


def gan_loss(gan_type: str, pred, target_is_real: bool,
             real_label_val: float = 1.0, fake_label_val: float = 0.0):
    """GANLoss (``loss.py:19-61``): 'gan'/'ragan' → BCE-with-logits, 'lsgan' → MSE,
    'wgan-gp' → signed mean."""
    if gan_type == "wgan-gp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    label = jnp.full_like(pred, real_label_val if target_is_real else fake_label_val)
    if gan_type == "lsgan":
        return jnp.mean(jnp.square(pred - label))
    if gan_type in ("gan", "ragan"):
        # BCEWithLogits
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * label + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    raise NotImplementedError(f"GAN type [{gan_type}] is not found")


def gradient_penalty(disc_fn, real, fake, key):
    """WGAN-GP penalty (``loss.py:64-106``): E[(‖∇D(x̂)‖₂ − 1)²] on random interps."""
    alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = real + alpha * (fake - real)

    def d_sum(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(d_sum)(interp)
    norm = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norm - 1.0))
