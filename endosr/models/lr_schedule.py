"""Learning-rate schedules — closed-form twins of the reference schedulers.

The reference steps torch ``_LRScheduler`` subclasses once per *iteration*
(``base_model.py:51-63`` called from ``train.py:194``):

* ``CosineAnnealingLR_Restart`` (``lr_scheduler.py:34-62``): per-period
  cosine annealing with warm restarts and per-restart weights.
* ``MultiStepLR_Restart`` (``lr_scheduler.py:8-31``) and plain torch
  ``MultiStepLR``.
* Linear warmup override for the first ``warmup_iter`` steps
  (``base_model.py:57-63``).

Here each is a pure function ``step → lr`` (jnp-traceable), usable directly
as an optax schedule inside a jitted train step.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "cosine_annealing_restart",
    "multistep_restart",
    "multistep",
    "with_warmup",
    "build_schedule",
    "clear_state_at",
]


def clear_state_at(restarts: Sequence[int]):
    """Optax wrapper reproducing ``MultiStepLR_Restart(clear_state=True)``
    (reference ``lr_scheduler.py:22-23``): at each restart step the
    optimizer state (Adam moments and bias-correction count) is cleared —
    torch does ``optimizer.state = defaultdict(dict)`` from inside
    ``get_lr`` before that iteration's optimizer step.

    Returns ``wrap(inner)`` producing a GradientTransformation whose state
    leaves are zeroed when its update count hits a restart step (counts
    align with the closed-form schedules here: update n uses schedule(n),
    and a restart at step r rewinds both lr and moments at n == r).
    """
    import jax
    import optax

    r = jnp.asarray(np.asarray(sorted(restarts), np.int32).reshape(-1))

    def wrap(inner):
        def init(params):
            return (jnp.zeros([], jnp.int32), inner.init(params))

        def update(updates, state, params=None):
            count, inner_state = state
            reset = jnp.any(count == r)
            inner_state = jax.tree_util.tree_map(
                lambda x: jnp.where(reset, jnp.zeros_like(x), x), inner_state
            )
            updates, inner_state = inner.update(updates, inner_state, params)
            return updates, (count + 1, inner_state)

        return optax.GradientTransformation(init, update)

    return wrap


def cosine_annealing_restart(base_lr: float, t_period: Sequence[int],
                             restarts: Sequence[int] = (),
                             restart_weights: Sequence[float] = (),
                             eta_min: float = 0.0):
    """lr(t) = η_min + (base·w_seg − η_min)·(1 + cos(π·(t−r_seg)/T_seg))/2."""
    assert len(restarts) == len(restart_weights), \
        "restarts and their weights do not match."
    assert len(t_period) == len(restarts) + 1
    seg_starts = jnp.asarray(np.concatenate([[0], np.asarray(restarts, np.int64)]))
    seg_weights = jnp.asarray(np.concatenate([[1.0], np.asarray(restart_weights, np.float64)]),
                              dtype=jnp.float32)
    seg_periods = jnp.asarray(np.asarray(t_period, np.float64), dtype=jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum(step >= seg_starts.astype(jnp.float32)) - 1
        idx = jnp.clip(idx, 0, seg_starts.shape[0] - 1)
        r = seg_starts[idx].astype(jnp.float32)
        t_max = seg_periods[idx]
        w = seg_weights[idx]
        return eta_min + (base_lr * w - eta_min) * (
            1.0 + jnp.cos(jnp.pi * (step - r) / t_max)
        ) / 2.0

    return schedule


def multistep_restart(base_lr: float, milestones: Sequence[int], gamma: float = 0.1,
                      restarts: Sequence[int] = (),
                      restart_weights: Sequence[float] = ()):
    """lr(t) = base·w_seg·γ^(#milestones in (r_seg, t])."""
    if restarts:
        assert len(restarts) == len(restart_weights)
    seg_starts = jnp.asarray(np.concatenate([[0], np.asarray(restarts or (), np.int64)]))
    seg_weights = jnp.asarray(
        np.concatenate([[1.0], np.asarray(restart_weights or (), np.float64)]),
        dtype=jnp.float32,
    )
    ms = jnp.asarray(np.asarray(milestones, np.int64))

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        idx = jnp.sum(step >= seg_starts.astype(jnp.int32)) - 1
        idx = jnp.clip(idx, 0, seg_starts.shape[0] - 1)
        r = seg_starts[idx].astype(jnp.int32)
        w = seg_weights[idx]
        n = jnp.sum((ms.astype(jnp.int32) > r) & (ms.astype(jnp.int32) <= step))
        return base_lr * w * gamma ** n.astype(jnp.float32)

    return schedule


def multistep(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    return multistep_restart(base_lr, milestones, gamma)


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1):
    """torch StepLR: lr = base·γ^(t // step_size) (segNet scheduler,
    ``F_model_depthSeg.py:139``)."""

    def schedule(step):
        n = jnp.asarray(step, jnp.int32) // int(step_size)
        return base_lr * gamma ** n.astype(jnp.float32)

    return schedule


def with_warmup(schedule, init_lr: float, warmup_iter: int):
    """Linear warmup override (``base_model.py:57-63``); no-op if ≤ 0."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def s(step):
        step_f = jnp.asarray(step, jnp.float32)
        return jnp.where(step_f < warmup_iter,
                         step_f * init_lr / warmup_iter,
                         schedule(step))

    return s


def build_schedule(train_opt: dict):
    """Build the lr schedule from a reference-schema ``train:`` config block."""
    lr = float(train_opt["lr_G"])
    scheme = train_opt.get("lr_scheme", "MultiStepLR")
    if scheme == "CosineAnnealingLR_Restart":
        sched = cosine_annealing_restart(
            lr,
            train_opt["T_period"],
            train_opt.get("restarts") or (),
            train_opt.get("restart_weights") or (),
            float(train_opt.get("eta_min", 0) or 0),
        )
    elif scheme == "MultiStepLR_Restart":
        sched = multistep_restart(
            lr,
            train_opt.get("lr_steps", ()),
            float(train_opt.get("lr_gamma", 0.1) or 0.1),
            train_opt.get("restarts") or (),
            train_opt.get("restart_weights") or (),
        )
    else:  # plain MultiStepLR
        sched = multistep(lr, train_opt.get("lr_steps", ()) or (),
                          float(train_opt.get("lr_gamma", 0.1) or 0.1))
    return with_warmup(sched, lr, int(train_opt.get("warmup_iter") or -1))


if __name__ == "__main__":
    # console twin of the reference's plotting harness
    # (``lr_scheduler.py:65-142``): print the flagship schedule's shape
    sched = build_schedule({
        "lr_G": 1e-3, "lr_scheme": "CosineAnnealingLR_Restart",
        "T_period": [20000, 20000, 20000, 20000],
        "restarts": [20000, 40000, 60000], "restart_weights": [1, 1, 1],
        "eta_min": 1e-7, "warmup_iter": -1,
    })
    for t in range(0, 80001, 4000):
        lr = float(sched(t))
        bar = "#" * int(lr / 1e-3 * 60)
        print(f"{t:7d} {lr:.3e} {bar}")
