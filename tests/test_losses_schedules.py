"""Loss + LR-schedule parity against the reference implementations."""

import numpy as np
import pytest
import torch

from tests.conftest import requires_reference

RNG = np.random.default_rng(13)


def _imgs(b=2, h=16, w=16, k=5):
    sr = RNG.random((b, h, w, 3)).astype(np.float32)
    hr = RNG.random((b, h, w, 3)).astype(np.float32)
    masks = (RNG.random((b, h // 2, w // 2, k)) > 0.6).astype(np.float32)
    return sr, hr, masks


def _to_torch(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


@requires_reference
def test_dynamic_weight_mask_loss_matches_reference(reference_path):
    from models.modules.mask_loss import dynamic_weight_mask_loss as RefDyn

    from endosr.losses.mask import dynamic_weight_mask_loss

    sr, hr, masks = _imgs(k=5)
    opt = {"dynamic_criterion": "smoothl1", "dynamic_weight": 10.0}
    ref = RefDyn(opt, num_trainable_para=5)
    with torch.no_grad():
        ref.trainable_weight.copy_(torch.tensor([1.0, 2.0, 0.5, 1.5, 1.0]))
    raw_t, _, total_t, w_t = ref(_to_torch(sr), _to_torch(hr), _to_torch(masks))

    import jax.numpy as jnp

    raw, _, total, w = dynamic_weight_mask_loss(
        sr, hr, masks, jnp.asarray([1.0, 2.0, 0.5, 1.5, 1.0]),
        "smoothl1", 10.0,
    )
    np.testing.assert_allclose(np.asarray(w), w_t.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(raw), [float(x) for x in raw_t], atol=1e-5)
    assert float(total) == pytest.approx(float(total_t), rel=1e-5)


@requires_reference
def test_mask_loss_matches_reference(reference_path):
    import models.modules.mask_loss as ref_mod

    from endosr.losses.mask import mask_loss

    sr, hr, masks = _imgs(k=5)
    opt = {"mask_criterion": "smoothl1", "mask_weight": 2.0}
    ref = ref_mod.mask_loss(opt)
    # pin the reference's random bin choice
    np.random.seed(0)
    want = float(ref.get_mask_loss(_to_torch(sr), _to_torch(hr), _to_torch(masks)))
    np.random.seed(0)
    bin_idx = int(np.random.randint(0, 5, 1)[0])
    got = float(mask_loss(sr, hr, masks, bin_idx, "smoothl1", 2.0))
    assert got == pytest.approx(want, rel=1e-5)


@requires_reference
def test_cosine_restart_schedule_matches_reference(reference_path):
    from models.lr_scheduler import CosineAnnealingLR_Restart

    from endosr.models.lr_schedule import cosine_annealing_restart

    base_lr = 1e-3
    t_period = [10, 10, 8, 8]
    restarts = [10, 20, 28]
    weights = [1.0, 0.5, 0.25]
    dummy = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([dummy], lr=base_lr)
    sched = CosineAnnealingLR_Restart(optim, t_period, eta_min=1e-7,
                                      restarts=restarts, weights=weights)
    ref_lrs = []
    for _ in range(36):
        ref_lrs.append(optim.param_groups[0]["lr"])
        optim.step()
        sched.step()

    ours = cosine_annealing_restart(base_lr, t_period, restarts, weights, 1e-7)
    got = [float(ours(t)) for t in range(36)]
    np.testing.assert_allclose(got, ref_lrs, rtol=1e-5)


@requires_reference
def test_multistep_restart_schedule_matches_reference(reference_path):
    from models.lr_scheduler import MultiStepLR_Restart

    from endosr.models.lr_schedule import multistep_restart

    base_lr = 2e-4
    milestones = [5, 10, 20, 25]
    restarts = [15]
    weights = [0.5]
    dummy = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([dummy], lr=base_lr)
    sched = MultiStepLR_Restart(optim, milestones, restarts=restarts,
                                weights=weights, gamma=0.1)
    ref_lrs = []
    for _ in range(30):
        ref_lrs.append(optim.param_groups[0]["lr"])
        optim.step()
        sched.step()

    ours = multistep_restart(base_lr, milestones, 0.1, restarts, weights)
    got = [float(ours(t)) for t in range(30)]
    np.testing.assert_allclose(got, ref_lrs, rtol=1e-5)


def test_warmup_override():
    from endosr.models.lr_schedule import multistep, with_warmup

    sched = with_warmup(multistep(1e-3, [100], 0.1), 1e-3, 10)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)


@requires_reference
def test_clear_state_matches_reference_adam_trajectory(reference_path):
    """MultiStepLR_Restart(clear_state=True) wipes the Adam moments at each
    restart (ref ``lr_scheduler.py:22-23``); the optax ``clear_state_at``
    wrapper must reproduce the full parameter trajectory, including the
    bias-correction rewind after the wipe."""
    import jax.numpy as jnp
    import optax
    from models.lr_scheduler import MultiStepLR_Restart

    from endosr.models.lr_schedule import clear_state_at, multistep_restart

    base_lr, milestones, restarts, weights = 1e-2, [5, 12], [8], [0.7]
    p_t = torch.nn.Parameter(torch.ones(4))
    optim = torch.optim.Adam([p_t], lr=base_lr, betas=(0.9, 0.99))
    sched = MultiStepLR_Restart(optim, milestones, restarts=restarts,
                                weights=weights, gamma=0.1, clear_state=True)
    g = torch.linspace(0.1, 0.4, 4)
    traj = []
    for t in range(20):
        optim.zero_grad()
        # varying gradients so the moment wipe visibly changes the
        # trajectory (constant grads make Adam's moments self-restoring)
        p_t.grad = g * float((-1.0) ** t * 0.9 + 1.0)
        optim.step()
        sched.step()
        traj.append(p_t.detach().numpy().copy())

    sched_j = multistep_restart(base_lr, milestones, 0.1, restarts, weights)
    tx = optax.chain(
        clear_state_at(restarts)(optax.scale_by_adam(b1=0.9, b2=0.99)),
        optax.scale_by_learning_rate(sched_j),
    )
    params = jnp.ones((4,))
    state = tx.init(params)
    gj = jnp.asarray(np.linspace(0.1, 0.4, 4), jnp.float32)
    cleared = optax.chain(  # control: without the wrapper the wipe is absent
        optax.scale_by_adam(b1=0.9, b2=0.99),
        optax.scale_by_learning_rate(sched_j),
    )
    cstate, cparams = cleared.init(params), params
    diverged = False
    for t in range(20):
        gt = gj * float((-1.0) ** t * 0.9 + 1.0)
        upd, state = tx.update(gt, state, params)
        params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(params), traj[t], rtol=1e-4, atol=1e-6,
            err_msg=f"step {t}")
        cupd, cstate = cleared.update(gt, cstate, cparams)
        cparams = optax.apply_updates(cparams, cupd)
        if not np.allclose(np.asarray(cparams), traj[t], rtol=1e-4, atol=1e-6):
            diverged = True
    assert diverged, "control without clear_state should diverge post-restart"
