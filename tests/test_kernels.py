"""Pallas kernel correctness (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

from endosr.kernels.fused_in_mod import (
    fused_instance_norm_modulate,
    instance_norm_modulate_reference,
)

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 8, 16)])
def test_fused_in_mod_matches_reference(shape):
    x = RNG.standard_normal(shape).astype(np.float32)
    gamma = RNG.standard_normal(shape).astype(np.float32) * 0.1
    beta = RNG.standard_normal(shape).astype(np.float32) * 0.1
    want = np.asarray(instance_norm_modulate_reference(x, gamma, beta))
    got = np.asarray(
        fused_instance_norm_modulate(x, gamma, beta, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_in_mod_matches_torch_instancenorm():
    import torch
    import torch.nn.functional as F

    x = RNG.standard_normal((2, 12, 12, 6)).astype(np.float32)
    zeros = np.zeros_like(x)
    got = np.asarray(fused_instance_norm_modulate(x, zeros, zeros,
                                                  interpret=True))
    want = F.instance_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
