"""DepthNet serving-knob interaction matrix (fast tier).

The DepthNet flag surface (packed_tail / packed_up1 / pallas_* / fold_* /
valid_hw / centered_convs) breeds combination bugs — round 2 shipped a
square-grid assumption in the packed ×8 tail that crashed every H≠W
forward (VERDICT r2). This matrix runs the pairwise-interesting combos at
tiny ×8 shapes, square AND non-square, against one dense-fold oracle:

* exact knobs (packed_tail, packed_up1, pallas_output fallback, unfolded
  tail) must match the oracle to fp32 reduction noise;
* approximate knobs (centered_convs = bf16c3) must be finite, correctly
  shaped and close at bf16 tolerance;
* the valid_hw masked program must reproduce the unpadded forward after
  cropping (tiny twin of tests/test_eval_buckets.py's slow all-scale case).

Reference behavior being pinned: the torch forward is shape-agnostic
(``sftmd_arch.py:912-950``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosr.nn.depthnet import DEPTHNET_PRESETS, DepthNet

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(11)

H, W = 8, 12  # non-square on purpose; H,W % 4 == 0 for the masked path
KW = dict(which_resblk_depth=(0,), nb=4, scale=8, depth_latent_ch=16,
          depth_range_num=4, dtype=jnp.float32, pallas_output=False)


@pytest.fixture(scope="module")
def fixture():
    lq = jnp.asarray(RNG.random((1, H, W, 3), np.float32))
    dep = jnp.asarray(RNG.random((1, H, W, 1), np.float32))
    mk = jnp.asarray((RNG.random((1, H, W, 4)) > 0.7).astype(np.float32))
    net = DepthNet(**KW)
    params = net.init(KEY, lq, dep, mk)["params"]
    oracle = np.asarray(net.apply({"params": params}, lq, dep, mk))
    assert oracle.shape == (1, 8 * H, 8 * W, 3)
    return lq, dep, mk, params, oracle


# (name, overrides) — exact combos: must equal the dense-fold oracle
EXACT_COMBOS = [
    ("packed_tail", dict(packed_tail=True)),
    ("packed_tail+up1", dict(packed_tail=True, packed_up1=True)),
    ("unfolded", dict(packed_tail=False, fold_tail=False,
                      fold_output_conv=False)),
    ("pallas_output_fallback", dict(packed_tail=True, pallas_output=True)),
    ("preset_serve", DEPTHNET_PRESETS["serve"]),
    ("preset_plain", DEPTHNET_PRESETS["plain"]),
]


@pytest.mark.parametrize("name,overrides",
                         EXACT_COMBOS, ids=[c[0] for c in EXACT_COMBOS])
def test_exact_combo_matches_oracle(fixture, name, overrides):
    lq, dep, mk, params, oracle = fixture
    net = DepthNet(**{**KW, **overrides})
    out = np.asarray(net.apply({"params": params}, lq, dep, mk))
    np.testing.assert_allclose(out, oracle, atol=3e-6, err_msg=name)


def test_bf16c3_combo_close(fixture):
    lq, dep, mk, params, oracle = fixture
    net = DepthNet(**{**KW, "packed_tail": True, "centered_convs": 3,
                      "modulation_dtype": jnp.bfloat16})
    out = np.asarray(net.apply({"params": params}, lq, dep, mk))
    assert out.shape == oracle.shape
    assert np.isfinite(out).all()
    # centered bf16 convs: not exact, but within bf16 rounding of fp32
    assert np.abs(out - oracle).max() < 0.1


def test_valid_hw_masked_matches_cropped(fixture):
    lq, dep, mk, params, oracle = fixture
    from endosr.ops.masks import pool_mask_np

    B = 8
    hb, wb = -(-H // B) * B, -(-W // B) * B  # pad W 12 -> 16 (H already 8)
    pad = ((0, 0), (0, hb - H), (0, wb - W), (0, 0))
    v3h, v3w = ((H + 1) // 2 + 1) // 2, ((W + 1) // 2 + 1) // 2
    pm = pool_mask_np(np.asarray(mk), (v3h, v3w), (hb // 4, wb // 4))
    net = DepthNet(**KW)
    out = np.asarray(net.apply(
        {"params": params}, np.pad(np.asarray(lq), pad),
        np.pad(np.asarray(dep), pad), np.pad(np.asarray(mk), pad),
        valid_hw=(jnp.int32(H), jnp.int32(W)), pool_mask=pm))
    np.testing.assert_allclose(out[:, :H * 8, :W * 8], oracle, atol=2e-5)


def test_bs16_chunked_serving_matches_direct(fixture):
    """Batches > 8 serve as chained b=8 sub-forwards inside one jit
    (``f_depthcond._chunked_serving_fn``) so the b≤8 Pallas kernels don't
    silently vanish (bs16 through one program measured 328 → 271 fps/chip).
    The split is exact — every network op is per-sample."""
    from endosr.models.f_depthcond import _chunked_serving_fn

    lq, dep, mk, params, _ = fixture
    reps = (16, 1, 1, 1)
    lq16 = jnp.tile(lq, reps) * jnp.linspace(
        0.5, 1.0, 16, dtype=jnp.float32)[:, None, None, None]
    dep16, mk16 = jnp.tile(dep, reps), jnp.tile(mk, reps)
    net = DepthNet(**KW)
    direct = np.asarray(net.apply({"params": params}, lq16, dep16, mk16))
    chunked = np.asarray(
        _chunked_serving_fn(net, params, 8)(lq16, dep16, mk16))
    np.testing.assert_allclose(chunked, direct, atol=1e-6)

    # non-dividing batches chunk as floor(b/chunk) full chunks + a ragged
    # remainder (8+4 here) — still exact per-sample math. The old code fell
    # through to ONE b=12 program and silently dropped every b≤8 Pallas
    # kernel (ADVICE r4).
    lq12, dep12, mk12 = lq16[:12], dep16[:12], mk16[:12]
    ragged = np.asarray(
        _chunked_serving_fn(net, params, 8)(lq12, dep12, mk12))
    np.testing.assert_allclose(
        ragged, np.asarray(net.apply({"params": params}, lq12, dep12, mk12)),
        atol=1e-6)
    np.testing.assert_allclose(ragged, direct[:12], atol=1e-6)
