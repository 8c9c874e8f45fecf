"""Spatial (H-axis) sharding: SPMD forward matches the single-device result.

The TPU analog of sequence parallelism (SURVEY.md §5): H is sharded over the
8-device CPU mesh and XLA's partitioner inserts conv halo exchanges and the
psums behind InstanceNorm / region pooling. Numerical equality with the
unsharded forward proves the collectives are complete and correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosr.nn.depthnet import DepthNet
from endosr.parallel.mesh import make_mesh
from endosr.parallel.spatial import shard_spatial, spatial_forward, spatial_jit


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return make_mesh(jax.devices()[:8])


def _inputs(b=1, h=32, w=32, k=10):
    rng = np.random.default_rng(11)
    lq = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    dep = jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32))
    bins = rng.integers(0, k, (b, h, w))
    mk = jnp.asarray(
        (bins[..., None] == np.arange(k)).astype(np.float32))
    return lq, dep, mk


@pytest.mark.slow
def test_spatial_forward_matches_single_device(mesh):
    lq, dep, mk = _inputs()
    net = DepthNet(which_resblk_depth=(0, 1, 14, 15), scale=2,
                   depth_latent_ch=32, depth_range_num=10)
    params = net.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]

    want = np.asarray(net.apply({"params": params}, lq, dep, mk))
    got_sharded = spatial_forward(net, params, lq, dep, mk, mesh=mesh)

    # the result comes back H-sharded over the mesh
    assert got_sharded.sharding.spec == jax.sharding.PartitionSpec(
        None, "data")
    got = np.asarray(jax.device_get(got_sharded))
    assert got.shape == want.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_shard_spatial_places_h_axis(mesh):
    lq, dep, mk = _inputs(h=16, w=8)
    (s_lq,) = shard_spatial((lq,), mesh, min_rows=2)
    assert s_lq.sharding.spec == jax.sharding.PartitionSpec(None, "data")
    # 8 shards of 2 rows each
    assert len(s_lq.addressable_shards) == 8
    assert s_lq.addressable_shards[0].data.shape == (1, 2, 8, 3)


def test_shard_spatial_rejects_indivisible_h(mesh):
    lq = jnp.zeros((1, 12, 8, 3))
    with pytest.raises(AssertionError):
        shard_spatial((lq,), mesh)


def test_spatial_forward_rejects_degenerate_shards(mesh):
    """H < 4·mesh would put <2 rows per shard into the strided convs, which
    XLA's nearest-neighbor halo exchange silently corrupts — the wrapper
    must refuse rather than return wrong pixels."""
    lq, dep, mk = _inputs(h=16, w=16)
    net = DepthNet(which_resblk_depth=(0,), scale=2,
                   depth_latent_ch=32, depth_range_num=10)
    params = net.init(jax.random.PRNGKey(0), lq, dep, mk)["params"]
    with pytest.raises(ValueError, match="H ≥ 4·mesh"):
        spatial_forward(net, params, lq, dep, mk, mesh=mesh)


def test_all_entry_points_reject_degenerate_shards_by_default(mesh):
    """The guard lives in shard_spatial/spatial_jit themselves, not only in
    spatial_forward — direct users get the same protection."""
    lq = jnp.zeros((1, 16, 8, 3))
    with pytest.raises(ValueError, match="H ≥ 4·mesh"):
        shard_spatial((lq,), mesh)
    ident = spatial_jit(lambda p, x: x, mesh=mesh, n_array_args=1)
    with pytest.raises(ValueError, match="H ≥ 4·mesh"):
        ident(None, lq)
    lazy = spatial_jit(lambda p, x: x, mesh=mesh)
    with pytest.raises(ValueError, match="H ≥ 4·mesh"):
        lazy(None, lq)


def test_spatial_jit_generic_fn(mesh):
    """spatial_jit wraps arbitrary conv-like fns, not just flax modules."""
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 3, 2, 4)), jnp.float32) * 0.1

    def fn(params, x):
        y = jax.lax.conv_general_dilated(
            x, params, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # a global spatial reduction forces a cross-shard psum
        return y - jnp.mean(y, axis=(1, 2), keepdims=True)

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 16, 16, 2)), jnp.float32)
    want = np.asarray(fn(w, x))
    call = spatial_jit(fn, mesh=mesh, n_array_args=1, min_rows=2)
    (sx,) = shard_spatial((x,), mesh, min_rows=2)
    got = np.asarray(jax.device_get(call(w, sx)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_spatial_shard_serving_surface(mesh):
    """YAML ``spatial_shard: N`` routes FModelDepthCond.test() through the
    H-sharded bucketed-eval program and matches the single-device path —
    the serving escape for whole-image shapes that OOM one chip (the ×2
    512² fp32 case, BASELINE.md)."""
    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond

    k = 10
    opt = dict_to_nonedict({
        "is_train": False,
        "model": "sftmd_depthCond",
        "scale": 2,
        "datasets": {"test": {"phase": "test", "depthMaskNum": k,
                              "LR_size": 16}},
        "network_G": {"which_model_G": "DepthNet", "in_nc": 3, "out_nc": 3,
                      "nf": 64, "nb": 16, "depth_latent_ch": 32,
                      "use_trainable_params": True,
                      "norm_gamma": 0, "norm_beta": 0,
                      "which_ResBlk_depth": [0, 1]},
        "path": {},
        "spatial_shard": 8,
        "eval_bucket_multiple": 4,
    })
    model = FModelDepthCond(opt, mesh=mesh)
    rng = np.random.default_rng(3)
    h, w = 30, 18  # bucket- and mesh-misaligned on purpose
    batch = {
        "LQ": rng.random((1, h, w, 3)).astype(np.float32),
        "Depth": rng.random((1, h, w, 1)).astype(np.float32),
        "DepthMaskList": (rng.random((1, h, w, k)) > 0.9).astype(np.float32),
    }
    model.feed_data(batch)
    model.test()
    sharded = np.asarray(model.fake_SR)
    assert sharded.shape == (1, 2 * h, 2 * w, 3)

    model.opt["spatial_shard"] = 0
    model.test()
    single = np.asarray(model.fake_SR)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)
