"""Multi-device data parallelism on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from endosr.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_partitions_leading_axis():
    mesh = make_mesh()
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4)

    # non-divisible batch replicates instead of failing
    small = shard_batch({"x": np.ones((3, 4), np.float32)}, mesh)
    assert small["x"].addressable_shards[0].data.shape == (3, 4)


@pytest.mark.slow
def test_flagship_train_step_shards_over_mesh():
    from endosr.config.options import dict_to_nonedict
    from endosr.models.f_depthcond import FModelDepthCond
    from __graft_entry__ import _flagship_opt

    mesh = make_mesh()
    opt = _flagship_opt(lr_size=8, mask_num=10, scale=4)
    opt["network_G"]["nb"] = 6
    opt["network_G"]["which_ResBlk_depth"] = [0, 1]
    opt["network_G"]["depth_latent_ch"] = 16
    opt = dict_to_nonedict(opt)
    model = FModelDepthCond(opt, mesh=mesh)

    rng = np.random.default_rng(0)
    b = 8
    batch = {
        "LQ": rng.random((b, 8, 8, 3)).astype(np.float32),
        "GT": rng.random((b, 32, 32, 3)).astype(np.float32),
        "Depth": rng.random((b, 8, 8, 1)).astype(np.float32),
        "DepthMaskList": (rng.random((b, 8, 8, 10)) > 0.9).astype(np.float32),
    }
    model.feed_data(batch)
    model.optimize_parameters(0)
    assert np.isfinite(model.log_dict["l_all"])

    # params stay replicated; a second step works on donated state
    model.feed_data(batch)
    model.optimize_parameters(1)
    assert np.isfinite(model.log_dict["l_all"])

    # the same params on each device (replicated) — fetch and compare
    leaf = jax.tree_util.tree_leaves(model.state.params)[0]
    shards = leaf.addressable_shards
    assert len(shards) == 8
    np.testing.assert_array_equal(np.asarray(shards[0].data),
                                  np.asarray(shards[-1].data))
