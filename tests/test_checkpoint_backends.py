"""Checkpoint backends: msgpack files and orbax directories interchange."""

import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from endosr.models.base import TrainState
from endosr.utils import checkpoint as ckpt


@pytest.fixture
def state():
    params = {"netG": {"conv": {"kernel": jnp.arange(12, dtype=jnp.float32)
                                .reshape(3, 4),
                                "bias": jnp.ones((4,), jnp.float32)}},
              "dyn": {"trainable_weight": jnp.full((10,), 0.5)}}
    tx = optax.adam(1e-3)
    return TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                      opt_state=tx.init(params))


def _roundtrip(state, path):
    ckpt.save_pytree(state, path)
    zero = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
        opt_state=jax.tree_util.tree_map(jnp.zeros_like, state.opt_state),
    )
    restored = ckpt.load_pytree(path, zero)
    flat_a = jax.tree_util.tree_leaves(state)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


import jax  # noqa: E402  (after fixture definitions for clarity)


def test_msgpack_roundtrip(state, tmp_path):
    ckpt.set_backend("msgpack")
    path = str(tmp_path / "100_G.ckpt")
    _roundtrip(state, path)
    assert os.path.isfile(path)


def test_orbax_roundtrip(state, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    ckpt.set_backend("orbax")
    try:
        path = str(tmp_path / "100_G.ckpt")
        _roundtrip(state, path)
        assert os.path.isdir(path)
        # overwrite works (orbax refuses by default; save_pytree clears)
        _roundtrip(state, path)
    finally:
        ckpt.set_backend("msgpack")


def test_cross_backend_load(state, tmp_path):
    """A msgpack reader process can load an orbax dir and vice versa —
    load_pytree autodetects by path type."""
    pytest.importorskip("orbax.checkpoint")
    ckpt.set_backend("orbax")
    try:
        opath = str(tmp_path / "orbax_G.ckpt")
        ckpt.save_pytree(state, opath)
    finally:
        ckpt.set_backend("msgpack")
    mpath = str(tmp_path / "msgpack_G.ckpt")
    ckpt.save_pytree(state, mpath)

    zero = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
        opt_state=jax.tree_util.tree_map(jnp.zeros_like, state.opt_state),
    )
    a = ckpt.load_pytree(opath, zero)
    b = ckpt.load_pytree(mpath, zero)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_set_backend_rejects_unknown():
    with pytest.raises(AssertionError):
        ckpt.set_backend("pickle")
    ckpt.set_backend(None)  # no-op
