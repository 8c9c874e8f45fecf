"""Checkpointing — the reference's two-file scheme, JAX-native.

Twin of ``base_model.save_network/load_network`` (weights) and
``save_training_state/resume_training`` (epoch/iter/optimizer state),
``codes/models/base_model.py:77-119``. Weights are a flax param pytree in a
single msgpack file ``{iter}_G.ckpt``; trainer state is ``{iter}.state``.
Multi-host: only process 0 writes (params are replicated under data
parallelism); everyone can read.

Torch ``.pth`` checkpoints are loaded transparently through the porter
(``endosr.utils.port_torch``) when the file extension is ``.pth``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

__all__ = ["save_pytree", "load_pytree", "save_network", "load_network",
           "save_training_state", "load_training_state"]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def save_network(params: Any, save_dir: str, network_label: str,
                 iter_label) -> str:
    """``{iter}_{label}.ckpt`` — mirrors save_network's filename scheme."""
    path = os.path.join(save_dir, f"{iter_label}_{network_label}.ckpt")
    if jax.process_index() == 0:
        save_pytree(params, path)
    return path


def load_network(load_path: str, params_template: Any, strict: bool = True,
                 key_fn=None) -> Any:
    """Load ``.ckpt`` (flax msgpack) or ``.pth`` (ported torch) weights."""
    if load_path.endswith(".pth"):
        from endosr.utils.port_torch import (
            flax_path_to_torch_key,
            load_torch_state_dict,
            port_state_dict,
        )

        sd = load_torch_state_dict(load_path)
        return port_state_dict(
            sd, params_template,
            key_fn=key_fn or flax_path_to_torch_key, strict=strict,
        )
    return load_pytree(load_path, params_template)


def save_training_state(state: Any, save_dir: str, iter_label) -> str:
    path = os.path.join(save_dir, f"{iter_label}.state")
    if jax.process_index() == 0:
        save_pytree(state, path)
    return path


def load_training_state(path: str, target: Any) -> Any:
    return load_pytree(path, target)
