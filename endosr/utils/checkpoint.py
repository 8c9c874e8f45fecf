"""Checkpointing — the reference's two-file scheme, JAX-native.

Twin of ``base_model.save_network/load_network`` (weights) and
``save_training_state/resume_training`` (epoch/iter/optimizer state),
``codes/models/base_model.py:77-119``. Weights are a flax param pytree in a
single msgpack file ``{iter}_G.ckpt``; trainer state is ``{iter}.state``.
Multi-host: only process 0 writes (params are replicated under data
parallelism); everyone can read.

Torch ``.pth`` checkpoints are loaded transparently through the porter
(``endosr.utils.port_torch``) when the file extension is ``.pth``.

Backends: the default writes single msgpack files (atomic rename). Set
``path: {checkpoint_backend: orbax}`` in the YAML (or
``ENDOSR_CKPT_BACKEND=orbax``) to write orbax-checkpoint directories
instead — the production choice for sharded/multi-host arrays. Loading
autodetects: a directory restores through orbax, a file through msgpack,
``.pth`` through the torch porter — so checkpoints from either backend
(or the reference) interchange freely.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

__all__ = ["save_pytree", "load_pytree", "save_network", "load_network",
           "save_training_state", "load_training_state", "set_backend"]

_BACKEND = os.environ.get("ENDOSR_CKPT_BACKEND", "msgpack")


def set_backend(name: str | None) -> None:
    """Select the process-default save backend: 'msgpack' or 'orbax'.

    Per-model configuration should pass ``backend=`` to the save functions
    instead (BaseModel threads ``path: {checkpoint_backend: ...}`` through
    that way); this global is only the fallback default.
    """
    global _BACKEND
    if name:
        assert name in ("msgpack", "orbax"), name
        _BACKEND = name


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree: Any, path: str, backend: str | None = None) -> None:
    backend = backend or _BACKEND
    assert backend in ("msgpack", "orbax"), backend
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        # write to a sibling tmp dir, swap in only once the save finalized —
        # a crash mid-save must never lose the previous checkpoint at `path`
        tmp = path + f".tmp.{os.getpid()}"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        with ocp.PyTreeCheckpointer() as ckptr:
            # canonical flax state-dict form (pure nested containers) so the
            # restore side round-trips through from_state_dict regardless of
            # the original pytree's custom node types (TrainState, optax
            # namedtuples, …)
            ckptr.save(tmp, serialization.to_state_dict(_to_host(tree)))
        old = path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(path):  # orbax refuses to overwrite; swap via .old
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old)
        return
    data = serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, target: Any) -> Any:
    if os.path.isdir(path):  # an orbax checkpoint directory
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path))
        return serialization.from_state_dict(target, restored)
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def save_network(params: Any, save_dir: str, network_label: str,
                 iter_label, backend: str | None = None) -> str:
    """``{iter}_{label}.ckpt`` — mirrors save_network's filename scheme."""
    path = os.path.join(save_dir, f"{iter_label}_{network_label}.ckpt")
    if jax.process_index() == 0:
        save_pytree(params, path, backend)
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


def save_training_state(state: Any, save_dir: str, iter_label,
                        backend: str | None = None) -> str:
    path = os.path.join(save_dir, f"{iter_label}.state")
    if jax.process_index() == 0:
        save_pytree(state, path, backend)
    return path


def load_training_state(path: str, target: Any) -> Any:
    return load_pytree(path, target)
