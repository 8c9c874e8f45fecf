"""BaseModel — the training-wrapper contract.

Keeps the reference's model API (``codes/models/base_model.py:8-119``):
``feed_data / optimize_parameters / test / get_current_visuals /
get_current_log / save / load / resume_training / update_learning_rate`` —
so the train/test drivers read like the reference's. Internally everything
is functional JAX: parameters + optimizer state live in a pytree
``TrainState``, the LR schedule is a closed-form function of the step
(baked into the optax chain, so "update_learning_rate" is a query, not a
mutation), and the train step is one jitted SPMD program over the mesh.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from endosr.models.lr_schedule import build_schedule
from endosr.utils import checkpoint as ckpt

__all__ = ["BaseModel", "TrainState"]


@struct.dataclass
class TrainState:
    step: jax.Array          # int32 scalar
    params: Any              # {'netG': ..., possibly 'dyn': ..., 'netD': ...}
    opt_state: Any


class BaseModel:
    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt["is_train"]
        self.rank = jax.process_index()
        self.log_dict: dict[str, float] = {}
        self.schedule = None
        if self.is_train and opt.get("train"):
            self.schedule = build_schedule(opt["train"])
        # YAML-selectable checkpoint backend (msgpack file / orbax dir),
        # held per-model — one model's YAML must not flip the backend for
        # every other model in the process
        self.ckpt_backend = None
        if opt.get("path"):
            self.ckpt_backend = opt["path"].get("checkpoint_backend")

    # ------------------------------------------------------------------
    # contract stubs
    # ------------------------------------------------------------------
    def feed_data(self, data):
        raise NotImplementedError

    def optimize_parameters(self, step):
        raise NotImplementedError

    def test(self):
        raise NotImplementedError

    def get_current_visuals(self):
        raise NotImplementedError

    def get_current_log(self):
        return self.log_dict

    # ------------------------------------------------------------------
    # LR — closed-form; the reference's per-iteration stepping collapses
    # to evaluating the schedule at the current step
    # ------------------------------------------------------------------
    def update_learning_rate(self, cur_iter=None, warmup_iter=-1):
        return self.get_current_learning_rate(cur_iter)

    def get_current_learning_rate(self, cur_iter=None):
        if self.schedule is None:
            return 0.0
        step = cur_iter if cur_iter is not None else int(self.state.step)
        return float(self.schedule(step))

    # ------------------------------------------------------------------
    # checkpointing (two-file scheme, ``base_model.py:77-119``)
    # ------------------------------------------------------------------
    def save_network(self, params, network_label, iter_label):
        return ckpt.save_network(
            params, self.opt["path"]["models"], network_label, iter_label,
            backend=self.ckpt_backend,
        )

    def load_network(self, load_path, params_template, strict=True, key_fn=None):
        return ckpt.load_network(load_path, params_template, strict, key_fn)

    def save_training_state(self, epoch, iter_step):
        state = {
            "epoch": np.int64(epoch),
            "iter": np.int64(iter_step),
            "opt_state": self.state.opt_state,
            "params": self.state.params,
        }
        return ckpt.save_training_state(
            state, self.opt["path"]["training_state"], iter_step,
            backend=self.ckpt_backend,
        )

    def resume_training(self, resume_path):
        template = {
            "epoch": np.int64(0),
            "iter": np.int64(0),
            "opt_state": self.state.opt_state,
            "params": self.state.params,
        }
        loaded = ckpt.load_training_state(resume_path, template)
        self.state = TrainState(
            step=jnp.asarray(int(loaded["iter"]), jnp.int32),
            params=loaded["params"],
            opt_state=loaded["opt_state"],
        )
        return int(loaded["epoch"]), int(loaded["iter"])

    # ------------------------------------------------------------------
    def get_network_description(self, params):
        n = sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))
        return f"param pytree with {n:,d} parameters", n

    def _model_path(self, label, iter_label):
        return os.path.join(self.opt["path"]["models"], f"{iter_label}_{label}.ckpt")
