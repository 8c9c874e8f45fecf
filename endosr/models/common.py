"""Shared machinery for the simpler training wrappers.

``SimpleModel`` factors the common shape of SRModel / F_Model / P_Model /
C_Model (``codes/models/{SR_model,F_model,P_model,C_model}.py``): one
generator, one pixel criterion, Adam + schedule, jitted SPMD train step.
Subclasses define how to build the network inputs and targets from the fed
batch.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.losses.basic import pixel_loss
from endosr.models.base import BaseModel, TrainState
from endosr.parallel.mesh import get_mesh, replicate, shard_batch

logger = logging.getLogger("base")

__all__ = ["SimpleModel", "make_adam"]


def make_adam(train_opt, schedule, weight_decay_key="weight_decay_G"):
    """torch-Adam-equivalent optax chain with the closed-form LR schedule."""
    chain = []
    wd = float(train_opt.get(weight_decay_key) or 0)
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    chain.append(optax.scale_by_adam(
        b1=float(train_opt.get("beta1", 0.9)),
        b2=float(train_opt.get("beta2", 0.999)),
    ))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


class SimpleModel(BaseModel):
    """One-network pixel-criterion trainer with the reference model API."""

    def __init__(self, opt, mesh=None):
        super().__init__(opt)
        self.mesh = mesh or get_mesh()
        self.netG = self._build_network(opt)
        seed = 0
        if opt.get("train") and opt["train"].get("manual_seed") is not None:
            seed = int(opt["train"]["manual_seed"])
        g_params = self.netG.init(
            jax.random.PRNGKey(seed), *self._dummy_inputs(opt)
        )["params"]
        params = {"netG": g_params}

        if self.is_train:
            t = opt["train"]
            self.cri_pix = pixel_loss(t["pixel_criterion"])
            self.l_pix_w = float(t["pixel_weight"])
            self.tx = make_adam(t, self.schedule)
            opt_state = self.tx.init(params)
        else:
            self.tx = None
            opt_state = ()

        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params, opt_state=opt_state
        )
        self.load()
        self.state = self.state.replace(params=replicate(self.state.params, self.mesh))
        if self.is_train:
            self.state = self.state.replace(
                opt_state=replicate(self.state.opt_state, self.mesh))
            self._train_step = self._build_train_step()
        self._apply_jit = jax.jit(
            lambda params, *inputs: self.netG.apply({"params": params}, *inputs)
        )
        self.log_dict = {}

    # subclass hooks ----------------------------------------------------
    def _build_network(self, opt):
        from endosr.nn import networks

        return networks.define_G(opt)

    def _dummy_inputs(self, opt):
        ds = (opt.get("datasets") or {}).get("train") or {}
        lr = ds.get("LR_size") or 32
        return (jnp.zeros((1, lr, lr, opt["network_G"].get("in_nc", 3)),
                          jnp.float32),)

    def _net_inputs(self, batch):
        """Batch dict → tuple of network inputs."""
        return (batch["LQ"],)

    def _target(self, batch):
        return batch["GT"]

    # training ----------------------------------------------------------
    def _build_train_step(self):
        netG = self.netG

        def loss_fn(params, batch):
            out = netG.apply({"params": params["netG"]},
                             *self._net_inputs(batch))
            l_pix = self.l_pix_w * self.cri_pix(out, self._target(batch))
            return l_pix, {"l_pix": l_pix}

        def train_step(state: TrainState, batch):
            grads, logs = jax.grad(loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, opt_state), logs

        return jax.jit(train_step, donate_argnums=(0,))

    # reference API -----------------------------------------------------
    def feed_data(self, data):
        self.batch = {
            k: np.asarray(v, np.float32)
            for k, v in data.items()
            if isinstance(v, np.ndarray) or hasattr(v, "shape")
        }

    def optimize_parameters(self, step=None):
        batch = shard_batch(self.batch, self.mesh)
        self.state, logs = self._train_step(self.state, batch)
        self.log_dict = {k: float(v) for k, v in jax.device_get(logs).items()}

    def test(self):
        self.fake_SR = np.asarray(
            self._apply_jit(self.state.params["netG"],
                            *self._net_inputs(self.batch))
        )
        self.fake_H = self.fake_SR

    def get_current_visuals(self):
        out = {"SR": self.fake_SR[0], "Batch_SR": self.fake_SR}
        if "LQ" in self.batch:
            out["LQ"] = self.batch["LQ"][0]
        if "GT" in self.batch:
            out["GT"] = self.batch["GT"][0]
        return out

    def load(self):
        load_path_g = self.opt["path"].get("pretrain_model_G")
        if load_path_g:
            logger.info("Loading model for G [%s] ...", load_path_g)
            g = self.load_network(
                load_path_g, self.state.params["netG"],
                self.opt["path"].get("strict_load", True),
            )
            params = dict(self.state.params)
            params["netG"] = g
            self.state = self.state.replace(params=params)

    def save(self, iter_label):
        self.save_network(self.state.params["netG"], "G", iter_label)
