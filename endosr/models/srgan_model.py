"""SRGANModel — adversarial SR trainer (``codes/models/SRGAN_model.py``).

G loss = pixel + VGG-feature + GAN (gan/ragan/lsgan/wgan-gp); D trains every
step on real/fake with the same criterion; G updates are gated by
``D_update_ratio`` / ``D_init_iters`` (``SRGAN_model.py:81-82,135-198``).
Generator and discriminator each get their own Adam + schedule; both updates
run in one jitted SPMD step (the G update is compiled in/out per the static
gate, decided host-side from the step counter).

The discriminator's BatchNorm runs on batch statistics with running averages
carried in the state (the DDP-free analog of torch's running buffers).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.losses.basic import gan_loss, pixel_loss
from endosr.models.base import BaseModel, TrainState
from endosr.models.common import make_adam
from endosr.models.lr_schedule import build_schedule
from endosr.nn import networks
from endosr.parallel.mesh import get_mesh, replicate, shard_batch

logger = logging.getLogger("base")

__all__ = ["SRGANModel"]


class SRGANModel(BaseModel):
    def __init__(self, opt, mesh=None):
        super().__init__(opt)
        self.mesh = mesh or get_mesh()
        self.netG = networks.define_G(opt)
        self.netD = networks.define_D(opt) if self.is_train else None

        ds = (opt.get("datasets") or {}).get("train") or {}
        lr_size = ds.get("LR_size") or 32
        scale = int(opt.get("scale") or 4)
        key = jax.random.PRNGKey(0)
        dummy_lq = jnp.zeros((1, lr_size, lr_size, 3), jnp.float32)
        g_params = self.netG.init(key, dummy_lq)["params"]
        params = {"netG": g_params}

        if self.is_train:
            t = opt["train"]
            dummy_hr = jnp.zeros((1, lr_size * scale, lr_size * scale, 3), jnp.float32)
            d_vars = self.netD.init(key, dummy_hr, train=True)
            params["netD"] = d_vars["params"]
            params["netD_stats"] = d_vars.get("batch_stats", {})

            # G losses
            self.l_pix_w = float(t.get("pixel_weight") or 0)
            self.cri_pix = pixel_loss(t["pixel_criterion"]) if self.l_pix_w > 0 else None
            self.l_fea_w = float(t.get("feature_weight") or 0)
            self.cri_fea = None
            if self.l_fea_w > 0:
                from endosr.losses.perceptual import PerceptualLoss

                self.cri_fea = PerceptualLoss(
                    criterion=t.get("feature_criterion", "l1"),
                    weight=1.0,
                    vgg_weights_path=t.get("vgg_weights_path"),
                )
            self.gan_type = t["gan_type"]
            self.l_gan_w = float(t["gan_weight"])
            self.D_update_ratio = int(t.get("D_update_ratio") or 1)
            self.D_init_iters = int(t.get("D_init_iters") or 0)

            self.schedule_D = build_schedule(
                {**t, "lr_G": t.get("lr_D", t["lr_G"])}
            )
            self.txG = make_adam(t, self.schedule)
            self.txD = make_adam(
                {**t, "beta1": t.get("beta1_D", t.get("beta1", 0.9)),
                 "beta2": t.get("beta2_D", t.get("beta2", 0.999))},
                self.schedule_D, weight_decay_key="weight_decay_D",
            )
            opt_state = {
                "G": self.txG.init({"netG": params["netG"]}),
                "D": self.txD.init(params["netD"]),
            }
        else:
            opt_state = ()

        self.state = TrainState(jnp.asarray(0, jnp.int32), params, opt_state)
        self.load()
        self.state = self.state.replace(params=replicate(self.state.params, self.mesh))
        if self.is_train:
            self.state = self.state.replace(
                opt_state=replicate(self.state.opt_state, self.mesh))
            self._step_with_g = self._build_train_step(True)
            self._step_d_only = self._build_train_step(False)
        self._apply_jit = jax.jit(
            lambda p, lq: self.netG.apply({"params": p}, lq)
        )
        self.log_dict = {}

    # ------------------------------------------------------------------
    def _d_apply(self, d_params, d_stats, x, train=True):
        out, new_vars = self.netD.apply(
            {"params": d_params, "batch_stats": d_stats}, x, train=train,
            mutable=["batch_stats"],
        )
        return out, new_vars["batch_stats"]

    def _build_train_step(self, update_g: bool):
        netG = self.netG

        def g_loss_fn(g_tree, d_params, d_stats, batch):
            fake = netG.apply({"params": g_tree["netG"]}, batch["LQ"])
            logs = {}
            total = 0.0
            if self.cri_pix is not None:
                l_g_pix = self.l_pix_w * self.cri_pix(fake, batch["GT"])
                total += l_g_pix
                logs["l_g_pix"] = l_g_pix
            if self.cri_fea is not None:
                l_g_fea = self.l_fea_w * self.cri_fea(fake, batch["GT"])
                total += l_g_fea
                logs["l_g_fea"] = l_g_fea
            pred_g_fake, _ = self._d_apply(d_params, d_stats, fake)
            if self.gan_type == "ragan":
                pred_d_real, _ = self._d_apply(d_params, d_stats, batch["GT"])
                pred_d_real = jax.lax.stop_gradient(pred_d_real)
                l_g_gan = self.l_gan_w * (
                    gan_loss("gan", pred_d_real - jnp.mean(pred_g_fake), False)
                    + gan_loss("gan", pred_g_fake - jnp.mean(pred_d_real), True)
                ) / 2
            else:
                l_g_gan = self.l_gan_w * gan_loss(self.gan_type, pred_g_fake, True)
            total += l_g_gan
            logs["l_g_gan"] = l_g_gan
            return total, (logs, fake)

        def d_loss_fn(d_params, d_stats, fake, batch):
            pred_d_real, new_stats = self._d_apply(d_params, d_stats, batch["GT"])
            pred_d_fake, new_stats = self._d_apply(
                d_params, new_stats, jax.lax.stop_gradient(fake)
            )
            if self.gan_type == "ragan":
                l_d_real = gan_loss(
                    "gan", pred_d_real - jnp.mean(pred_d_fake), True) * 0.5
                l_d_fake = gan_loss(
                    "gan", pred_d_fake - jnp.mean(pred_d_real), False) * 0.5
            else:
                l_d_real = gan_loss(self.gan_type, pred_d_real, True)
                l_d_fake = gan_loss(self.gan_type, pred_d_fake, False)
            total = l_d_real + l_d_fake
            logs = {
                "l_d_real": l_d_real, "l_d_fake": l_d_fake,
                "D_real": jnp.mean(pred_d_real), "D_fake": jnp.mean(pred_d_fake),
            }
            return total, (logs, new_stats)

        def train_step(state: TrainState, batch):
            params = dict(state.params)
            opt_state = dict(state.opt_state)
            logs = {}

            if update_g:
                (grads, (g_logs, fake)) = jax.grad(
                    g_loss_fn, has_aux=True
                )({"netG": params["netG"]}, params["netD"],
                  params["netD_stats"], batch)
                updates, opt_state["G"] = self.txG.update(
                    grads, opt_state["G"], {"netG": params["netG"]}
                )
                params["netG"] = optax.apply_updates(
                    {"netG": params["netG"]}, updates
                )["netG"]
                logs.update(g_logs)
            else:
                fake = netG.apply({"params": params["netG"]}, batch["LQ"])

            d_grads, (d_logs, new_stats) = jax.grad(
                d_loss_fn, has_aux=True
            )(params["netD"], params["netD_stats"], fake, batch)
            d_updates, opt_state["D"] = self.txD.update(
                d_grads, opt_state["D"], params["netD"]
            )
            params["netD"] = optax.apply_updates(params["netD"], d_updates)
            params["netD_stats"] = new_stats
            logs.update(d_logs)
            return TrainState(state.step + 1, params, opt_state), logs

        return jax.jit(train_step, donate_argnums=(0,))

    # reference API -----------------------------------------------------
    def feed_data(self, data, need_GT: bool = True):
        self.batch = {"LQ": np.asarray(data["LQ"], np.float32)}
        if need_GT and "GT" in data:
            self.batch["GT"] = np.asarray(data["GT"], np.float32)

    def optimize_parameters(self, step):
        do_g = (step % self.D_update_ratio == 0) and (step > self.D_init_iters)
        fn = self._step_with_g if do_g else self._step_d_only
        batch = shard_batch(self.batch, self.mesh)
        self.state, logs = fn(self.state, batch)
        self.log_dict = {k: float(v) for k, v in jax.device_get(logs).items()}

    def test(self):
        self.fake_H = np.asarray(
            self._apply_jit(self.state.params["netG"], self.batch["LQ"])
        )
        self.fake_SR = self.fake_H

    def get_current_visuals(self):
        out = {"SR": self.fake_H[0], "LQ": self.batch["LQ"][0]}
        if "GT" in self.batch:
            out["GT"] = self.batch["GT"][0]
        return out

    def load(self):
        for label, key in (("pretrain_model_G", "netG"), ("pretrain_model_D", "netD")):
            path = self.opt["path"].get(label)
            if path and key in self.state.params:
                logger.info("Loading model [%s] from %s ...", key, path)
                loaded = self.load_network(
                    path, self.state.params[key],
                    self.opt["path"].get("strict_load", True),
                )
                params = dict(self.state.params)
                params[key] = loaded
                self.state = self.state.replace(params=params)

    def save(self, iter_label):
        self.save_network(self.state.params["netG"], "G", iter_label)
        if "netD" in self.state.params:
            self.save_network(self.state.params["netD"], "D", iter_label)
