"""SFTGAN_ACD_Model — SFT-GAN with auxiliary-classifier discriminator.

Twin of ``codes/models/SFTGAN_ACD_model.py``: generator SFT_Net conditioned
on an 8-channel segmentation map; D is ACD_VGG_BN_96 returning (gan, cls)
logits; losses = pixel + VGG feature + GAN + cross-entropy class (ignore
background index 0); SFT/Cond parameters get 5× LR and the non-SFT trunk is
frozen until step > 20000 (``:86-96, 151-153``). All of it is one jitted
SPMD step with host-side step gating.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.losses.basic import gan_loss, l1_loss, l2_loss
from endosr.models.base import BaseModel, TrainState
from endosr.models.lr_schedule import build_schedule
from endosr.nn.sft_arch import ACDVGGBN96, SFTNet
from endosr.parallel.mesh import get_mesh, replicate, shard_batch

logger = logging.getLogger("base")

__all__ = ["SFTGANACDModel"]


def _cross_entropy_ignore0(logits, labels):
    """CE with ignore_index=0 (background), mean over kept samples."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    keep = (labels != 0).astype(jnp.float32)
    return -jnp.sum(picked * keep) / jnp.maximum(jnp.sum(keep), 1.0)


class SFTGANACDModel(BaseModel):
    def __init__(self, opt, mesh=None):
        super().__init__(opt)
        self.mesh = mesh or get_mesh()
        self.netG = SFTNet()
        self.netD = ACDVGGBN96() if self.is_train else None

        ds = (opt.get("datasets") or {}).get("train") or {}
        lr_size = ds.get("LR_size") or 24
        scale = 4
        key = jax.random.PRNGKey(0)
        dummy_lq = jnp.zeros((1, lr_size, lr_size, 3), jnp.float32)
        dummy_seg = jnp.zeros((1, lr_size * scale, lr_size * scale, 8), jnp.float32)
        g_params = self.netG.init(key, dummy_lq, dummy_seg)["params"]
        params = {"netG": g_params}

        if self.is_train:
            t = opt["train"]
            hr = lr_size * scale
            # the reference trains D on 96×96 HR crops; the dense head's
            # input dim is inferred from the configured HR size, so ported
            # torch checkpoints require HR crops of 96
            d_vars = self.netD.init(key, jnp.zeros((1, hr, hr, 3), jnp.float32),
                                    train=True)
            params["netD"] = d_vars["params"]
            params["netD_stats"] = d_vars.get("batch_stats", {})

            self.l_pix_w = float(t.get("pixel_weight") or 0)
            self.cri_pix = ({"l1": l1_loss, "l2": l2_loss}[t["pixel_criterion"]]
                            if self.l_pix_w > 0 else None)
            self.l_fea_w = float(t.get("feature_weight") or 0)
            self.cri_fea = None
            if self.l_fea_w > 0:
                from endosr.losses.perceptual import PerceptualLoss

                self.cri_fea = PerceptualLoss(
                    criterion=t.get("feature_criterion", "l1"), weight=1.0,
                    vgg_weights_path=t.get("vgg_weights_path"))
            self.gan_type = t["gan_type"]
            self.l_gan_w = float(t["gan_weight"])
            self.D_update_ratio = int(t.get("D_update_ratio") or 1)
            self.D_init_iters = int(t.get("D_init_iters") or 0)

            def adam(lr_mult, beta1, sched):
                return optax.chain(
                    optax.scale_by_adam(b1=beta1, b2=0.999),
                    optax.scale_by_learning_rate(
                        lambda s: sched(s) * lr_mult),
                )

            sched_g = build_schedule(t)
            sched_d = build_schedule({**t, "lr_G": t.get("lr_D", t["lr_G"])})
            b1g = float(t.get("beta1_G", 0.9))
            b1d = float(t.get("beta1_D", 0.9))
            self.tx_sft = adam(5.0, b1g, sched_g)
            self.tx_other = adam(1.0, b1g, sched_g)
            self.tx_d = adam(1.0, b1d, sched_d)

            sft_mask = self._sft_mask(params["netG"])
            self._sft_param_mask = sft_mask
            opt_state = {
                "G_SFT": self.tx_sft.init(params["netG"]),
                "G_other": self.tx_other.init(params["netG"]),
                "D": self.tx_d.init(params["netD"]),
            }
        else:
            opt_state = ()

        self.state = TrainState(jnp.asarray(0, jnp.int32), params, opt_state)
        self.load()
        self.state = self.state.replace(params=replicate(self.state.params, self.mesh))
        if self.is_train:
            self.state = self.state.replace(
                opt_state=replicate(self.state.opt_state, self.mesh))
            self._steps = {}
        self._apply_jit = jax.jit(
            lambda p, lq, seg: self.netG.apply({"params": p}, lq, seg))
        self.log_dict = {}

    @staticmethod
    def _sft_mask(g_params):
        """True where the param belongs to an SFT/Cond module (name match,
        mirroring the reference's 'SFT' in k or 'Cond' in k split)."""

        def walk(tree, in_sft):
            if not isinstance(tree, dict):
                return in_sft
            return {k: walk(v, in_sft or ("sft" in k.lower() or "Cond" in k))
                    for k, v in tree.items()}

        return walk(g_params, False)

    def _build_train_step(self, update_g: bool, update_other: bool):
        netG, netD = self.netG, self.netD
        mask = self._sft_param_mask

        def d_apply(d_params, d_stats, x):
            (gan, cls), new_vars = netD.apply(
                {"params": d_params, "batch_stats": d_stats}, x, train=True,
                mutable=["batch_stats"])
            return gan, cls, new_vars["batch_stats"]

        def g_loss_fn(g_params, d_params, d_stats, batch):
            fake = netG.apply({"params": g_params}, batch["LR"], batch["seg"])
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
            gan_logit, cls_logit, _ = d_apply(d_params, d_stats, fake)
            l_g_gan = self.l_gan_w * gan_loss(self.gan_type, gan_logit, True)
            l_g_cls = self.l_gan_w * _cross_entropy_ignore0(
                cls_logit, batch["category"])
            total += l_g_gan + l_g_cls
            logs["l_g_gan"] = l_g_gan
            logs["l_g_cls"] = l_g_cls
            return total, (logs, fake)

        def d_loss_fn(d_params, d_stats, fake, batch):
            pred_real, cls_real, stats = d_apply(d_params, d_stats, batch["GT"])
            pred_fake, cls_fake, stats = d_apply(
                d_params, stats, jax.lax.stop_gradient(fake))
            l_d_real = gan_loss(self.gan_type, pred_real, True)
            l_d_fake = gan_loss(self.gan_type, pred_fake, False)
            l_d_cls_real = _cross_entropy_ignore0(cls_real, batch["category"])
            l_d_cls_fake = _cross_entropy_ignore0(cls_fake, batch["category"])
            total = l_d_real + l_d_fake + l_d_cls_real + l_d_cls_fake
            logs = {
                "l_d_real": l_d_real, "l_d_fake": l_d_fake,
                "l_d_cls_real": l_d_cls_real, "l_d_cls_fake": l_d_cls_fake,
                "D_real": jnp.mean(pred_real), "D_fake": jnp.mean(pred_fake),
            }
            return total, (logs, stats)

        def train_step(state: TrainState, batch):
            params = dict(state.params)
            opt_state = dict(state.opt_state)
            logs = {}
            if update_g:
                grads, (g_logs, fake) = jax.grad(g_loss_fn, has_aux=True)(
                    params["netG"], params["netD"], params["netD_stats"], batch)
                sft_updates, opt_state["G_SFT"] = self.tx_sft.update(
                    grads, opt_state["G_SFT"], params["netG"])
                other_updates, opt_state["G_other"] = self.tx_other.update(
                    grads, opt_state["G_other"], params["netG"])
                zeros = jax.tree_util.tree_map(jnp.zeros_like, sft_updates)
                updates = jax.tree_util.tree_map(
                    lambda m, s, o, z: s if m else (o if update_other else z),
                    mask, sft_updates, other_updates, zeros,
                )
                params["netG"] = optax.apply_updates(params["netG"], updates)
                logs.update(g_logs)
            else:
                fake = netG.apply({"params": params["netG"]},
                                  batch["LR"], batch["seg"])

            d_grads, (d_logs, new_stats) = jax.grad(d_loss_fn, has_aux=True)(
                params["netD"], params["netD_stats"], fake, batch)
            d_updates, opt_state["D"] = self.tx_d.update(
                d_grads, opt_state["D"], params["netD"])
            params["netD"] = optax.apply_updates(params["netD"], d_updates)
            params["netD_stats"] = new_stats
            logs.update(d_logs)
            return TrainState(state.step + 1, params, opt_state), logs

        return jax.jit(train_step, donate_argnums=(0,))

    def feed_data(self, data, need_GT: bool = True):
        self.batch = {
            "LR": np.asarray(data["LR"], np.float32),
            "seg": np.asarray(data["seg"], np.float32),
            "category": np.asarray(data["category"], np.int32),
        }
        if need_GT and "GT" in data:
            self.batch["GT"] = np.asarray(data["GT"], np.float32)

    def optimize_parameters(self, step):
        do_g = (step % self.D_update_ratio == 0) and (step > self.D_init_iters)
        do_other = step > 20000
        key = (do_g, do_other)
        if key not in self._steps:
            self._steps[key] = self._build_train_step(*key)
        batch = shard_batch(self.batch, self.mesh)
        self.state, logs = self._steps[key](self.state, batch)
        self.log_dict = {k: float(v) for k, v in jax.device_get(logs).items()}

    def test(self):
        self.fake_H = np.asarray(
            self._apply_jit(self.state.params["netG"], self.batch["LR"],
                            self.batch["seg"]))
        self.fake_SR = self.fake_H

    def get_current_visuals(self):
        out = {"SR": self.fake_H[0], "LR": self.batch["LR"][0]}
        if "GT" in self.batch:
            out["GT"] = self.batch["GT"][0]
        return out

    def load(self):
        for label, key in (("pretrain_model_G", "netG"),
                           ("pretrain_model_D", "netD")):
            path = self.opt["path"].get(label)
            if path and key in self.state.params:
                loaded = self.load_network(
                    path, self.state.params[key],
                    self.opt["path"].get("strict_load", True))
                params = dict(self.state.params)
                params[key] = loaded
                self.state = self.state.replace(params=params)

    def save(self, iter_label):
        self.save_network(self.state.params["netG"], "G", iter_label)
        if "netD" in self.state.params:
            self.save_network(self.state.params["netD"], "D", iter_label)
