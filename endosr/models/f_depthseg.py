"""F_Model_depthSeg — DepthNet + FCN8s segmentation co-training.

Twin of ``codes/models/F_model_depthSeg.py``: the SR losses of the flagship
wrapper plus a BCE-with-logits segmentation loss on ``segNet(fake_H)``
against one-hot labels; a single joint backward feeds two optimizers —
Adam for G, RMSprop + StepLR for the seg net (``:133-141, 213-225``).
Here both updates come out of one jitted step: grads of the whole loss are
taken w.r.t. the combined pytree and routed to the two optax chains.

Includes the Jaccard/IoU helper (``:357-391``) as a pure function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.losses.mask import dynamic_weight_mask_loss, mask_loss
from endosr.losses.ssim import ssim_value
from endosr.models.f_depthcond import FModelDepthCond
from endosr.models.base import TrainState
from endosr.models.lr_schedule import step_lr
from endosr.nn import networks
from endosr.parallel.mesh import replicate

__all__ = ["FModelDepthSeg", "jaccard_loss"]


def jaccard_loss(true_onehot, logits, eps: float = 1e-7):
    """Soft IoU loss over softmax predictions (``F_model_depthSeg.py:357-391``)."""
    probs = jax.nn.softmax(logits, axis=-1)
    intersection = jnp.sum(probs * true_onehot, axis=(1, 2))
    cardinality = jnp.sum(probs + true_onehot, axis=(1, 2))
    union = cardinality - intersection
    jacc = (intersection / (union + eps)).mean()
    return 1.0 - jacc


def _bce_with_logits(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class FModelDepthSeg(FModelDepthCond):
    def __init__(self, opt, mesh=None):
        super().__init__(opt, mesh=mesh)
        if not self.is_train:
            return
        t = opt["train"]
        seg_opt = t.get("segNet") or {}
        self.segNet = networks.define_SegNet(opt)

        ds = (opt.get("datasets") or {}).get("train") or {}
        lr_size = ds.get("LR_size") or 32
        scale = int(opt.get("scale") or 4)
        hr = lr_size * scale
        seg_vars = self.segNet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, hr, hr, 3), jnp.float32),
            train=True,
        )

        params = dict(jax.device_get(self.state.params))
        params["segNet"] = seg_vars["params"]
        params["segNet_stats"] = seg_vars.get("batch_stats", {})

        seg_sched = step_lr(
            float(seg_opt.get("lr") or 1e-4),
            int(seg_opt.get("setp_size") or seg_opt.get("step_size") or 10000),
            float(seg_opt.get("gamma") or 0.1),
        )
        chain = []
        wd = float(seg_opt.get("weight_decay") or 0)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_rms(decay=0.99, eps=1e-8))
        mom = float(seg_opt.get("momentum") or 0)
        if mom:
            chain.append(optax.trace(decay=mom))
        chain.append(optax.scale_by_learning_rate(seg_sched))
        self.tx_seg = optax.chain(*chain)

        opt_state = {
            "G": self.tx.init({k: v for k, v in params.items()
                               if k in ("netG", "dyn")}),
            "seg": self.tx_seg.init(params["segNet"]),
        }
        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=replicate(params, self.mesh),
            opt_state=replicate(opt_state, self.mesh),
        )
        self._train_step = self._build_joint_step()

    def _build_joint_step(self):
        netG, segNet = self.netG, self.segNet

        def loss_fn(trainable, seg_stats, batch):
            fake_h = netG.apply(
                {"params": trainable["netG"]},
                batch["LQ"], batch["Depth"], batch["DepthMaskList"],
            )
            gt = batch["GT"]
            logs = {}
            l_pix = self.l_pix_w * self.cri_pix(fake_h, gt)
            total = l_pix
            logs["l_pix"] = l_pix
            if self.use_ssim_loss:
                l_ssim = self.l_ssim_w * ssim_value(fake_h, gt)
                total = total + l_ssim
                logs["l_ssim"] = l_ssim
            if self.use_mask_loss:
                l_mask = mask_loss(fake_h, gt, batch["DepthMaskList"],
                                   batch["mask_bin"], self.mask_criterion,
                                   self.l_mask_w)
                total = total + l_mask
                logs["l_mask"] = l_mask
            if self.use_dynamic_loss:
                raw, _, l_dyn, w = dynamic_weight_mask_loss(
                    fake_h, gt, batch["DepthMaskList"],
                    trainable["dyn"]["trainable_weight"],
                    self.dyn_criterion, self.l_dyn_w,
                )
                total = total + l_dyn
                logs["l_dynamic"] = l_dyn
                logs["dyn_w"] = w
                logs["dyn_l"] = raw
            logs["l_all"] = total

            pred_mask, new_vars = segNet.apply(
                {"params": trainable["segNet"], "batch_stats": seg_stats},
                fake_h, train=True, mutable=["batch_stats"],
            )
            seg_loss = _bce_with_logits(pred_mask, batch["SegLabel"])
            logs["l_segBCE"] = seg_loss
            whole = total + seg_loss
            return whole, (logs, new_vars["batch_stats"], pred_mask)

        def train_step(state: TrainState, batch):
            params = dict(state.params)
            trainable = {k: params[k] for k in ("netG", "segNet")
                         if k in params}
            if "dyn" in params:
                trainable["dyn"] = params["dyn"]
            grads, (logs, new_stats, pred_mask) = jax.grad(
                loss_fn, has_aux=True
            )(trainable, params["segNet_stats"], batch)

            g_tree = {k: v for k, v in trainable.items() if k != "segNet"}
            g_grads = {k: v for k, v in grads.items() if k != "segNet"}
            g_updates, g_opt = self.tx.update(
                g_grads, state.opt_state["G"], g_tree)
            g_new = optax.apply_updates(g_tree, g_updates)

            s_updates, s_opt = self.tx_seg.update(
                grads["segNet"], state.opt_state["seg"], trainable["segNet"])
            params["segNet"] = optax.apply_updates(trainable["segNet"], s_updates)
            params["segNet_stats"] = new_stats
            params.update(g_new)
            return (
                TrainState(state.step + 1, params,
                           {"G": g_opt, "seg": s_opt}),
                logs,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    def feed_data(self, data):
        super().feed_data(data)
        seg = data.get("SegLabel", data.get("Seg_onehot"))
        if seg is not None:
            self.batch["SegLabel"] = np.asarray(seg, np.float32)

    def save(self, iter_label):
        super().save(iter_label)
        if "segNet" in self.state.params:
            self.save_network(self.state.params["segNet"], "segNet", iter_label)
