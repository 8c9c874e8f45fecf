"""F_Model_depth — depth-as-input trainer (``codes/models/F_model_depth.py``).

Feeds the LR image plus a depth pyramid (Depth_x8/x4/x2); when the network
predicts upsampled depth maps (``pred_depth``), adds multi-scale depth
prediction losses: L1 (weight ``depth_l1_weight``) + monodepth-SSIM
(weight ``depth_ssim_weight``) on the ×4/×2 predictions (``:132-165``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.depth.layers import ssim_monodepth
from endosr.losses.basic import l1_loss
from endosr.models.base import TrainState
from endosr.models.common import SimpleModel

__all__ = ["FModelDepth"]


class FModelDepth(SimpleModel):
    def __init__(self, opt, mesh=None):
        net_opt = opt["network_G"]
        self.pred_depth = bool(net_opt.get("predict_depth_map", False))
        self.n_depth_resblk = int(net_opt.get("n_depthResBlk") or 0)
        t = opt.get("train") or {}
        self.l_depth_l1_w = float(t.get("depth_l1_weight") or 1.0)
        self.l_depth_ssim_w = float(t.get("depth_ssim_weight") or 1.0)
        super().__init__(opt, mesh=mesh)

    def _dummy_inputs(self, opt):
        ds = (opt.get("datasets") or {}).get("train") or {}
        lr = ds.get("LR_size") or 32
        return (
            jnp.zeros((1, lr, lr, 3), jnp.float32),
            jnp.zeros((1, lr, lr, 1), jnp.float32),
        )

    def _net_inputs(self, batch):
        return (batch["LQ"], batch["Depth_x8"])

    def _build_train_step(self):
        netG = self.netG

        def loss_fn(params, batch):
            logs = {}
            total = 0.0
            out = netG.apply({"params": params["netG"]},
                             *self._net_inputs(batch))
            if self.pred_depth:
                fake_h, depth_x4, depth_x2 = out
                l_depth_l1 = 0.0
                l_depth_ssim = 0.0
                if self.n_depth_resblk >= 2:
                    l_depth_l1 += l1_loss(depth_x4, batch["Depth_x4"]) * self.l_depth_l1_w
                    l_depth_ssim += jnp.mean(
                        ssim_monodepth(depth_x4, batch["Depth_x4"])
                    ) * self.l_depth_ssim_w
                if self.n_depth_resblk == 3:
                    l_depth_l1 += l1_loss(depth_x2, batch["Depth_x2"]) * self.l_depth_l1_w
                    l_depth_ssim += jnp.mean(
                        ssim_monodepth(depth_x2, batch["Depth_x2"])
                    ) * self.l_depth_ssim_w
                l_depth = l_depth_l1 + l_depth_ssim
                total = total + l_depth
                logs["l_depth_l1"] = l_depth_l1
                logs["l_depth_ssim"] = l_depth_ssim
                logs["l_depth"] = l_depth
            else:
                fake_h = out
            l_pix = self.l_pix_w * self.cri_pix(fake_h, batch["GT"])
            total = total + l_pix
            logs["l_pix"] = l_pix
            logs["l_total"] = total
            return total, logs

        def train_step(state: TrainState, batch):
            grads, logs = jax.grad(loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, opt_state), logs

        return jax.jit(train_step, donate_argnums=(0,))

    def feed_data(self, data):
        self.batch = {"LQ": np.asarray(data["LQ"], np.float32),
                      "Depth_x8": np.asarray(
                          data.get("Depth_x8", data.get("Depth")), np.float32)}
        for k in ("GT", "Depth_x4", "Depth_x2"):
            if k in data:
                self.batch[k] = np.asarray(data[k], np.float32)

    def test(self):
        out = self._apply_jit(self.state.params["netG"],
                              *self._net_inputs(self.batch))
        if self.pred_depth:
            sr, d4, d2 = out
            self.fake_SR = np.asarray(sr)
            self.depth_x4 = np.asarray(d4)
            self.depth_x2 = np.asarray(d2)
        else:
            self.fake_SR = np.asarray(out)
        self.fake_H = self.fake_SR
