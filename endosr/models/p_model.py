"""P_Model — IKC kernel-code Predictor trainer (``codes/models/P_model.py``).

``feed_data(lr_img, ker_map)`` (positional, matching the reference's
non-dict signature at ``P_model.py:105-110``) or a dict with 'LQ' and
'real_ker'. Loss: pixel criterion between predicted and real kernel code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from endosr.models.common import SimpleModel

__all__ = ["PModel"]


class PModel(SimpleModel):
    def _dummy_inputs(self, opt):
        ds = (opt.get("datasets") or {}).get("train") or {}
        lr = ds.get("LR_size") or 32
        return (jnp.zeros((1, lr, lr, 3), jnp.float32),)

    def _net_inputs(self, batch):
        return (batch["LQ"],)

    def _target(self, batch):
        return batch["real_ker"]

    def feed_data(self, data, ker_map=None):
        if isinstance(data, dict):
            super().feed_data(data)
        else:
            self.batch = {"LQ": np.asarray(data, np.float32)}
            if ker_map is not None:
                self.batch["real_ker"] = np.asarray(ker_map, np.float32)

    def test(self):
        self.fake_ker = np.asarray(
            self._apply_jit(self.state.params["netG"], self.batch["LQ"])
        )
        self.fake_SR = self.fake_ker

    def get_current_visuals(self):
        out = {"est_ker_map": self.fake_ker, "LQ": self.batch["LQ"][0]}
        if "real_ker" in self.batch:
            out["Batch_ker"] = self.batch["real_ker"]
        return out
