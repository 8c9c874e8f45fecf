"""C_Model — IKC kernel-code Corrector trainer (``codes/models/C_model.py``).

``feed_data(SR_img, est_ker_map, ker_map)`` (``C_model.py:104-113``); the
Corrector refines the estimated code from the SR image.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from endosr.models.common import SimpleModel

__all__ = ["CModel"]


class CModel(SimpleModel):
    def _dummy_inputs(self, opt):
        ds = (opt.get("datasets") or {}).get("train") or {}
        lr = ds.get("LR_size") or 32
        code_len = opt["network_G"].get("code_length", 10)
        return (
            jnp.zeros((1, lr, lr, 3), jnp.float32),
            jnp.zeros((1, code_len), jnp.float32),
        )

    def _net_inputs(self, batch):
        return (batch["SR"], batch["est_ker_map"])

    def _target(self, batch):
        return batch["real_ker"]

    def feed_data(self, data, est_ker_map=None, ker_map=None):
        if isinstance(data, dict):
            super().feed_data(data)
        else:
            self.batch = {"SR": np.asarray(data, np.float32),
                          "est_ker_map": np.asarray(est_ker_map, np.float32)}
            if ker_map is not None:
                self.batch["real_ker"] = np.asarray(ker_map, np.float32)

    def test(self):
        self.fake_ker = np.asarray(
            self._apply_jit(self.state.params["netG"], self.batch["SR"],
                            self.batch["est_ker_map"])
        )
        self.fake_SR = self.fake_ker

    def get_current_visuals(self):
        out = {"est_ker_map": self.fake_ker}
        if "real_ker" in self.batch:
            out["Batch_ker"] = self.batch["real_ker"]
        return out
