"""SRModel — generic PSNR-oriented SR trainer (``codes/models/SR_model.py``)."""

from __future__ import annotations

import numpy as np

from endosr.models.common import SimpleModel

__all__ = ["SRModel"]


class SRModel(SimpleModel):
    def test_x8(self):
        """8-way flip/transpose self-ensemble (``SR_model.py`` / EDSR)."""

        def tf(x, op):
            if op == "v":
                return x[:, :, ::-1, :]
            if op == "h":
                return x[:, ::-1, :, :]
            return x.transpose(0, 2, 1, 3)

        lr_list = [self.batch["LQ"]]
        for op in ("v", "h", "t"):
            lr_list.extend([tf(t, op) for t in lr_list])
        outs = []
        for i, lq in enumerate(lr_list):
            sr = np.asarray(
                self._apply_jit(self.state.params["netG"], np.ascontiguousarray(lq))
            )
            if i > 3:
                sr = tf(sr, "t")
            if i % 4 > 1:
                sr = tf(sr, "h")
            if (i % 4) % 2 == 1:
                sr = tf(sr, "v")
            outs.append(sr)
        self.fake_H = np.mean(np.stack(outs), axis=0)
        self.fake_SR = self.fake_H
