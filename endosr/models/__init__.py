"""Model registry — twin of ``codes/models/__init__.py:5-30``.

Maps the YAML ``model:`` string to a training-wrapper class.
"""

from __future__ import annotations

import logging

__all__ = ["create_model"]


def create_model(opt, **kwargs):
    model = opt["model"]
    if model == "sr":
        from endosr.models.sr_model import SRModel as M
    elif model == "srgan":
        from endosr.models.srgan_model import SRGANModel as M
    elif model == "sftgan":
        from endosr.models.sftgan_model import SFTGANACDModel as M
    elif model == "predictor":
        from endosr.models.p_model import PModel as M
    elif model == "corrector":
        from endosr.models.c_model import CModel as M
    elif model == "sftmd":
        from endosr.models.f_model import FModel as M
    elif model == "sftmd_depthCond":
        from endosr.models.f_depthcond import FModelDepthCond as M
    elif model == "sftmd_depth":
        from endosr.models.f_depth import FModelDepth as M
    elif model == "sftmd_depthSegNet":
        from endosr.models.f_depthseg import FModelDepthSeg as M
    else:
        raise NotImplementedError(f"Model [{model}] not recognized.")
    m = M(opt, **kwargs)
    logging.getLogger("base").info("Model [%s] is created.", m.__class__.__name__)
    return m
