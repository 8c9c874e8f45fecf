"""F_Model — plain SFTMD-stage SR trainer (``codes/models/F_model.py``).

Single-input generator, pixel loss only; same contract as SRModel with the
``fake_SR`` naming and the x8 self-ensemble.
"""

from __future__ import annotations

from endosr.models.sr_model import SRModel

__all__ = ["FModel"]


class FModel(SRModel):
    pass
